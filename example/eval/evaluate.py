"""Generation-quality evaluation — the reference's example/eval/evaluate.py
(VQAScore / CLIPScore / ITMScore over extracted frames -> result.json).

This environment has no model downloads (zero egress), so the perceptual
slot the reference fills with downloaded models is filled by the local
scorers in evalkit/perceptual.py: SSIM, frequency-band MSE, and a
fixed-weight random-conv feature cosine, all computed over the frame
projection of each impl's generation (latent tokens -> spatial grid).
Tensor-level PSNR/cosine remain as the raw-accuracy scorers; CLIP-like
scorers can be registered when weights are available locally.

  python example/eval/evaluate.py --impl int8 int4 --steps 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Callable, Dict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from lowbit_quant_fa2_paddle_tpu.evalkit import perceptual
from lowbit_quant_fa2_paddle_tpu.models import dit
from lowbit_quant_fa2_paddle_tpu.ops.metrics import cosine_similarity

SCORERS: Dict[str, Callable] = {}


def register_scorer(name):
    def deco(fn):
        SCORERS[name] = fn
        return fn
    return deco


@register_scorer("psnr")
def psnr(frames, baseline):
    m = float(np.mean((frames - baseline) ** 2))
    if m == 0:
        return float("inf")
    peak = float(np.max(np.abs(baseline))) or 1.0
    return 10.0 * np.log10(peak**2 / m)


@register_scorer("cosine")
def cosine(frames, baseline):
    return float(cosine_similarity(jnp.asarray(frames), jnp.asarray(baseline)))


@register_scorer("perceptual")
def perceptual_scores(latents, baseline):
    """SSIM + random-feature cosine + frequency-band MSE over the latents'
    frame projection (the VQA/CLIP/ITM perceptual slot, locally)."""
    return perceptual.perceptual_report(
        perceptual.latent_to_frames(latents), perceptual.latent_to_frames(baseline)
    )


def generate(params, cfg, impl, steps, seq, key):
    x = jax.random.normal(key, (1, seq, cfg.dim), cfg.dtype)
    step = jax.jit(lambda params, x, t: x - 0.1 * dit.dit_forward(params, x, t, cfg, attn_impl=impl))
    for i in range(steps):
        x = step(params, x, jnp.array([1000.0 * (1.0 - i / steps)]))
    return np.asarray(x, np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--impl", nargs="+", default=["int8", "int4"])
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--scorers", nargs="+",
                   default=["psnr", "cosine", "perceptual"])
    p.add_argument("--output", default="eval_out/result.json")
    args = p.parse_args()

    cfg = dit.tiny_config(num_heads=8, dim=512, depth=2)
    params = dit.init_dit_params(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    baseline = generate(params, cfg, "exact", args.steps, args.seq, key)

    results = {}
    for impl in args.impl:
        frames = generate(params, cfg, impl, args.steps, args.seq, key)
        results[impl] = {s: SCORERS[s](frames, baseline) for s in args.scorers}
        print(json.dumps({impl: results[impl]}), flush=True)

    os.makedirs(os.path.dirname(args.output), exist_ok=True)
    with open(args.output, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
