"""In-kernel MXU shape-efficiency probe (VERDICT r2 #2 closure).

Measures compute-bound dot rates with VMEM-resident tiles: the PV family
(M = head_dim, N = q-block) and the QK family (contraction = head_dim),
at 64 vs 128, int8 and bf16. Distinct operand slices per dot so nothing
CSEs; no i8 elementwise ops (Mosaic only legalizes i16/i32 vectors).

Measured v5e (fresh process, r1/r2/samples 30/90/6):
  bf16 PV [64,512]x[512,2048]  192.7 TOPS | [128,...] 192.7 | [256,...] 194.8
  int8 PV [64,512]x[512,2048]  392.0 TOPS | [128,...] 377.6
  int8 QK [512,64]x[64,2048]   195.6 TOPS | [512,128]x[128,2048] 377.1

Conclusion: PV at M=64 runs at FULL MXU rate (time is exactly linear in
M; int8 M=64 hits 392 of the 394 TOPS machine peak) — the r2 hypothesis
of an hd64 PV half-lane ceiling is FALSE, and head-packed N=128 PV has
nothing to win. The only half-rate shape at hd64 is the QK dot's
CONTRACTION=64 (196 vs 377 TOPS) — per-head by definition (packing two
heads' features makes a block-diagonal operand: 2x MACs at 2x rate, a
wash) — and QK is ~0.5-0.65 us of a ~6 us block on the VPU-bound
schedule, bounding any fix to <=5%. CLOSED.
"""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from lowbit_quant_fa2_paddle_tpu.utils.benchmark import measure_op_time

R = 16

def probe(m, kdim, n, dtype, steps=64):
    pref = jnp.int32 if dtype == jnp.int8 else jnp.float32
    def kernel(a_ref, b_ref, o_ref):
        acc = jnp.zeros((m, n), jnp.float32)
        b = b_ref[...]
        for i in range(R):
            a = a_ref[i * m:(i + 1) * m, :]
            acc += jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=pref).astype(jnp.float32)
        o_ref[...] = acc
    a = jnp.ones((R * m, kdim), dtype)
    b = jnp.ones((kdim, n), dtype)
    fn = jax.jit(lambda a, b: pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[pl.BlockSpec((R * m, kdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((kdim, n), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((m, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
    )(a, b))
    jax.block_until_ready(fn(a, b))
    t = measure_op_time(fn, (a, b), r1=30, r2=90, samples=6)
    macs = steps * R * m * kdim * n
    print(f"[{m:4d},{kdim:4d}]x[{kdim:4d},{n:4d}] {dtype.__name__:8s}: "
          f"{t*1e3:7.3f} ms  {2*macs/t/1e12:7.1f} TOPS", flush=True)
    return t

c64  = probe(512, 64, 2048, jnp.int8)
c128 = probe(512, 128, 2048, jnp.int8)
m64  = probe(64, 512, 2048, jnp.int8)
m128 = probe(128, 512, 2048, jnp.int8)
print(f"int8 QK K=128/K=64 time ratio: {c128/c64:.2f} (2.0 => K=64 full-rate)")
print(f"int8 PV M=128/M=64 time ratio: {m128/m64:.2f}")
