"""Plot sweep results — the reference's example/draw/* scripts (TFLOP/s
curves per bits/seq, speedup bars). Instead of hard-coded measured numbers
(reference draw_single.py:16-22), this reads the JSON emitted by
bench/sweep.py.

  python bench/sweep.py --output sweep.json && \
  python example/draw/plot_results.py sweep.json --out plots/
"""

from __future__ import annotations

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("results", help="JSON from bench/sweep.py")
    p.add_argument("--out", default="plots")
    p.add_argument("--prefix", default="", help="filename prefix (e.g. hd128_causal_)")
    args = p.parse_args()

    with open(args.results) as f:
        rows = json.load(f)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; printing table instead")
        for r in rows:
            print(r)
        return

    os.makedirs(args.out, exist_ok=True)
    by_bits = {}
    for r in rows:
        by_bits.setdefault(r["bits"], []).append(r)

    fig, ax = plt.subplots(figsize=(7, 4.5))
    for bits, rs in by_bits.items():
        rs = sorted(rs, key=lambda r: r["seq"])
        ax.plot([r["seq"] for r in rs], [r["tflops"] for r in rs], marker="o", label=bits)
    ax.set_xscale("log", base=2)
    ax.set_xlabel("sequence length")
    ax.set_ylabel("TFLOP/s")
    causal = rows[0].get("causal", False) if rows else False
    ax.set_title(f"low-bit attention throughput ({'causal' if causal else 'non-causal'})")
    ax.legend()
    ax.grid(alpha=0.3)
    path = os.path.join(args.out, args.prefix + "tflops_vs_seq.png")
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    print(f"-> {path}")

    # speedup vs fp
    fp = {r["seq"]: r["tflops"] for r in by_bits.get("fp", [])}
    if fp:
        fig, ax = plt.subplots(figsize=(7, 4.5))
        for bits, rs in by_bits.items():
            if bits == "fp":
                continue
            rs = sorted(rs, key=lambda r: r["seq"])
            ax.plot([r["seq"] for r in rs],
                    [r["tflops"] / fp[r["seq"]] for r in rs if r["seq"] in fp],
                    marker="s", label=f"{bits} / fp")
        ax.axhline(1.0, color="gray", lw=0.8)
        ax.set_xscale("log", base=2)
        ax.set_xlabel("sequence length")
        ax.set_ylabel("speedup over fp16 FA2")
        ax.legend()
        ax.grid(alpha=0.3)
        path = os.path.join(args.out, args.prefix + "speedup_vs_seq.png")
        fig.tight_layout()
        fig.savefig(path, dpi=150)
        print(f"-> {path}")


if __name__ == "__main__":
    main()
