"""Smudging-frontier sweep + plot: max tolerable bound vs party count.

The reference pairs src/NN.cpp:117-127 (sweep parties 2..20 x bounds, find
the largest smudging bound that still decrypts) with src/tlwennplot.py
(pandas/matplotlib plot of `test/tlwenn/*.csv`). This is both halves in one:
run the n-of-n additive-split RLWE frontier sweep at the libthfhe ring size,
write the CSV, and render the plot.

    python benchmarks/frontier_plot.py [--parties 2 4 8 12 16 20]
        [--sparse 64] [--out measurements/frontier]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parties", type=int, nargs="+",
                    default=[2, 4, 8, 12, 16, 20])
    ap.add_argument("--N", type=int, default=1024)
    ap.add_argument("--sparse", type=int, default=None,
                    help="r of NN.cpp's sparse RandomSmudge (default dense)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from torus_fhe_tpu.core.params import RLweParams
    from torus_fhe_tpu.rlwe import rlwe_encrypt, rlwe_keygen, RLweSample
    from torus_fhe_tpu.threshold import additive as add
    from torus_fhe_tpu.threshold import decrypt as tdec

    params = RLweParams(polynomial_degree=args.N, mask_size=1, bits=32)
    rk = rlwe_keygen(jax.random.PRNGKey(0), params)
    msg = 0xBEEF
    mu = tdec.encode_bits(msg, args.N, n_bits=16)
    ct = rlwe_encrypt(jax.random.PRNGKey(1), mu, 1e-3, rk, params)

    bounds = [0.25 / (2 ** i) for i in range(12)]
    rows = []
    for p in args.parties:
        shares = add.split_rlwe_key(jax.random.PRNGKey(10 + p), rk, p)

        def ok(bound: float) -> bool:
            partials = add.rlwe_partial_decrypt(
                ct, shares, bound, jax.random.PRNGKey(77),
                sparse_coords=args.sparse)
            plain = add.combine(ct, partials)
            return tdec.decode_bits(plain, n_bits=16) == msg

        best = add.max_tolerable_bound(ok, bounds)
        rows.append((p, best))
        print(f"parties={p:3d} max_bound={best:.6g}", flush=True)

    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "measurements", "frontier")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out + ".csv", "w") as f:
        f.write("parties,max_bound\n")
        for p, b in rows:
            f.write(f"{p},{b}\n")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        ps, bs = zip(*rows)
        fig, ax = plt.subplots(figsize=(5, 3.2))
        ax.semilogy(ps, bs, marker="o")
        ax.set_xlabel("parties (n-of-n additive split)")
        ax.set_ylabel("max tolerable smudging bound")
        ax.set_title(f"Smudging frontier, N={args.N}"
                     + (f", sparse r={args.sparse}" if args.sparse else ""))
        ax.grid(True, which="both", alpha=0.3)
        fig.tight_layout()
        fig.savefig(out + ".png", dpi=120)
        print(f"wrote {out}.csv + {out}.png")
    except Exception as e:  # plotting is optional
        print(f"wrote {out}.csv (plot skipped: {e})")


if __name__ == "__main__":
    main()
