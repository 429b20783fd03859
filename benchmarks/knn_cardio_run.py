"""Encrypted-KNN accuracy on the reference cardio fixtures -> measurements/.

The reference's application E2E (src/KNN_medical_data.cpp:818-851, accuracy
tally :738-748) on its own data1.csv. Predictions are also checked against
the plaintext-KNN oracle (they must MATCH the oracle exactly; accuracy vs
the true labels is the dataset's problem, not the crypto's).

    python benchmarks/knn_cardio_run.py [--test-rows 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CSV = "/root/reference/test/bootstrap_modules/data1.csv"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--test-rows", type=int, default=8)
    ap.add_argument("--train-rows", type=int, default=5)
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--width", type=int, default=16)
    ap.add_argument("--shift", type=int, default=4)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from torus_fhe_tpu.apps import knn
    from torus_fhe_tpu.boot import api
    from torus_fhe_tpu.core.params import test_parameters

    params = test_parameters(n=16, N=64)
    sk, ck = api.make_key_pair(jax.random.PRNGKey(0), params)
    t0 = time.time()
    res = knn.run_pipeline(jax.random.PRNGKey(3), sk, ck, CSV, k=args.k,
                           width=args.width, train_rows=args.train_rows,
                           test_rows=args.test_rows, scale_shift=args.shift,
                           jit_predict=True)
    wall = time.time() - t0

    tr_f, tr_l, te_f, _ = knn.load_cardio_csv(CSV, args.train_rows,
                                              args.test_rows)
    tr_s, te_s = tr_f >> args.shift, te_f >> args.shift
    oracle = []
    for row in te_s:
        d = np.abs(tr_s - row).sum(axis=1)
        o = np.argsort(d, kind="stable")
        oracle.append(int(tr_l[o[:args.k]].sum() > args.k // 2))
    res.update({"oracle": oracle,
                "matches_oracle": res["predictions"] == oracle,
                "wall_s": round(wall, 1), "k": args.k, "width": args.width,
                "scale_shift": args.shift, "train_rows": args.train_rows,
                "csv": CSV})
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "measurements", "knn_cardio.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
