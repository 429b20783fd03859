"""Blind-rotate kernel tuning sweep: (b_tile, interleave) on the real device.

Times the pallas rotate alone (stepvec init) and the full bootsAND gate, per
config. Keygen once; each config pays one compile.

    python benchmarks/rotate_sweep.py [--batch 4096] [--configs 128:1,256:2,...]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--configs", default="128:1,128:2,256:1,256:2,256:4")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--l3", action="store_true",
                    help="sweep the reference-faithful l=3/Bg=2^7 geometry "
                         "(tfhe_128_tpu) instead of the l=2 fast set — its "
                         "8-row/6-col tiles were only ever tuned by proxy")
    ap.add_argument("--ablate", default=None,
                    help="comma list of kernel phase ablations to time at "
                         "the FIRST config (phase-split evidence; outputs "
                         "are semantically wrong): norot,nodec,nodot")
    args = ap.parse_args()

    from torus_fhe_tpu.boot import api, bootstrap
    from torus_fhe_tpu.core.params import (tfhe_parameters_128_tpu,
                                           tfhe_parameters_128_tpu_fast)
    from torus_fhe_tpu.ops.pallas_rotate import blind_rotate_pallas

    params = (tfhe_parameters_128_tpu() if args.l3
              else tfhe_parameters_128_tpu_fast())
    t0 = time.time()
    sk, ck = api.make_key_pair(jax.random.PRNGKey(0), params,
                               forms=("fblock",))
    jax.block_until_ready(ck.bootstrap_key.fb)
    print(f"keygen {time.time() - t0:.1f}s", flush=True)

    geom = bootstrap._bk_geometry(params)
    tg = params.tgsw
    B = args.batch
    rng = np.random.default_rng(0)
    bara = jnp.asarray(rng.integers(0, 2 * geom.N, (B, geom.n),
                                    dtype=np.int64), jnp.int32)
    barb = jnp.asarray(rng.integers(0, 2 * geom.N, (B,), dtype=np.int64),
                       jnp.int32)
    mu = 1 << 29

    ref = None
    cfgs = [(cfg, None) for cfg in args.configs.split(",")]
    if args.ablate:
        first = args.configs.split(",")[0]
        cfgs += [(first, ab) for ab in args.ablate.split(",")]
    for cfg, ab in cfgs:
        parts = [int(v) for v in cfg.split(":")]
        bt, il = parts[0], parts[1]
        un = parts[2] if len(parts) > 2 else 1

        @functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
        def fn(fb, bara_, barb_, bt_, il_, un_, ab_):
            return blind_rotate_pallas(
                None, fb, bara_, geom, tg.decomp_length, tg.log2_base,
                tg.offset, b_tile=bt_, interleave=il_, unroll=un_,
                stepvec=(mu, barb_), ablate=ab_)

        fn = functools.partial(fn, ck.bootstrap_key.fb, bara, barb, bt, il,
                               un, ab)
        try:
            t0 = time.time()
            out = jax.block_until_ready(fn())
            compile_s = time.time() - t0
        except Exception as e:
            print(f"bt={bt:4d} il={il} U={un}: FAILED {str(e)[:160]}", flush=True)
            continue
        if ref is None and ab is None:
            ref = np.asarray(out[:64])
        elif ab is None:
            ok = np.array_equal(np.asarray(out[:64]), ref)
            if not ok:
                print(f"bt={bt:4d} il={il} U={un}: MISMATCH vs first config!",
                      flush=True)
        t0 = time.time()
        for _ in range(args.iters):
            out = fn()
        _ = float(jnp.sum(out[0]))  # device->host fetch: tunnel-proof timing
        jax.block_until_ready(out)
        dt = (time.time() - t0) / args.iters
        tag = f" ablate={ab}" if ab else ""
        print(f"bt={bt:4d} il={il} U={un}{tag}: {B / dt:9.1f} rot/s  "
              f"({dt * 1e3:7.1f} ms/batch, compile {compile_s:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
