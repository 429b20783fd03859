"""MK blind-rotate kernel tuning: (b_tile, interleave, unroll) at the
multikey hi-word geometry (parties*n steps, 8 limb columns).

Keygen once at the real 2-party 3gen set; times the pallas rotate alone.

    python benchmarks/mk_rotate_sweep.py [--batch 1024] [--configs ...]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--configs", default="256:2:1,128:2:1,256:4:1,512:2:1,"
                                         "256:2:2,1024:4:1")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--parties", type=int, default=2)
    args = ap.parse_args()

    from torus_fhe_tpu import mk
    from torus_fhe_tpu.core.params import PARAMETER_REGISTRY, TGswParams
    from torus_fhe_tpu.mk.keys3gen import mk_fb_geometry
    from torus_fhe_tpu.ops.pallas_rotate import blind_rotate_pallas

    params = PARAMETER_REGISTRY[f"mk_{args.parties}party_3gen"]()
    t0 = time.time()
    sks = [mk.mk_party_keygen(jax.random.PRNGKey(10 + p), params)
           for p in range(args.parties)]
    ck = mk.mk_cloud_keygen(jax.random.PRNGKey(9), sks, params,
                            forms=("fblock",))
    jax.block_until_ready(ck.bk_fb)
    print(f"keygen {time.time() - t0:.1f}s  fb {ck.bk_fb.nbytes / 2**30:.2f} GB",
          flush=True)

    geom = mk_fb_geometry(params, args.parties)
    tg = TGswParams(params.gsw_decomp_length, params.gsw_log2_base, 32)
    B = args.batch
    rng = np.random.default_rng(0)
    bara = jnp.asarray(rng.integers(0, 2 * geom.N, (B, geom.n),
                                    dtype=np.int64), jnp.int32)
    barb = jnp.asarray(rng.integers(0, 2 * geom.N, (B,), dtype=np.int64),
                       jnp.int32)
    mu = 1 << 29

    ref = None
    for cfg in args.configs.split(","):
        parts = [int(v) for v in cfg.split(":")]
        bt, il = parts[0], parts[1]
        un = parts[2] if len(parts) > 2 else 1

        @functools.partial(jax.jit, static_argnums=(3, 4, 5))
        def fn(fb, bara_, barb_, bt_, il_, un_):
            return blind_rotate_pallas(
                None, fb, bara_, geom, tg.decomp_length, tg.log2_base,
                tg.offset, b_tile=bt_, interleave=il_, unroll=un_,
                stepvec=(mu, barb_))

        fn = functools.partial(fn, ck.bk_fb, bara, barb, bt, il, un)
        try:
            t0 = time.time()
            out = jax.block_until_ready(fn())
            compile_s = time.time() - t0
        except Exception as e:
            print(f"bt={bt:4d} il={il} U={un}: FAILED {str(e)[:140]}",
                  flush=True)
            continue
        if ref is None:
            ref = np.asarray(out[:32])
        elif not np.array_equal(np.asarray(out[:32]), ref):
            print(f"bt={bt:4d} il={il} U={un}: MISMATCH!", flush=True)
        t0 = time.time()
        for _ in range(args.iters):
            out = fn()
        _ = float(jnp.sum(out[0]))
        jax.block_until_ready(out)
        dt = (time.time() - t0) / args.iters
        print(f"bt={bt:4d} il={il} U={un}: {B / dt:9.1f} rot/s  "
              f"({dt * 1e3:7.1f} ms/batch, compile {compile_s:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
