"""Bisect which F-block geometry crashes the TPU compile helper.

Synthetic int8 keys (no keygen): each config just attempts to compile+run
blind_rotate_pallas once. Usage:
    python benchmarks/pallas_compile_bisect.py "n=630,cols=5" "n=1040,cols=8" ...
Config string: n=<steps>,cols=<limb-cols>,bt=<tile>,il=<interleave>,B=<batch>
(cols counts total limb columns: mask gets cols-3... simplified: we build a
geometry with mask_size=1 and a cols tuple of the requested length).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from torus_fhe_tpu.ops.fblock import FBlockGeometry
from torus_fhe_tpu.ops.pallas_rotate import blind_rotate_pallas


def run(cfg: str):
    kv = dict(p.split("=") for p in cfg.split(","))
    n = int(kv.get("n", 630))
    ncols = int(kv.get("cols", 5))
    bt = int(kv.get("bt", 256))
    il = int(kv.get("il", 2))
    B = int(kv.get("B", bt))
    N, bs = 1024, 128
    # cols: body keeps the top ceil(ncols/2)... simply alternate polys
    cols = tuple((i % 2, 8 * (i // 2)) for i in range(ncols))
    geom = FBlockGeometry(n=n, N=N, bs=bs, nb=N // bs, D=2 * N // bs, C=2,
                          R=4, cols=cols, bits=32)
    rng = np.random.default_rng(0)
    fb = jnp.asarray(rng.integers(-128, 128, (n, geom.D * geom.R * bs,
                                              ncols * bs), dtype=np.int16
                                  ).astype(np.int8))
    bara = jnp.asarray(rng.integers(0, 2 * N, (B, n), dtype=np.int64),
                       jnp.int32)
    barb = jnp.asarray(rng.integers(0, 2 * N, (B,), dtype=np.int64),
                       jnp.int32)
    t0 = time.time()
    try:
        out = blind_rotate_pallas(None, fb, bara, geom, 2, 8, 1 << 24,
                                  b_tile=bt, interleave=il,
                                  stepvec=(1 << 29, barb))
        jax.block_until_ready(out)
        print(f"{cfg}: OK ({time.time() - t0:.1f}s)", flush=True)
    except Exception as e:
        print(f"{cfg}: FAIL {str(e)[:120]} ({time.time() - t0:.1f}s)",
              flush=True)


def main():
    for cfg in sys.argv[1:]:
        if cfg.startswith("jit:"):
            run_jit(cfg[4:])
        else:
            run(cfg)


def run_jit(cfg: str):
    """Same as run() but through jax.jit with fb as a traced argument —
    reproduces the whole-gate compile environment."""
    import functools

    kv = dict(p.split("=") for p in cfg.split(","))
    n = int(kv.get("n", 630))
    ncols = int(kv.get("cols", 5))
    bt = int(kv.get("bt", 256))
    il = int(kv.get("il", 2))
    B = int(kv.get("B", bt))
    N, bs = 1024, 128
    if kv.get("layout") == "real":
        # the shipped MK layout: per-poly consecutive limb columns
        per = ncols // 2
        cols = tuple((p, 8 * m) for p in range(2) for m in range(per))
    else:
        cols = tuple((i % 2, 8 * (i // 2)) for i in range(ncols))
    geom = FBlockGeometry(n=n, N=N, bs=bs, nb=N // bs, D=2 * N // bs, C=2,
                          R=4, cols=cols, bits=32)
    rng = np.random.default_rng(0)
    fb = jnp.asarray(rng.integers(-128, 128, (n, geom.D * geom.R * bs,
                                              ncols * bs), dtype=np.int16
                                  ).astype(np.int8))
    bara = jnp.asarray(rng.integers(0, 2 * N, (B, n), dtype=np.int64),
                       jnp.int32)
    barb = jnp.asarray(rng.integers(0, 2 * N, (B,), dtype=np.int64),
                       jnp.int32)

    @jax.jit
    def fn(fb_, bara_, barb_):
        if kv.get("dx64"):

            with jax.enable_x64(False):
                return blind_rotate_pallas(None, fb_, bara_, geom, 2, 8,
                                           1 << 24, b_tile=bt, interleave=il,
                                           stepvec=(1 << 29, barb_))
        return blind_rotate_pallas(None, fb_, bara_, geom, 2, 8, 1 << 24,
                                   b_tile=bt, interleave=il,
                                   stepvec=(1 << 29, barb_))

    t0 = time.time()
    try:
        jax.block_until_ready(fn(fb, bara, barb))
        print(f"jit:{cfg}: OK ({time.time() - t0:.1f}s)", flush=True)
    except Exception as e:
        print(f"jit:{cfg}: FAIL {str(e)[:120]} ({time.time() - t0:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
