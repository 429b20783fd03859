"""Multi-chip scaling benchmark: gates/s vs device count over a batch mesh.

The BASELINE scaling row ("gates/s efficiency measured at 1 chip, 1 host,
>=2 hosts") — and the TPU-native answer to the reference's Distributed.jl
fan-out (3-gen-mk-tfhe/VolMatch2.jl:4: addprocs(106) + @spawnat over order
batches). Here the "workers" are mesh slices: the bootstrapping/keyswitch
keys are replicated on every chip, the gate batch is sharded along the
`batch` mesh axis, and XLA runs the blind rotates fully in parallel — no
collectives on the hot path at all (data parallelism over independent
ciphertexts; the only cross-chip traffic is the initial shard placement).

Per device count d it reports gates/s, per-device gates/s, and parallel
efficiency vs the single-device run. Every timed batch is decrypt-checked
first (same rule as bench.py).

Usage:
    python benchmarks/scaling.py                      # real devices (TPU)
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py --platform cpu   # virtual 8-CPU mesh
                                                      # (functional numbers)
Writes measurements/scaling_<platform>.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device-batch", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--params", default=None,
                    help="registry name (default: tfhe_128_tpu_fast on tpu, "
                         "tfhe_test_small on cpu)")
    ap.add_argument("--counts", default=None,
                    help="comma-separated device counts (default 1,2,4,..,D)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from torus_fhe_tpu.boot import api, gates
    from torus_fhe_tpu.core.params import PARAMETER_REGISTRY
    from torus_fhe_tpu.parallel import mesh as pmesh

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    pname = args.params or ("tfhe_128_tpu_fast" if on_tpu else
                            "tfhe_test_small")
    params = PARAMETER_REGISTRY[pname]()

    D = len(jax.devices())
    if args.counts:
        counts = [int(c) for c in args.counts.split(",")]
    else:
        counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= D]

    t0 = time.time()
    forms = ("fblock",) if on_tpu else ("conv",)
    sk, ck0 = api.make_key_pair(jax.random.PRNGKey(0), params, forms=forms)
    print(f"keygen({pname}) {time.time() - t0:.1f}s on {platform} x{D}",
          file=sys.stderr, flush=True)

    results = []
    base_rate = None
    for d in counts:
        devices = jax.devices()[:d]
        m = pmesh.make_mesh(n_batch=d, n_party=1, devices=devices)
        ck = pmesh.replicate_cloud_key(ck0, m)
        B = args.per_device_batch * d
        rng = np.random.default_rng(7)
        xs = rng.integers(0, 2, B, dtype=np.int64) == 1
        ys = rng.integers(0, 2, B, dtype=np.int64) == 1
        cx = pmesh.shard_lwe_batch(
            api.encrypt(jax.random.PRNGKey(1), sk, jnp.asarray(xs)), m)
        cy = pmesh.shard_lwe_batch(
            api.encrypt(jax.random.PRNGKey(2), sk, jnp.asarray(ys)), m)

        step = jax.jit(gates.gate_and, out_shardings=pmesh.batch_sharding(m))
        t0 = time.time()
        out = step(ck, cx, cy)
        out.b.block_until_ready()
        compile_s = time.time() - t0

        # correctness gate on every lane before timing
        from torus_fhe_tpu.lwe import LweSample

        host = LweSample(np.asarray(jax.device_get(out.a)),
                         np.asarray(jax.device_get(out.b)))
        dec = np.asarray(api.decrypt(sk, host))
        assert np.array_equal(dec, xs & ys), f"decrypt mismatch at d={d}"

        t0 = time.time()
        for _ in range(args.iters):
            out = step(ck, cx, cy)
        _ = float(jnp.sum(out.b))  # device->host fetch: tunnel-proof timing
        dt = time.time() - t0
        rate = B * args.iters / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * d / counts[0])
        row = {"devices": d, "batch": B, "gates_per_s": round(rate, 1),
               "gates_per_s_per_device": round(rate / d, 1),
               "efficiency": round(eff, 4), "compile_s": round(compile_s, 2),
               "wall_s": round(dt, 3)}
        results.append(row)
        print(json.dumps(row), flush=True)

    payload = {"platform": platform, "params": pname,
               "per_device_batch": args.per_device_batch,
               "iters": args.iters, "device": str(jax.devices()[0]),
               "results": results}
    if platform == "cpu":
        payload["note"] = ("virtual host devices share physical cores: these "
                          "numbers validate the sharded program functionally; "
                          "efficiency is only meaningful on real chips")
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "measurements", f"scaling_{platform}.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
