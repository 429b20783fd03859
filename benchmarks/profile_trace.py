"""Per-kernel device-trace breakdown of the gate bootstrap (SURVEY §5 roofline).

Captures an XLA profiler trace of the bootsAND hot path on the real device and
prints the per-category time split (pallas blind-rotate custom call vs
keyswitch matmul vs elementwise fusions) — the profile evidence for the
round-2 kernel work.

    python benchmarks/profile_trace.py [--batch 4096] [--logdir /tmp/tfhe_trace]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--logdir", default="/tmp/tfhe_trace")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--l3", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from torus_fhe_tpu.boot import api, gates
    from torus_fhe_tpu.core.params import (tfhe_parameters_128_tpu,
                                           tfhe_parameters_128_tpu_fast)
    from torus_fhe_tpu.utils import profiling

    params = (tfhe_parameters_128_tpu() if args.l3
              else tfhe_parameters_128_tpu_fast())
    # reuse bench.py's cached key when present (skips the ~1 min keygen)
    from torus_fhe_tpu.utils import serialize

    tag = "l3" if args.l3 else "fast"
    sk_path = os.path.join(cache, f"bench_sk_{tag}.npz")
    ck_path = os.path.join(cache, f"bench_ck_{tag}.npz")
    if os.path.exists(sk_path) and os.path.exists(ck_path):
        sk = serialize.load_secret_key(sk_path)
        if sk.params == params:
            ck = serialize.load_cloud_key(ck_path, forms=("fblock",))
        else:
            sk, ck = api.make_key_pair(jax.random.PRNGKey(0), params,
                                       forms=("fblock",))
    else:
        sk, ck = api.make_key_pair(jax.random.PRNGKey(0), params,
                                   forms=("fblock",))
    B = args.batch
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.integers(0, 2, B) == 1)
    cx = api.encrypt(jax.random.PRNGKey(1), sk, xs)
    cy = api.encrypt(jax.random.PRNGKey(2), sk, ~xs)
    step = jax.jit(gates.gate_and)
    jax.block_until_ready(step(ck, cx, cy))  # compile outside the trace

    with profiling.device_trace(args.logdir):
        out = step(ck, cx, cy)
        jax.block_until_ready(out)
        _ = float(jnp.sum(out.b))  # force a device->host fetch (tunnel truth)

    summary = profiling.summarize_trace(args.logdir)
    print(profiling.format_summary(summary))
    with open(os.path.join(args.logdir, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)


if __name__ == "__main__":
    main()
