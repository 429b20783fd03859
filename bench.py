"""North-star benchmark: bootsAND gate bootstraps per second on one chip.

BASELINE.json target: >= 100k bootsAND/s on a v5e-8, i.e. 12.5k gates/s/chip;
`vs_baseline` reports value / 12500 (per-chip share of the pod-slice target).
The reference publishes no absolute numbers (BASELINE.md) — its own harness
measures bootstrap time per gate on CPU (<0.1 s/gate upstream claim).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "gates/s", "vs_baseline": N/12500}
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


PER_CHIP_TARGET = 12_500.0  # 100k / 8 chips


def main() -> None:
    import os

    # persistent XLA compilation cache: the bootstrap scan compiles in
    # minutes on this toolchain, once
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from torus_fhe_tpu.boot import api, gates
    from torus_fhe_tpu.core.params import (tfhe_parameters_128_tpu,
                                           tfhe_parameters_128_tpu_fast)

    def log(msg):
        print(f"[bench +{time.time() - T0:8.1f}s] {msg}", file=sys.stderr,
              flush=True)

    T0 = time.time()
    params = (tfhe_parameters_128_tpu() if "--l3" in sys.argv
              else tfhe_parameters_128_tpu_fast())
    t0 = time.time()
    # F-block key form -> the fused Pallas blind-rotate kernel on TPU.
    # Keys round-trip through the compact serialized form (utils/serialize):
    # cold starts after the first run skip the ~20-40s keygen entirely.
    from torus_fhe_tpu.utils import serialize

    tag = "l3" if "--l3" in sys.argv else "fast"
    sk_path = os.path.join(cache_dir, f"bench_sk_{tag}.npz")
    ck_path = os.path.join(cache_dir, f"bench_ck_{tag}.npz")
    sk = None
    if (os.path.exists(sk_path) and os.path.exists(ck_path)
            and "--fresh-key" not in sys.argv):
        log("loading cached key")
        sk = serialize.load_secret_key(sk_path)
        if sk.params != params:  # stale cache from an older parameter rev
            log("cached key params stale; regenerating")
            sk = None
        else:
            ck = serialize.load_cloud_key(ck_path, forms=("fblock",))
    if sk is None:
        log("keygen start")
        sk, ck = api.make_key_pair(jax.random.PRNGKey(0), params,
                                   forms=("fblock",))
        serialize.save_secret_key(sk_path, sk)
        serialize.save_cloud_key(ck_path, ck)
    jax.block_until_ready(ck.bootstrap_key.fb)
    keygen_s = time.time() - t0
    log(f"key ready ({keygen_s:.1f}s)")

    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    B = int(pos[0]) if pos else 4096
    rng = np.random.default_rng(42)
    xs = jnp.asarray(rng.integers(0, 2, B, dtype=np.int64) == 1)
    ys = jnp.asarray(rng.integers(0, 2, B, dtype=np.int64) == 1)
    cx = api.encrypt(jax.random.PRNGKey(1), sk, xs)
    cy = api.encrypt(jax.random.PRNGKey(2), sk, ys)

    step = jax.jit(gates.gate_and)

    log("gate compile start")
    t0 = time.time()
    out = step(ck, cx, cy)
    out.b.block_until_ready()
    compile_s = time.time() - t0
    log(f"gate compile done ({compile_s:.1f}s)")

    # correctness gate: don't benchmark garbage
    dec = np.asarray(api.decrypt(sk, out))
    want = np.asarray(xs) & np.asarray(ys)
    assert np.array_equal(dec, want), "bootsAND decrypt mismatch"
    log("correctness gate passed; timing")

    # timed region (host-dispatched batches)
    iters = 4
    t0 = time.time()
    for _ in range(iters):
        out = step(ck, cx, cy)
    out.b.block_until_ready()
    dt = time.time() - t0

    # steady-state: T chained NANDs inside ONE program (x_{t+1} = NAND(x_t, y)
    # — a real sequential circuit), so the device never waits on per-batch
    # host dispatch through the tunnel. Decrypt-checked against the plaintext
    # recurrence below.
    T = 8

    def chain(ck, x0, y):
        def body(x, _):
            return gates.gate_nand(ck, x, y), None

        xT, _ = jax.lax.scan(body, x0, None, length=T)
        return xT

    chain_j = jax.jit(chain, static_argnums=())
    log("chain compile start")
    outc = chain_j(ck, cx, cy)
    outc.b.block_until_ready()
    # warm the fetch program too: through the tunnel even a tiny reduce_sum
    # compile costs seconds and sub-1s compiles skip the persistent cache —
    # timing it would understate the chain rate ~4x (seen in r5)
    _ = float(jnp.sum(outc.b))
    log("chain compiled; timing")
    t0 = time.time()
    outc = chain_j(ck, cx, cy)
    _ = float(jnp.sum(outc.b))  # device->host fetch: tunnel-proof timing
    dt_chain = time.time() - t0
    px = np.asarray(xs)
    for _ in range(T):
        px = ~(px & np.asarray(ys))
    assert np.array_equal(np.asarray(api.decrypt(sk, outc)), px), \
        "chained NAND decrypt mismatch"
    chain_rate = B * T / dt_chain

    # secondary metric: single-bootstrap p50 latency (batch of 1)
    c1 = api.encrypt(jax.random.PRNGKey(3), sk, jnp.asarray([True]))
    lat = step(ck, c1, c1)  # compile the B=1 shape
    lat.b.block_until_ready()
    lats = []
    for _ in range(5):
        t1 = time.time()
        lat = step(ck, c1, c1)
        lat.b.block_until_ready()
        lats.append(time.time() - t1)
    p50_ms = sorted(lats)[len(lats) // 2] * 1e3

    gates_per_s = B * iters / dt
    # The headline is the chained steady-state regime, deterministically (not
    # a silent max over regimes — ADVICE r3): one XLA program running T
    # sequential NANDs is the production serving shape, free of per-batch
    # host-dispatch latency through the tunnel. The dispatched-regime rate is
    # disclosed alongside for cross-round comparison.
    print(json.dumps({
        "metric": "bootsAND_gates_per_sec_per_chip",
        "value": round(chain_rate, 2),
        "unit": "gates/s",
        "vs_baseline": round(chain_rate / PER_CHIP_TARGET, 4),
        "extra": {
            "regime": "chained_steady_state",
            "dispatched_gates_per_s": round(gates_per_s, 2),
            "chained_gates_per_s": round(chain_rate, 2),
            "chain_len": T,
            "batch": B, "iters": iters, "wall_s": round(dt, 3),
            "compile_s": round(compile_s, 2), "keygen_s": round(keygen_s, 2),
            "p50_single_bootstrap_ms": round(p50_ms, 1),
            "params": ("tfhe_128_tpu (n=630, N=1024, k=1, l=3 Bg=2^7, "
                       "full masks + body-2^8 rounding, 7 limb-cols; r5 "
                       "sound-BK fix)"
                       if "--l3" in sys.argv else
                       "tfhe_128_tpu_fast (n=630, N=512, k=2 module-LWE, "
                       "l=2 Bg=2^8, full masks + body-2^8 rounding, "
                       "11 limb-cols; r5 sound-BK fix)"),
            "backend": "pallas fused blind rotate (F-block BK)",
            "device": str(jax.devices()[0]),
            "note": "target is 100k gates/s on v5e-8 => 12.5k/chip",
        },
    }))


if __name__ == "__main__":
    main()
