"""Statistical noise / wrong-decryption measurement harness.

TPU-native rework of the reference's measurement suites
(3-gen-mk-tfhe/measurements/test_suites/*, e.g.
measurements_us_simplified_3.jl:66-117): per parameter set, run N trials of
encrypt → bootstrap → phase, record the torus noise of fresh and bootstrapped
ciphertexts (`noise_calc`, numeric-functions.jl:117-132), classify wrong
decryptions (phase out of [0, 1/4] band — docs/3gen/MANUAL.md:106-113), and
report key sizes and bootstrap wall times. Results mirror the reference's
.dat rows; the trial axis is one vmapped batch instead of a Julia loop.
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..core.torus import encode_message, noise_calc


@dataclasses.dataclass
class NoiseReport:
    trials: int
    fresh_noise_std: float
    fresh_noise_max: float
    boot_noise_std: float
    boot_noise_max: float
    wrong_decryptions: int
    wrong_indices: list
    bk_bytes: int
    ks_bytes: int
    bootstrap_wall_s: float
    boot_noises: np.ndarray | None = None  # raw per-trial bootstrapped noise
    fresh_noises: np.ndarray | None = None

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d.pop("boot_noises", None)
        d.pop("fresh_noises", None)
        return json.dumps(d)

    def write_artifacts(self, directory: str, tag: str) -> None:
        """Reference-style result files (noise_results/mk-noises__*.dat and
        log_1st_method_errors.log): one bootstrapped-noise value per line,
        wrong decryptions logged with full context."""
        import os

        os.makedirs(directory, exist_ok=True)
        if self.boot_noises is not None:
            with open(os.path.join(directory, f"noises__{tag}.dat"), "w") as f:
                for v in np.asarray(self.boot_noises).ravel():
                    f.write(f"{float(v):.17g}\n")
        with open(os.path.join(directory, f"log__{tag}.log"), "w") as f:
            f.write(f"# {tag}: {self.to_json()}\n")
            for idx in self.wrong_indices:
                noise = (float(np.asarray(self.boot_noises).ravel()[idx])
                         if self.boot_noises is not None else float("nan"))
                f.write(f"wrong_decryption trial={idx} noise={noise:.6g}\n")


def measure_single_key(key, params, trials: int = 1000) -> NoiseReport:
    """Single-key harness: NAND-style bootstrap noise over a trial batch."""
    from ..boot import api, gates
    from ..lwe import lwe_phase

    k1, k2, k3 = jax.random.split(key, 3)
    sk, ck = api.make_key_pair(k1, params)

    msgs = jax.random.bernoulli(k2, 0.5, (trials,))
    ct = api.encrypt(k3, sk, msgs)
    mu = jnp.where(msgs, encode_message(1, 8), encode_message(-1, 8))
    fresh = np.asarray(noise_calc(mu, lwe_phase(ct, sk.key)))

    t0 = time.time()
    # bootstrapped AND with an encryption of True: output encodes msgs
    true_ct = api.encrypt(jax.random.fold_in(key, 9), sk,
                          jnp.ones((trials,), bool))
    out = gates.gate_and(ck, ct, true_ct)
    out.b.block_until_ready()
    wall = time.time() - t0

    phase = np.asarray(lwe_phase(out, sk.key))
    boot = np.asarray(noise_calc(mu, phase))
    dec = phase > 0
    wrong = np.nonzero(dec != np.asarray(msgs))[0]

    bk_bytes = ck.bootstrap_key.kernels.nbytes
    ks_bytes = ck.keyswitch_key.mat.nbytes
    return NoiseReport(trials, float(fresh.std()), float(np.abs(fresh).max()),
                       float(boot.std()), float(np.abs(boot).max()),
                       int(wrong.size), wrong.tolist()[:16], bk_bytes, ks_bytes,
                       wall, boot_noises=boot, fresh_noises=fresh)


def measure_multikey(key, params, parties: int, trials: int = 1000) -> NoiseReport:
    """Multikey 3gen harness (measurements_us_simplified_*: fresh +
    bootstrapped noise, error classes, BK/KSK sizes, timings)."""
    from .. import mk
    from ..mk import gates3gen
    from ..mk.samples import mk_lwe_phase

    sks = [mk.mk_party_keygen(jax.random.fold_in(key, 100 + p), params)
           for p in range(parties)]
    ck = mk.mk_cloud_keygen(jax.random.fold_in(key, 7), sks, params)
    lwe_keys = [sk.lwe for sk in sks]

    msgs = jax.random.bernoulli(jax.random.fold_in(key, 1), 0.5, (trials,))
    ct = mk.mk_encrypt(jax.random.fold_in(key, 2), lwe_keys, msgs, params)
    mu = jnp.where(msgs, encode_message(1, 8), encode_message(-1, 8))
    fresh = np.asarray(noise_calc(mu, mk_lwe_phase(ct, lwe_keys)))

    true_ct = mk.mk_encrypt(jax.random.fold_in(key, 3), lwe_keys,
                            jnp.ones((trials,), bool), params)
    t0 = time.time()
    out = gates3gen.mk_gate_and(ck, ct, true_ct)
    out.b.block_until_ready()
    wall = time.time() - t0

    phase = np.asarray(mk_lwe_phase(out, lwe_keys))
    boot = np.asarray(noise_calc(mu, phase))
    dec = phase > 0
    wrong = np.nonzero(dec != np.asarray(msgs))[0]
    return NoiseReport(trials, float(fresh.std()), float(np.abs(fresh).max()),
                       float(boot.std()), float(np.abs(boot).max()),
                       int(wrong.size), wrong.tolist()[:16],
                       ck.bk_kernels.nbytes, ck.ks_mat.nbytes, wall,
                       boot_noises=boot, fresh_noises=fresh)
