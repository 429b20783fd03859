"""Scenario conformance at PRODUCTION parameters (n = N = 1024 libthfhe set).

Recreates the reference's `bin/convert` flow (src/Convert.cpp:49-115) after
the gate evaluation stage, end-to-end at the real parameter set:

    32-bit plaintexts 13452 & 223416 (test/plain22.txt, plain23.txt fixtures)
    -> per-bit LWE ciphertexts under the n=1024 key
    -> TLweFromLwe anti-cyclic embed (Convert.cpp:12-19)
    -> shareSecret(3, 5) of the ring-read key (libthfhe.cpp:350-356 + 250-267)
    -> thresholdDecrypt with subset {1,2,4} across the 0.0125 -> 1e-3
       smudging-bound sweep, sign decode of coefficient 0 (Convert.cpp:100-114)

The bootstrapped-AND stage itself (32 gates at production parameters) is
covered on real hardware by bench.py's decrypt-checked batch and on CPU by
the fblock/bootstrap suites; this test pins the conversion + threshold
pipeline bit-for-flow at the reference's sizes. The tlwetn flow at its real
parameters (TLweParams(1024, k=2), TLwe_TN.cpp:52) runs in tests/test_cli.py.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from torus_fhe_tpu.core.params import thfhe_parameters_1024
from torus_fhe_tpu.core.torus import encode_message
from torus_fhe_tpu.lwe import lwe_encrypt, lwe_keygen
from torus_fhe_tpu.threshold import convert as tconv
from torus_fhe_tpu.threshold import decrypt as tdec
from torus_fhe_tpu.threshold import shares as tsh

PLAIN22 = 13452
PLAIN23 = 223416


@pytest.mark.slow
def test_convert_flow_production_params():
    params = thfhe_parameters_1024()
    n = params.lwe_size
    assert n == params.rlwe_polynomial_degree == 1024

    sk = lwe_keygen(jax.random.PRNGKey(0), params.lwe)
    want = PLAIN22 & PLAIN23

    # per-bit LWE encryptions of the AND result (the Evaluate-stage output)
    bits = jnp.asarray([(want >> i) & 1 for i in range(32)])
    mu = jnp.where(bits == 1, encode_message(1, 8), encode_message(-1, 8))
    ct = lwe_encrypt(jax.random.PRNGKey(1), mu, 2**-15, sk, (32,))

    # ring-read key + (3,5) Benaloh-Leichter sharing
    rkey = tconv.tlwe_key_from_lwe_key(sk)
    repo = tsh.share_secret_streaming(np.asarray(rkey.key), 3, 5,
                                      jax.random.PRNGKey(2))

    ring = tconv.tlwe_from_lwe(ct)  # (32, 2, 1024)
    from torus_fhe_tpu.rlwe import RLweSample

    subset = [1, 2, 4]
    bound = 0.0125
    sweep = []
    while bound > 1e-3:
        got = 0
        for i in range(32):
            plain = tdec.threshold_decrypt(
                RLweSample(ring.a[i]), repo, subset, bound,
                jax.random.fold_in(jax.random.PRNGKey(3), 100 * i + sweep.__len__()))
            got |= (1 if int(np.asarray(jax.device_get(plain))[..., 0]) > 0
                    else 0) << i
        sweep.append((bound, got))
        bound /= 2
    for bound, got in sweep:
        assert got == want, (bound, got, want)

    # direct-decryption sanity like Convert.cpp:41-47
    from torus_fhe_tpu.lwe import lwe_phase

    direct = 0
    ph = np.asarray(lwe_phase(ct, sk))
    for i in range(32):
        direct |= (1 if ph[i] > 0 else 0) << i
    assert direct == want
