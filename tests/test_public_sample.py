"""Public sampling: fresh ciphertexts from the cloud key only
(public_sample_LWE*.cpp flows)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torus_fhe_tpu.boot import api, public_sample
from torus_fhe_tpu.core.params import test_parameters as make_test_params
from torus_fhe_tpu.rlwe import rlwe_encrypt, rlwe_keygen
from torus_fhe_tpu.lwe import lwe_phase
from torus_fhe_tpu.core.torus import decode_message, encode_message

PARAMS = make_test_params(n=16, N=64)


@pytest.fixture(scope="module")
def keys():
    return api.make_key_pair(jax.random.PRNGKey(11), PARAMS)


def test_fresh_zero_and_public_sample(keys):
    sk, ck = keys
    seed_msgs = jnp.asarray([True, False, True, False])
    x = api.encrypt(jax.random.PRNGKey(1), sk, seed_msgs)

    z = public_sample.fresh_zero(ck, x)
    # decrypts to False regardless of the seed bit
    assert not np.asarray(api.decrypt(sk, z)).any()
    # and is not trivially zero — it is a real ciphertext with a mask
    assert np.asarray(z.a).any()

    want = jnp.asarray([True, True, False, True])
    fresh = public_sample.public_sample(ck, x, want)
    np.testing.assert_array_equal(np.asarray(api.decrypt(sk, fresh)),
                                  np.asarray(want))


def test_rlwe_extract_at_position(keys):
    sk, _ = keys
    rkey = rlwe_keygen(jax.random.PRNGKey(2), PARAMS.rlwe)
    N = PARAMS.rlwe_polynomial_degree
    bits = np.array([1, 0, 1, 1, 0, 1, 0, 0])
    mu = jnp.zeros(N, jnp.int32).at[:8].set(
        jnp.asarray(encode_message(bits, 2)))
    ct = rlwe_encrypt(jax.random.PRNGKey(3), mu, 1e-7, rkey, PARAMS.rlwe)

    from torus_fhe_tpu.rlwe import extract_lwe_key
    ekey = extract_lwe_key(rkey)
    for pos in (0, 3, 7):
        u = public_sample.rlwe_extract_sample_at(ct, pos)
        got = int(decode_message(lwe_phase(u, ekey), 2)) & 1
        assert got == bits[pos], pos
