"""Additive key-split threshold decryption (TwoTwo/TlweTwoTwo/NN flows)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torus_fhe_tpu import lwe, rlwe, threshold
from torus_fhe_tpu.core.params import LweParams, RLweParams
from torus_fhe_tpu.core.torus import decode_message, encode_message

LWE_PARAMS = LweParams(size=500)
RLWE_PARAMS = RLweParams(polynomial_degree=256, mask_size=1, bits=32)


def test_split_reconstructs():
    k = lwe.lwe_keygen(jax.random.PRNGKey(0), LWE_PARAMS)
    sh = threshold.split_lwe_key(jax.random.PRNGKey(1), k, 5)
    np.testing.assert_array_equal(np.asarray(sh.shares).sum(0).astype(np.int32),
                                  np.asarray(k.key))


@pytest.mark.parametrize("parties", [2, 4])
def test_lwe_two_two_decrypt(parties):
    """TwoTwo.cpp:24-87: encrypt bits, additively split the key, combine
    partials, decode — across a smudging-bound sweep."""
    sk = lwe.lwe_keygen(jax.random.PRNGKey(0), LWE_PARAMS)
    msgs = jnp.asarray([1, -1, 1, 1, -1, -1, 1, -1])
    mu = encode_message(msgs, 8)
    ct = lwe.lwe_encrypt(jax.random.PRNGKey(1), mu, 1e-5, sk, mu.shape)
    sh = threshold.split_lwe_key(jax.random.PRNGKey(2), sk, parties)

    def ok(bound):
        partials = threshold.lwe_partial_decrypt(ct, sh, bound,
                                                 jax.random.PRNGKey(3))
        phase = threshold.combine(ct, partials)
        return bool(np.array_equal(np.asarray(decode_message(phase, 8)),
                                   np.asarray(msgs)))

    # small bounds decrypt; the frontier search returns a nonzero bound
    assert ok(1e-5)
    best = threshold.max_tolerable_bound(ok, [1e-5, 1e-4, 1e-3, 0.25])
    assert best >= 1e-5


def test_rlwe_two_two_decrypt_sparse_smudging():
    """TlweTwoTwo/NN: ring 2-of-2 with sparse RandomSmudge (NN.cpp:17-31)."""
    rk = rlwe.rlwe_keygen(jax.random.PRNGKey(0), RLWE_PARAMS)
    N = RLWE_PARAMS.polynomial_degree
    value = 0xB3
    mu = jnp.zeros(N, jnp.int32).at[:8].set(
        jnp.asarray([(value >> i) & 1 for i in range(8)], jnp.int32) << 31)
    ct = rlwe.rlwe_encrypt(jax.random.PRNGKey(1), mu, 1e-7, rk, RLWE_PARAMS)
    sh = threshold.split_rlwe_key(jax.random.PRNGKey(2), rk, 3)

    partials = threshold.rlwe_partial_decrypt(ct, sh, 1e-5,
                                              jax.random.PRNGKey(3),
                                              sparse_coords=N // 4)
    phase = threshold.combine(ct, partials)
    got = threshold.decode_bits(phase, n_bits=8)
    assert got == value


def test_huge_ring_additive_decrypt():
    """TlweTwoTwo.cpp:53-55 huge-ring regime: N = 2^20, 2-of-2 additive split,
    partial decrypt through the limb-f64-FFT product (the exact circulant
    would materialise an (N, N) matrix), combine, decode."""
    big = RLweParams(polynomial_degree=1 << 20, mask_size=1, bits=32)
    rk = rlwe.rlwe_keygen(jax.random.PRNGKey(0), big)
    value = 0x5AC3
    N = big.polynomial_degree
    mu = jnp.zeros(N, jnp.int32).at[:16].set(
        jnp.asarray([(value >> i) & 1 for i in range(16)], jnp.int32) << 31)
    ct = rlwe.rlwe_encrypt(jax.random.PRNGKey(1), mu, 1e-7, rk, big)
    sh = threshold.split_rlwe_key(jax.random.PRNGKey(2), rk, 2)

    partials = threshold.rlwe_partial_decrypt(ct, sh, 1e-4,
                                              jax.random.PRNGKey(3))
    phase = threshold.combine(ct, partials)
    got = threshold.decode_bits(phase, n_bits=16)
    assert got == value
