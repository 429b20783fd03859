"""Threshold sharing + decryption tests.

Models the reference's self-checking binaries: `bin/tlwetn` (ring-LWE (t,p)
share & decrypt, src/TLwe_TN.cpp), `bin/convert` (LWE→TLWE conversion after a
homomorphic gate, src/Convert.cpp), `src/pk.cpp` (public-key encrypt →
threshold decrypt loop), and `src/KeySplit.cpp` (Shamir)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torus_fhe_tpu import threshold
from torus_fhe_tpu.core.params import RLweParams
from torus_fhe_tpu.lwe import lwe_encrypt, lwe_keygen, lwe_phase
from torus_fhe_tpu.core.params import LweParams
from torus_fhe_tpu.rlwe import rlwe_encrypt, rlwe_keygen, rlwe_phase
from torus_fhe_tpu.threshold import shamir, shares as sh


def test_group_rank_roundtrip():
    t, p = 3, 6
    for gid in range(1, sh.ncr(p, t) + 1):
        parties = sh.find_parties(gid, t, p)
        assert len(parties) == t
        assert sh.find_group_id(parties, t, p) == gid


def test_distribution_matrix_reconstruction():
    """M·ρ shares reconstruct the secret as share1 - share2 - ... per group."""
    t, k, p = 3, 2, 5
    M = sh.build_distribution_matrix(t, k, p)
    G = sh.ncr(p, t)
    assert M.shape == (G * k * t, k + G * k * (t - 1))
    rng = np.random.default_rng(0)
    rho = rng.integers(0, 2, (M.shape[1], 8), dtype=np.int32)
    S = (M @ rho).reshape(G, t, k, 8)
    secret = rho[:k]
    for g in range(G):
        rec = S[g, 0] - S[g, 1:].sum(0)
        np.testing.assert_array_equal(rec, secret)


@pytest.mark.parametrize("maker", [sh.share_secret, sh.share_secret_streaming])
def test_share_secret_reconstructs(maker):
    t, p, k, N = 3, 5, 2, 32
    key = np.random.default_rng(1).integers(0, 2, (k, N)).astype(np.int32)
    repo = maker(key, t, p, jax.random.PRNGKey(0))
    for parties in itertools.combinations(range(1, p + 1), t):
        stack = repo.subset_shares(parties)
        rec = stack[0] - stack[1:].sum(0)
        np.testing.assert_array_equal(rec, key)


def test_tlwetn_flow():
    """Ring-LWE (3,5) share & threshold decrypt of a 32-bit word
    (src/TLwe_TN.cpp:19-147), incl. smudging sweep."""
    params = RLweParams(polynomial_degree=64, mask_size=2, bits=32)
    key = rlwe_keygen(jax.random.PRNGKey(0), params)
    msg = 13452  # test/plain22.txt fixture value
    mu = threshold.encode_bits(msg, params.polynomial_degree)
    ct = rlwe_encrypt(jax.random.PRNGKey(1), mu, 0.001, key, params)

    # direct decryption sanity
    direct = threshold.decode_bits(rlwe_phase(ct, key))
    assert direct == msg

    repo = sh.share_secret_streaming(np.asarray(key.key), 3, 5, jax.random.PRNGKey(2))
    for i, bound in enumerate([0.0125, 1e-3]):
        for parties in ([1, 2, 4], [2, 3, 5], [1, 4, 5]):
            plain = threshold.threshold_decrypt(
                ct, repo, parties, bound, jax.random.PRNGKey(10 + i))
            assert threshold.decode_bits(plain) == msg, (bound, parties)


def test_convert_flow_lwe_to_tlwe():
    """LWE→TLWE conversion preserves the phase in coefficient 0
    (src/Convert.cpp:12-19, 100-114) and threshold-decrypts correctly."""
    n = 64
    lparams = LweParams(n)
    lkey = lwe_keygen(jax.random.PRNGKey(0), lparams)
    msgs = jnp.asarray(np.array([1, 0, 1, 1]) << 31).astype(jnp.int32)  # bits at MSIZE=2
    ct = lwe_encrypt(jax.random.PRNGKey(1), msgs, 2**-15, lkey, (4,))

    ring = threshold.tlwe_from_lwe(ct)
    rkey = threshold.tlwe_key_from_lwe_key(lkey)
    phase_ring = rlwe_phase(ring, rkey)[..., 0]
    phase_lwe = lwe_phase(ct, lkey)
    np.testing.assert_array_equal(np.asarray(phase_ring), np.asarray(phase_lwe))

    repo = sh.share_secret_streaming(np.asarray(rkey.key), 3, 5, jax.random.PRNGKey(2))
    for b in range(4):
        one = jax.tree.map(lambda x: x[b], ring)
        plain = threshold.threshold_decrypt(one, repo, [1, 2, 4], 1e-3,
                                            jax.random.PRNGKey(3 + b))
        bit = threshold.decode_bits(plain, n_bits=1)
        assert bit == int(np.asarray(msgs)[b] != 0)


def test_public_key_encrypt_threshold_decrypt():
    """pk.cpp flow: PK encrypt → convert → (2,3) threshold decrypt, many rounds."""
    n = 64
    lparams = LweParams(n)
    lkey = lwe_keygen(jax.random.PRNGKey(0), lparams)
    pk = threshold.public_keygen(jax.random.PRNGKey(1), lkey, 2**-15)
    msgs = jnp.asarray(np.random.default_rng(3).integers(0, 2, 32) == 1)
    ct = threshold.public_encrypt(jax.random.PRNGKey(2), pk, msgs)
    # direct phase check
    dec = np.asarray(lwe_phase(ct, lkey)) > 0
    np.testing.assert_array_equal(dec, np.asarray(msgs))

    ring = threshold.tlwe_from_lwe(ct)
    rkey = threshold.tlwe_key_from_lwe_key(lkey)
    repo = sh.share_secret_streaming(np.asarray(rkey.key), 2, 3, jax.random.PRNGKey(4))
    for b in range(4):
        one = jax.tree.map(lambda x: x[b], ring)
        plain = threshold.threshold_decrypt(one, repo, [1, 3], 1e-4,
                                            jax.random.PRNGKey(20 + b))
        got = np.asarray(plain)[0] > 0  # sign decode like Convert.cpp:110
        assert bool(got) == bool(np.asarray(msgs)[b])


def test_shamir_roundtrip():
    key_bits = np.random.default_rng(0).integers(0, 2, 128)
    shards = shamir.split_key(key_bits, t=3, n=7, seed=5)
    rec = shamir.reconstruct_key(shards, use=[6, 2, 4])
    np.testing.assert_array_equal(rec, key_bits)
    rec2 = shamir.reconstruct_key(shards)
    np.testing.assert_array_equal(rec2, key_bits)
