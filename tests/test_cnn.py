"""Encrypted CNN conv2d layer vs plaintext oracle.

Capability match for the reference's conv workloads (3-gen-mk-tfhe/CNN.jl:9-48
conv3d indexing; the encrypted analog of mk_conv2d in 3gen_mk_gates.jl), at
tiny insecure parameters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torus_fhe_tpu.apps import cnn
from torus_fhe_tpu.boot import api
from torus_fhe_tpu.circuits import words
from torus_fhe_tpu.core.params import test_parameters as make_test_params

PARAMS = make_test_params(n=32, N=64)
WIDTH = 8


@pytest.fixture(scope="module")
def keys():
    return api.make_key_pair(jax.random.PRNGKey(99), PARAMS)


def test_scale_by_plaintext(keys):
    sk, ck = keys
    vals = jnp.array([3, 10, 20])
    ct = words.int_encrypt(jax.random.PRNGKey(5), sk, vals, WIDTH)
    for c in (0, 1, 5, -3):
        out = cnn.scale_by_plaintext(ck, ct, c, WIDTH)
        got = words.int_decrypt(sk, out, WIDTH)
        np.testing.assert_array_equal(
            got, (np.asarray(vals) * c) % (1 << WIDTH), err_msg=f"c={c}")


def test_conv2d_matches_oracle(keys):
    sk, ck = keys
    rng = np.random.default_rng(7)
    image = rng.integers(0, 6, (4, 4))
    kernels = rng.integers(-2, 3, (2, 2, 2))  # 2 filters, 2x2, signed taps

    ct_img = words.int_encrypt(
        jax.random.PRNGKey(6), sk, jnp.asarray(image), WIDTH)
    out = cnn.conv2d(ck, ct_img, kernels, WIDTH)
    got = words.int_decrypt(sk, out, WIDTH)  # (F, oh, ow)

    want = cnn.conv2d_reference(image, kernels) % (1 << WIDTH)
    np.testing.assert_array_equal(got, want)


def test_extract_patches_free(keys):
    sk, _ = keys
    image = jnp.arange(9).reshape(3, 3)
    ct = words.int_encrypt(jax.random.PRNGKey(8), sk, image, WIDTH)
    pats = cnn.extract_patches(ct, 2)
    assert pats.b.shape[:4] == (WIDTH, 4, 2, 2)
    got = words.int_decrypt(sk, pats, WIDTH)  # (4, 2, 2)
    # patch t at (i, j) is image[i+m, j+n] with t = m*2+n
    for t, (m, n) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        np.testing.assert_array_equal(
            got[t], np.asarray(image)[m:m + 2, n:n + 2])


def test_conv3d_matches_reference(keys):
    """True volumetric conv3d (beyond the reference's filter-axis 'conv3d',
    CNN.jl:9-48) against its plaintext oracle."""
    sk, ck = keys
    rng = np.random.default_rng(2)
    vol = rng.integers(0, 3, (3, 3, 3))
    kernels = rng.integers(-1, 2, (2, 2, 2, 2))
    ct = words.int_encrypt(jax.random.PRNGKey(9), sk, jnp.asarray(vol), WIDTH)
    out = cnn.conv3d(ck, ct, kernels, WIDTH)
    got = words.int_decrypt(sk, out, WIDTH)  # (F, od, oh, ow)
    want = cnn.conv3d_reference(vol, kernels) % (1 << WIDTH)
    np.testing.assert_array_equal(got, want)
