"""Encrypted volume-matching test (VolumeMatching.jl flow, scaled down)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torus_fhe_tpu import mk
from torus_fhe_tpu.apps import volume_matching as vm
from torus_fhe_tpu.core.params import test_parameters_3gen as params_3gen

PARAMS = params_3gen(parties=2, n=16, N=64)
WIDTH = 5


@pytest.fixture(scope="module")
def keys():
    sks = [mk.mk_party_keygen(jax.random.PRNGKey(50 + p), PARAMS) for p in range(2)]
    ck = mk.mk_cloud_keygen(jax.random.PRNGKey(51), sks, PARAMS)
    return sks, ck


def test_volume_match(keys):
    sks, ck = keys
    lwe_keys = [sk.lwe for sk in sks]
    buys = np.array([5, 3, 8])
    sells = np.array([4, 6])
    # expected: total = min(16, 10) = 10; matched buys: 5, 3, 2; sells: 4, 6
    cb = mk.mk_int_encrypt(jax.random.PRNGKey(1), lwe_keys, jnp.asarray(buys), WIDTH, PARAMS)
    cs = mk.mk_int_encrypt(jax.random.PRNGKey(2), lwe_keys, jnp.asarray(sells), WIDTH, PARAMS)
    zero = mk.mk_encrypt(jax.random.PRNGKey(3), lwe_keys, jnp.asarray(False), PARAMS)
    one = mk.mk_encrypt(jax.random.PRNGKey(4), lwe_keys, jnp.asarray(True), PARAMS)

    mb, ms = vm.volume_match(ck, cb, cs, zero, one, WIDTH)
    got_b = mk.mk_int_decrypt(lwe_keys, mb, WIDTH)
    got_s = mk.mk_int_decrypt(lwe_keys, ms, WIDTH)
    np.testing.assert_array_equal(got_b, [5, 3, 2])
    np.testing.assert_array_equal(got_s, [4, 6])
