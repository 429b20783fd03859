"""CCS (1st-gen) multikey TFHE tests, modelled on the reference's
"multikey NAND" testcase (3-gen-mk-tfhe/test/runtests.jl:62-102): full
keygen pipeline + NAND truth-table round trips, in-process parties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torus_fhe_tpu.core.params import test_parameters_ccs as _params_ccs
from torus_fhe_tpu.core.torus import encode_message
from torus_fhe_tpu.mk import ccs
from torus_fhe_tpu.mk.samples import mk_decrypt, mk_encrypt, mk_lwe_phase


@pytest.fixture(scope="module", params=[2, 3])
def ccs_setup(request):
    parties = request.param
    params = _params_ccs(parties=parties, n=16, N=64)
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, parties)
    sks = [ccs.ccs_party_keygen(ks[p], params) for p in range(parties)]
    ck = ccs.ccs_cloud_keygen(jax.random.fold_in(key, 99), sks, params)
    return params, sks, ck


def test_ccs_encrypt_decrypt_roundtrip(ccs_setup):
    params, sks, ck = ccs_setup
    msgs = jnp.asarray([True, False, True, True, False])
    c = mk_encrypt(jax.random.PRNGKey(3), [s.lwe for s in sks], msgs, params)
    dec = mk_decrypt([s.lwe for s in sks], c)
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(msgs))


def test_ccs_bootstrap_refreshes(ccs_setup):
    """Bootstrap output decrypts to the sign of the input phase and its noise
    stays within the 1/4 failure bound (runtests.jl:93-101 analogue)."""
    params, sks, ck = ccs_setup
    msgs = jnp.asarray([True, False, False, True])
    lwe_keys = [s.lwe for s in sks]
    c = mk_encrypt(jax.random.PRNGKey(5), lwe_keys, msgs, params)
    mu = encode_message(1, 8)
    out = jax.jit(lambda s: ccs.mk_bootstrap(ck, mu, s))(c)
    dec = np.asarray(mk_decrypt(lwe_keys, out))
    np.testing.assert_array_equal(dec, np.asarray(msgs))
    # |phase - mu_expected| < 1/16 (far inside the 1/4 bound)
    phase = np.asarray(mk_lwe_phase(out, lwe_keys)).astype(np.int64)
    expected = np.where(np.asarray(msgs), mu, -mu).astype(np.int64)
    err = np.abs((phase - expected).astype(np.int32).astype(np.float64)) / 2**32
    assert err.max() < 1 / 16, err


def test_ccs_gate_nand_truth_table(ccs_setup):
    params, sks, ck = ccs_setup
    lwe_keys = [s.lwe for s in sks]
    xs = jnp.asarray([False, False, True, True])
    ys = jnp.asarray([False, True, False, True])
    cx = mk_encrypt(jax.random.PRNGKey(11), lwe_keys, xs, params)
    cy = mk_encrypt(jax.random.PRNGKey(12), lwe_keys, ys, params)
    out = jax.jit(lambda a, b: ccs.mk_gate_nand(ck, a, b))(cx, cy)
    dec = np.asarray(mk_decrypt(lwe_keys, out))
    np.testing.assert_array_equal(dec, ~(np.asarray(xs) & np.asarray(ys)))
