"""KMS (2nd-gen) multikey TFHE tests: keygen pipeline + NAND round trips for
both the standard and fast_boot (v2) blind-rotate variants, modelled on the
reference's multikey testcase (3-gen-mk-tfhe/test/runtests.jl:62-102) and the
multikey_new{,_fast}.jl demos."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torus_fhe_tpu.core.params import test_parameters_kms as _params_kms
from torus_fhe_tpu.core.torus import encode_message
from torus_fhe_tpu.mk import kms
from torus_fhe_tpu.mk.samples import mk_decrypt, mk_encrypt, mk_lwe_phase


@pytest.fixture(scope="module")
def kms_setup():
    parties = 2
    params = _params_kms(parties=parties, n=16, N=64)
    key = jax.random.PRNGKey(21)
    ks = jax.random.split(key, parties)
    sks = [kms.kms_party_keygen(ks[p], params) for p in range(parties)]
    ck = kms.kms_cloud_keygen(jax.random.fold_in(key, 99), sks, params)
    return params, sks, ck


@pytest.mark.parametrize("fast_boot", [False, True])
def test_kms_bootstrap_refreshes(kms_setup, fast_boot):
    params, sks, ck = kms_setup
    msgs = jnp.asarray([True, False, False, True])
    lwe_keys = [s.lwe for s in sks]
    c = mk_encrypt(jax.random.PRNGKey(5), lwe_keys, msgs, params)
    mu64 = encode_message(1, 8, jnp.int64)
    out = jax.jit(lambda s: kms.mk_bootstrap(ck, mu64, s, fast_boot))(c)
    dec = np.asarray(mk_decrypt(lwe_keys, out))
    np.testing.assert_array_equal(dec, np.asarray(msgs))
    mu32 = int(encode_message(1, 8))
    phase = np.asarray(mk_lwe_phase(out, lwe_keys)).astype(np.int64)
    expected = np.where(np.asarray(msgs), mu32, -mu32).astype(np.int64)
    err = np.abs((phase - expected).astype(np.int32).astype(np.float64)) / 2**32
    assert err.max() < 1 / 16, err


def test_kms_gate_nand_truth_table(kms_setup):
    params, sks, ck = kms_setup
    lwe_keys = [s.lwe for s in sks]
    xs = jnp.asarray([False, False, True, True])
    ys = jnp.asarray([False, True, False, True])
    cx = mk_encrypt(jax.random.PRNGKey(11), lwe_keys, xs, params)
    cy = mk_encrypt(jax.random.PRNGKey(12), lwe_keys, ys, params)
    out = jax.jit(lambda a, b: kms.mk_gate_nand(ck, a, b))(cx, cy)
    dec = np.asarray(mk_decrypt(lwe_keys, out))
    np.testing.assert_array_equal(dec, ~(np.asarray(xs) & np.asarray(ys)))


@pytest.mark.parametrize("fast_boot", [False, True])
def test_kms_fb_backend_bit_exact(kms_setup, fast_boot):
    """The F-block fast backend for the per-party gsw rotates (streamed
    chunk expansion, wide-digit split) is BIT-IDENTICAL to the conv scan —
    both are exact integer arithmetic of the same product (VERDICT r3 #4)."""
    params, sks, _ = kms_setup
    parties = len(sks)
    key = jax.random.PRNGKey(21)
    ck2 = kms.kms_cloud_keygen(jax.random.fold_in(key, 99), sks, params,
                               forms=("conv", "fb"))
    assert ck2.gsw_sel is not None
    lwe_keys = [s.lwe for s in sks]
    xs = jnp.array([False, True, True])
    ys = jnp.array([True, True, False])
    cx = mk_encrypt(jax.random.PRNGKey(1), lwe_keys, xs, params)
    cy = mk_encrypt(jax.random.PRNGKey(2), lwe_keys, ys, params)
    mu64 = encode_message(1, 8, jnp.int64)  # the KMS torus is 64-bit
    temp = kms.mk_lwe_noiseless_trivial(
        encode_message(1, 8), params.lwe, parties, xs.shape) - cx - cy
    out_fb = kms.mk_bootstrap(ck2, mu64, temp, fast_boot=fast_boot)
    ck_conv = kms.KMSCloudKey(ck2.gsw_kern, ck2.d_kern, ck2.f0_kern,
                              ck2.f1_kern, ck2.pk_kern, ck2.sk_kern,
                              ck2.ks_mats, parties, params)
    out_conv = kms.mk_bootstrap(ck_conv, mu64, temp, fast_boot=fast_boot)
    np.testing.assert_array_equal(np.asarray(out_fb.a), np.asarray(out_conv.a))
    np.testing.assert_array_equal(np.asarray(out_fb.b), np.asarray(out_conv.b))
    dec = np.asarray(mk_decrypt(lwe_keys, out_fb))
    np.testing.assert_array_equal(dec, ~(np.asarray(xs) & np.asarray(ys)))


def test_split_gate_bit_exact(kms_setup):
    """The split-phase dispatch (one program per bootstrap phase — the
    workaround for registry sets whose fused gate crashes the AOT compiler)
    is BIT-IDENTICAL to the fused fast-boot gate on the same F-block key,
    at 4 parties so the shared traced-party-index step program covers
    parties 1..3 through one trace."""
    parties = 4
    params = _params_kms(parties=parties, n=16, N=64)
    key = jax.random.PRNGKey(31)
    ks = jax.random.split(key, parties)
    sks = [kms.kms_party_keygen(ks[p], params) for p in range(parties)]
    ck = kms.kms_cloud_keygen(jax.random.fold_in(key, 99), sks, params,
                              forms=("fb",))
    assert ck.gsw_sel is not None
    lwe_keys = [s.lwe for s in sks]
    xs = jnp.asarray([False, False, True, True])
    ys = jnp.asarray([False, True, False, True])
    cx = mk_encrypt(jax.random.PRNGKey(11), lwe_keys, xs, params)
    cy = mk_encrypt(jax.random.PRNGKey(12), lwe_keys, ys, params)
    out_fused = kms.mk_gate_nand(ck, cx, cy)
    out_split = kms.mk_gate_nand_split(ck, cx, cy)
    np.testing.assert_array_equal(np.asarray(out_fused.a),
                                  np.asarray(out_split.a))
    np.testing.assert_array_equal(np.asarray(out_fused.b),
                                  np.asarray(out_split.b))
    dec = np.asarray(mk_decrypt(lwe_keys, out_split))
    np.testing.assert_array_equal(dec, ~(np.asarray(xs) & np.asarray(ys)))
