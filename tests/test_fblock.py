"""F-block blind rotation (ops/fblock.py, ops/pallas_rotate.py): bit-exactness
against the conv-kernel scan path and the schoolbook oracle.

Mirrors the reference's `_wo_FFT` exact-twin test pattern
(3-gen-mk-tfhe/src/tgsw.jl:152-156): every fast kernel form must reproduce the
exact-arithmetic result bit for bit (drop_limbs=0), and end-to-end gates must
decrypt correctly with the shipped drop_limbs=1 compression.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torus_fhe_tpu.boot import api, bootstrap, gates
from torus_fhe_tpu.core.params import SchemeParams, test_parameters as make_test_params
from torus_fhe_tpu.core.torus import decode_message
from torus_fhe_tpu.ops import fblock
from torus_fhe_tpu.rlwe import rlwe_noiseless_trivial


def _exact_params(n=12, N=64):
    return make_test_params(n=n, N=N)


def _keys_and_inputs(params, B=4, seed=0):
    key = jax.random.PRNGKey(seed)
    sk, ck = api.make_key_pair(key, params, forms=("conv", "fblock"))
    rng = np.random.default_rng(seed + 1)
    N = params.rlwe_polynomial_degree
    acc = rlwe_noiseless_trivial(
        jnp.asarray(rng.integers(-2**31, 2**31, (B, N), dtype=np.int64),
                    jnp.int32),
        params.rlwe, (B,))
    bara = jnp.asarray(rng.integers(0, 2 * N, (B, params.lwe_size),
                                    dtype=np.int64), jnp.int32)
    return sk, ck, acc, bara


@pytest.mark.parametrize("N", [64, 256])
def test_fblock_matches_scan(N):
    params = _exact_params(N=N)
    sk, ck, acc, bara = _keys_and_inputs(params)
    geom = bootstrap._bk_geometry(params)
    tg = params.tgsw

    ref = bootstrap.blind_rotate(acc, bootstrap.BootstrapKey(ck.bootstrap_key.kernels),
                                 bara, params).a
    got = fblock.blind_rotate_fblock(acc.a, ck.bootstrap_key.fb, bara, geom,
                                     tg.decomp_length, tg.log2_base, tg.offset)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("N,B", [(64, 4), (256, 3)])
def test_pallas_matches_fblock(N, B):
    from torus_fhe_tpu.ops.pallas_rotate import blind_rotate_pallas

    params = _exact_params(N=N)
    sk, ck, acc, bara = _keys_and_inputs(params, B=B)
    geom = bootstrap._bk_geometry(params)
    tg = params.tgsw

    ref = fblock.blind_rotate_fblock(acc.a, ck.bootstrap_key.fb, bara, geom,
                                     tg.decomp_length, tg.log2_base, tg.offset)
    got = blind_rotate_pallas(acc.a, ck.bootstrap_key.fb, bara, geom,
                              tg.decomp_length, tg.log2_base, tg.offset,
                              b_tile=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("backend", ["fblock", "pallas"])
def test_gate_and_truth_table(backend):
    params = _exact_params()
    key = jax.random.PRNGKey(3)
    sk, ck = api.make_key_pair(key, params, forms=("fblock",))
    xs = jnp.asarray([False, False, True, True])
    ys = jnp.asarray([False, True, False, True])
    cx = api.encrypt(jax.random.PRNGKey(4), sk, xs)
    cy = api.encrypt(jax.random.PRNGKey(5), sk, ys)
    bootstrap.set_rotate_backend(backend)
    try:
        out = gates.gate_and(ck, cx, cy)
    finally:
        bootstrap.set_rotate_backend("auto")
    dec = np.asarray(api.decrypt(sk, out))
    np.testing.assert_array_equal(dec, np.asarray(xs) & np.asarray(ys))


def test_fblock_drop_limbs_gate():
    """drop_limbs=1 compressed F-block key still decrypts gates correctly."""
    base = make_test_params(n=12, N=64)
    params = SchemeParams(**{**base.__dict__, "bk_drop_limbs": 1})
    sk, ck = api.make_key_pair(jax.random.PRNGKey(6), params, forms=("fblock",))
    xs = jnp.asarray([False, True, True, False])
    ys = jnp.asarray([True, True, False, False])
    cx = api.encrypt(jax.random.PRNGKey(7), sk, xs)
    cy = api.encrypt(jax.random.PRNGKey(8), sk, ys)
    bootstrap.set_rotate_backend("fblock")
    try:
        out = gates.gate_xor(ck, cx, cy)
    finally:
        bootstrap.set_rotate_backend("auto")
    dec = np.asarray(api.decrypt(sk, out))
    np.testing.assert_array_equal(dec, np.asarray(xs) ^ np.asarray(ys))


def test_rounded_body_bk_all_backends():
    """Rounded-body BK (body rounded to 2^8 at keygen, the SOUND r5
    compression — the r4 quantized-mask variant is withdrawn, see
    tests/test_quantized_mask_attack.py) with the l=2 Bg=2^8 gadget and a
    rank-2 module (k=2): the F-block body drop is lossless on the rounded
    key, so fblock == scan bit-exactly and every backend decrypts the gate
    correctly — the tiny-shape twin of tfhe_parameters_128_tpu_fast."""
    base = make_test_params(n=12, N=64)
    params = SchemeParams(**{**base.__dict__, "bs_decomp_length": 2,
                             "bs_log2_base": 8, "rlwe_mask_size": 2,
                             "bk_drop_limbs": 1})
    sk, ck = api.make_key_pair(jax.random.PRNGKey(11), params,
                               forms=("conv", "fblock"))
    geom = bootstrap._bk_geometry(params)
    assert len(geom.cols) == 11  # 2 masks x 4 limbs + body 3 limbs
    tg = params.tgsw

    rng = np.random.default_rng(12)
    N = params.rlwe_polynomial_degree
    acc = rlwe_noiseless_trivial(
        jnp.asarray(rng.integers(-2**31, 2**31, (3, N), dtype=np.int64),
                    jnp.int32), params.rlwe, (3,))
    bara = jnp.asarray(rng.integers(0, 2 * N, (3, params.lwe_size),
                                    dtype=np.int64), jnp.int32)
    ref = bootstrap.blind_rotate(
        acc, bootstrap.BootstrapKey(ck.bootstrap_key.kernels), bara, params).a
    got = fblock.blind_rotate_fblock(acc.a, ck.bootstrap_key.fb, bara, geom,
                                     tg.decomp_length, tg.log2_base, tg.offset)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    xs = jnp.asarray([False, True, True, False])
    ys = jnp.asarray([True, True, False, False])
    cx = api.encrypt(jax.random.PRNGKey(13), sk, xs)
    cy = api.encrypt(jax.random.PRNGKey(14), sk, ys)
    for backend in ("scan", "fblock", "pallas"):
        bootstrap.set_rotate_backend(backend)
        try:
            out = gates.gate_and(ck, cx, cy)
        finally:
            bootstrap.set_rotate_backend("auto")
        dec = np.asarray(api.decrypt(sk, out))
        np.testing.assert_array_equal(dec, np.asarray(xs) & np.asarray(ys),
                                      err_msg=backend)
