"""LWE -> RLWE packing keyswitch (boot/pack.py) — the reference's
src/Convert.cpp:103 TODO ("Pack all 32 lwe ciphertexts into one tlwe
ciphertext"), implemented and verified for real."""

import jax
import jax.numpy as jnp
import numpy as np

from torus_fhe_tpu.boot import api, pack
from torus_fhe_tpu.core.params import test_parameters as make_test_params
from torus_fhe_tpu.core.torus import encode_message
from torus_fhe_tpu.rlwe import rlwe_keygen, rlwe_phase

PARAMS = make_test_params(n=16, N=64)


def test_pack_32_bits_into_one_rlwe():
    sk, _ = api.make_key_pair(jax.random.PRNGKey(0), PARAMS)
    rk = rlwe_keygen(jax.random.PRNGKey(1), PARAMS.rlwe)
    pk = pack.packing_keyswitch_keygen(jax.random.PRNGKey(2), 2**-20, sk.key,
                                       rk, PARAMS.rlwe)

    bits = (np.arange(32) * 7 % 3) == 1
    ct = api.encrypt(jax.random.PRNGKey(3), sk, jnp.asarray(bits))  # (32, n)
    packed = pack.pack_lwes(pk, ct, PARAMS.rlwe.polynomial_degree)
    assert packed.a.shape == (PARAMS.rlwe.mask_size + 1,
                              PARAMS.rlwe.polynomial_degree)

    phase = np.asarray(rlwe_phase(packed, rk))
    dec = phase[:32] > 0
    np.testing.assert_array_equal(dec, bits)
    # packed phase stays near +-1/8: packing noise inside the decode margin
    mu = int(encode_message(1, 8))
    err = np.abs((phase[:32].astype(np.int64)
                  - np.where(bits, mu, -mu)).astype(np.int32)) / 2.0**32
    assert err.max() < 1 / 16, err.max()


def test_pack_batched():
    sk, _ = api.make_key_pair(jax.random.PRNGKey(5), PARAMS)
    rk = rlwe_keygen(jax.random.PRNGKey(6), PARAMS.rlwe)
    pk = pack.packing_keyswitch_keygen(jax.random.PRNGKey(7), 2**-20, sk.key,
                                       rk, PARAMS.rlwe)
    B, m = 3, 8
    bits = np.random.default_rng(0).integers(0, 2, (B, m)) == 1
    ct = api.encrypt(jax.random.PRNGKey(8), sk, jnp.asarray(bits))
    packed = pack.pack_lwes(pk, ct, PARAMS.rlwe.polynomial_degree)
    for i in range(B):
        from torus_fhe_tpu.rlwe import RLweSample

        phase = np.asarray(rlwe_phase(RLweSample(packed.a[i]), rk))
        np.testing.assert_array_equal(phase[:m] > 0, bits[i])
