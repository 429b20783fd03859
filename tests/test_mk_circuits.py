"""MK integer multiplier and conv2d against plaintext oracles.

The reference ships mk_int_mul_3gen with a loop-counter defect (its final
accumulation reuses ``ctr`` == width-2, 3gen_mk_gates.jl:336-353); our
multiplier fixes that (documented in mk/gates3gen.py) and these tests pin the
corrected semantics: decrypt(mul(a,b)) == a*b mod 2^width, and conv2d equals
the integer convolution (enc_conv2d, 3gen_mk_gates.jl:364-397).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torus_fhe_tpu import mk
from torus_fhe_tpu.core.params import test_parameters_3gen as params_3gen
from torus_fhe_tpu.mk import gates3gen
from torus_fhe_tpu.mk.samples import MKLweSample

PARAMS = params_3gen(parties=2, n=12, N=64)
WIDTH = 4


@pytest.fixture(scope="module")
def keys():
    sks = [mk.mk_party_keygen(jax.random.PRNGKey(40 + p), PARAMS)
           for p in range(2)]
    ck = mk.mk_cloud_keygen(jax.random.PRNGKey(41), sks, PARAMS)
    return sks, ck


def _enc_int(lwe_keys, value, width, seed):
    return mk.mk_int_encrypt(jax.random.PRNGKey(seed), lwe_keys, value, width,
                             PARAMS)


def _zero_bit(lwe_keys, seed):
    ct = mk.mk_encrypt(jax.random.PRNGKey(seed), lwe_keys,
                       jnp.asarray([False]), PARAMS)
    return MKLweSample(ct.a[0], ct.b[0])


def test_mk_int_mul_matches_plain(keys):
    sks, ck = keys
    lwe_keys = [sk.lwe for sk in sks]
    zero = _zero_bit(lwe_keys, 99)
    cases = [(3, 5), (7, 7), (6, 3), (2, 15)]
    for s, (a, b) in enumerate(cases):
        ca = _enc_int(lwe_keys, a, WIDTH, 100 + s)
        cb = _enc_int(lwe_keys, b, WIDTH, 200 + s)
        prod = gates3gen.mk_int_mul(ck, ca, cb, zero, WIDTH)
        got = int(mk.mk_int_decrypt(lwe_keys, prod, WIDTH))
        want = (a * b) % (1 << WIDTH)
        # two's-complement decode: map to unsigned for the comparison
        assert got % (1 << WIDTH) == want, (a, b, got)


def test_mk_conv2d_matches_plain(keys):
    sks, ck = keys
    lwe_keys = [sk.lwe for sk in sks]
    zero = _zero_bit(lwe_keys, 98)

    rng = np.random.default_rng(5)
    H = W = 3
    KH = KW = 2
    C = 1
    img = rng.integers(0, 3, (H, W))
    ker = rng.integers(0, 3, (C, KH, KW))

    def enc_grid(vals, seed0):
        rows = []
        for idx, v in enumerate(vals.reshape(-1)):
            rows.append(_enc_int(lwe_keys, int(v), WIDTH, seed0 + idx))
        a = jnp.stack([r.a for r in rows]).reshape(vals.shape + rows[0].a.shape)
        b = jnp.stack([r.b for r in rows]).reshape(vals.shape + rows[0].b.shape)
        return MKLweSample(a, b)

    cimg = enc_grid(img, 300)
    cker = enc_grid(ker, 400)
    out = gates3gen.mk_conv2d(ck, cimg, cker, zero, stride=1, width=WIDTH)

    OH = OW = 2
    assert out.a.shape[:4] == (C, OH, OW, WIDTH)
    for c in range(C):
        for i in range(OH):
            for j in range(OW):
                word = MKLweSample(out.a[c, i, j], out.b[c, i, j])
                got = int(mk.mk_int_decrypt(lwe_keys, word, WIDTH))
                want = int((img[i:i + KH, j:j + KW] * ker[c]).sum()) % (1 << WIDTH)
                assert got % (1 << WIDTH) == want, (c, i, j, got, want)
