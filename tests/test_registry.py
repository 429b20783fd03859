"""Parameter registry completeness + large-party smoke.

The reference ships ~30 named sets spanning 2-512 parties across three MK
schemes plus 9-sigma `_for_fft` variants (mk_api.jl:4-322); the registry must
expose them all, and the 3gen pipeline must actually run at 32 parties
(tiny-ring smoke — party count is the scaling axis, the ring is shrunk to
keep CPU time bounded).
"""

import jax
import jax.numpy as jnp
import numpy as np

from torus_fhe_tpu import mk
from torus_fhe_tpu.core import params as P


def test_registry_spans_512_parties_3gen():
    for parties in (2, 3, 4, 8, 16, 32, 64, 128, 256, 512):
        p = P.PARAMETER_REGISTRY[f"mk_{parties}party_3gen"]()
        assert p.max_parties == parties
        assert p.rlwe_polynomial_degree in (1024, 2048, 4096)
        # gadget must cover a sane slice of the 64-bit torus
        assert p.gsw_decomp_length * p.gsw_log2_base >= 14


def test_registry_for_fft_variants():
    for parties in (32, 64):
        base = P.PARAMETER_REGISTRY[f"mk_{parties}party_3gen"]()
        fft = P.PARAMETER_REGISTRY[f"mk_{parties}party_3gen_for_fft"]()
        # 9-sigma variants trade a larger n for more noise headroom
        assert fft.lwe_size > base.lwe_size
        assert fft.lwe_noise_stddev < base.lwe_noise_stddev


def test_registry_schemes_complete():
    for parties in (2, 4, 8, 16):
        for scheme in ("3gen", "ccs", "kms"):
            assert f"mk_{parties}party_{scheme}" in P.PARAMETER_REGISTRY
    assert "mk_32party_kms" in P.PARAMETER_REGISTRY


def test_32party_keygen_and_gate_smoke():
    """Full 32-party AKÖ pipeline on a tiny ring: keygen -> NAND -> decrypt."""
    parties = 32
    params = P.test_parameters_3gen(parties=parties, n=4, N=64)
    sks = [mk.mk_party_keygen(jax.random.fold_in(jax.random.PRNGKey(7), p), params)
           for p in range(parties)]
    ck = mk.mk_cloud_keygen(jax.random.PRNGKey(8), sks, params)
    assert ck.parties == parties
    assert ck.bk_kernels.shape[0] == parties * params.lwe_size

    lwe_keys = [sk.lwe for sk in sks]
    xs = jnp.asarray([False, True])
    ys = jnp.asarray([True, True])
    cx = mk.mk_encrypt(jax.random.PRNGKey(9), lwe_keys, xs, params)
    cy = mk.mk_encrypt(jax.random.PRNGKey(10), lwe_keys, ys, params)
    from torus_fhe_tpu.mk import gates3gen
    out = gates3gen.mk_gate_nand(ck, cx, cy)
    dec = np.asarray(mk.mk_decrypt(lwe_keys, out))
    np.testing.assert_array_equal(dec, ~(np.asarray(xs) & np.asarray(ys)))
