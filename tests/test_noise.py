"""Noise-measurement harness sanity (measurements/ parity): the harness runs
and reports zero wrong decryptions on the test parameter sets."""

import jax

from torus_fhe_tpu.core.params import test_parameters as make_test_params
from torus_fhe_tpu.core.params import test_parameters_3gen as params_3gen
from torus_fhe_tpu.utils import noise


def test_single_key_noise_report():
    rep = noise.measure_single_key(jax.random.PRNGKey(0),
                                   make_test_params(n=16, N=64), trials=64)
    assert rep.wrong_decryptions == 0, rep.to_json()
    assert rep.boot_noise_max < 0.125, rep.to_json()
    assert rep.bk_bytes > 0 and rep.ks_bytes > 0


def test_multikey_noise_report():
    rep = noise.measure_multikey(jax.random.PRNGKey(1),
                                 params_3gen(parties=2, n=16, N=64),
                                 parties=2, trials=32)
    assert rep.wrong_decryptions == 0, rep.to_json()
    assert rep.boot_noise_max < 0.125, rep.to_json()


def test_multikey_noise_report_ccs_kms():
    """The CCS/KMS branches of the harness run and classify cleanly (the
    reference's per-scheme suites, measurements/test_suites/{CCS,KMS})."""
    from torus_fhe_tpu.core.params import (test_parameters_ccs,
                                           test_parameters_kms)

    rep = noise.measure_multikey(jax.random.PRNGKey(2),
                                 test_parameters_ccs(parties=2, n=16, N=64),
                                 parties=2, trials=16, scheme="ccs")
    assert rep.wrong_decryptions == 0, rep.to_json()
    rep = noise.measure_multikey(jax.random.PRNGKey(3),
                                 test_parameters_kms(parties=2, n=16, N=64),
                                 parties=2, trials=16, scheme="kms")
    assert rep.wrong_decryptions == 0, rep.to_json()


def test_rounded_phase_classifier():
    """Reference semantics (measurements_us_simplified_3.jl:126-160): the
    (0, 1/4)-band classes count over ALL trials of the rounded phase, not
    just the wrong-decryption subset."""
    import numpy as np

    ph = np.array([0.3, -0.05, 0.1, 0.26])
    n_gt, n_lt, classes = noise._rounded_phase_classes(ph, [1, 2])
    assert (n_gt, n_lt) == (2, 1)
    assert classes == ["rounded_phase_lt_zero", "boot_noise"]


def test_round_mod_switch_roundtrip():
    """Rounding to the 2N space then re-encoding keeps phases on the 2N grid
    and within 1/(4N) of the original."""
    import jax.numpy as jnp
    import numpy as np

    N = 64
    a = jnp.asarray(np.random.default_rng(0).integers(-2**31, 2**31,
                                                      (8,), np.int64),
                    jnp.int32)
    ra, _ = noise._round_mod_switch(a, a, N)
    step = 1 << (32 - 7)  # 2^32 / (2N)
    assert np.all(np.asarray(ra) % step == 0)
    diff = (np.asarray(ra, np.int64) - np.asarray(a, np.int64))
    diff = (diff + 2**31) % 2**32 - 2**31
    assert np.abs(diff).max() <= step // 2
