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


def test_wrong_decryption_classifier():
    ph = [0.3, -0.05, 0.1]
    classes, n_gt, n_lt = noise._classify_wrong(ph, [0, 1])
    assert classes == ["phase_gt_quarter", "phase_lt_zero"]
    assert (n_gt, n_lt) == (1, 1)
