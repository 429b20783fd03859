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
