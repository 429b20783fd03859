"""Multi-device execution on a virtual 8-CPU mesh (conftest forces
--xla_force_host_platform_device_count=8): batch-sharded gates and the
party-axis shard_map/psum paths must equal their single-device counterparts
bit for bit.

Mirrors the reference's in-process multi-party test model
(3-gen-mk-tfhe/test/runtests.jl:62-102 — parties are array indices, no
cluster) and its cross-party reductions (mk_internals.jl:712-744,
threshold_decryption_functions.cpp:399-441).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torus_fhe_tpu.boot import api, gates
from torus_fhe_tpu.core.params import test_parameters as make_test_params
from torus_fhe_tpu.core.params import test_parameters_3gen as make_test_params_3gen
from torus_fhe_tpu.core.params import thfhe_parameters_1024
from torus_fhe_tpu.parallel import mesh as pmesh
from torus_fhe_tpu.parallel import sharded


@pytest.fixture(scope="module")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs


def test_batch_sharded_gate_matches_single(eight_devices):
    """Gate batch split over 8 devices == single-device result, bit-exact."""
    params = make_test_params(n=12, N=64)
    sk, ck = api.make_key_pair(jax.random.PRNGKey(0), params)
    B = 16
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.integers(0, 2, B) == 1)
    ys = jnp.asarray(rng.integers(0, 2, B) == 1)
    cx = api.encrypt(jax.random.PRNGKey(1), sk, xs)
    cy = api.encrypt(jax.random.PRNGKey(2), sk, ys)

    ref = gates.gate_and(ck, cx, cy)

    mesh = pmesh.make_mesh(n_batch=8)
    ck_r = pmesh.replicate_cloud_key(ck, mesh)
    cx_s = pmesh.shard_lwe_batch(cx, mesh)
    cy_s = pmesh.shard_lwe_batch(cy, mesh)
    out = jax.jit(gates.gate_and)(ck_r, cx_s, cy_s)

    from torus_fhe_tpu.lwe import LweSample
    out_host = LweSample(jnp.asarray(jax.device_get(out.a)),
                         jnp.asarray(jax.device_get(out.b)))
    np.testing.assert_array_equal(np.asarray(out_host.a),
                                  np.asarray(jax.device_get(ref.a)))
    np.testing.assert_array_equal(np.asarray(out_host.b),
                                  np.asarray(jax.device_get(ref.b)))
    np.testing.assert_array_equal(np.asarray(api.decrypt(sk, out_host)),
                                  np.asarray(xs) & np.asarray(ys))


def test_mk_keyswitch_party_sharded(eight_devices):
    """Party-sharded MK keyswitch (psum of b-parts) == single-device path."""
    from torus_fhe_tpu.mk import boot3gen, keys3gen

    parties = 3
    params = make_test_params_3gen(parties=parties, n=12, N=64)
    keys = [keys3gen.mk_party_keygen(jax.random.fold_in(jax.random.PRNGKey(3), p), params)
            for p in range(parties)]
    ck = keys3gen.mk_cloud_keygen(jax.random.PRNGKey(4), keys, params)

    # an extracted LWE sample over the RLWE key of degree N (batch of 2)
    rng = np.random.default_rng(1)
    from torus_fhe_tpu.lwe import LweSample
    u = LweSample(jnp.asarray(rng.integers(-2**31, 2**31, (2, 64)), jnp.int32),
                  jnp.asarray(rng.integers(-2**31, 2**31, (2,)), jnp.int32))

    ref = boot3gen.mk_keyswitch(ck, u)

    mesh = pmesh.make_mesh(n_batch=1, n_party=8)
    tables = sharded.mk_ks_tables_sharded(ck, mesh)
    out = sharded.mk_keyswitch_sharded(ck, tables, u, mesh)

    a = np.asarray(jax.device_get(out.a))[..., :parties, :]
    np.testing.assert_array_equal(a, np.asarray(jax.device_get(ref.a)))
    np.testing.assert_array_equal(np.asarray(jax.device_get(out.b)),
                                  np.asarray(jax.device_get(ref.b)))


def test_threshold_decrypt_party_sharded(eight_devices):
    """Party-sharded partial-decrypt + psum combine == the sequential
    partial_decrypt/final_decrypt pair at sd=0 (bit-exact)."""
    from torus_fhe_tpu import rlwe as rl
    from torus_fhe_tpu.threshold import decrypt as tdec
    from torus_fhe_tpu.threshold import shares as tsh

    params = thfhe_parameters_1024()
    key = jax.random.PRNGKey(5)
    from torus_fhe_tpu.rlwe import rlwe_encrypt, rlwe_keygen
    rk = rlwe_keygen(jax.random.fold_in(key, 0), params.rlwe)
    repo = tsh.share_secret(np.asarray(rk.key), 3, 5, jax.random.fold_in(key, 1))

    msg = tdec.encode_bits(0xDEADBEEF, params.rlwe_polynomial_degree)
    sample = rlwe_encrypt(jax.random.fold_in(key, 2), msg, 1e-3, rk, params.rlwe)

    subset = [1, 2, 4]
    sh = repo.subset_shares(subset)
    partials = tdec.partial_decrypt(sample, sh, 0.0, jax.random.fold_in(key, 3))
    ref = tdec.final_decrypt(sample, partials)

    t = sh.shape[0]
    signs = np.ones(t, np.int32)
    signs[0] = -1
    mesh = pmesh.make_mesh(n_batch=1, n_party=8)
    got = sharded.threshold_decrypt_sharded(sample.a, sh, signs, 0.0,
                                            jax.random.fold_in(key, 3), mesh)
    np.testing.assert_array_equal(np.asarray(jax.device_get(got)),
                                  np.asarray(jax.device_get(ref)))
    assert tdec.decode_bits(got) == 0xDEADBEEF
