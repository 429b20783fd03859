"""Multikey KNN E2E (BASELINE configs[4]): the k-party encrypted KNN circuit
over mk/gates3gen word circuits, decisions bit-matching the plaintext oracle,
and the reference's threshold-decryption tail
(src/KNN_medical_data.cpp:531-572) on the multikey decision bit."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torus_fhe_tpu import mk
from torus_fhe_tpu.apps import mk_knn
from torus_fhe_tpu.core.params import test_parameters_3gen
from torus_fhe_tpu.mk import gates3gen as g3
from torus_fhe_tpu.mk.samples import (mk_decrypt, mk_encrypt, mk_int_decrypt,
                                      mk_int_encrypt)

PARTIES = 2


@pytest.fixture(scope="module")
def keys():
    params = test_parameters_3gen(parties=PARTIES, n=16, N=64)
    sks = [mk.mk_party_keygen(jax.random.PRNGKey(100 + p), params)
           for p in range(PARTIES)]
    ck = mk.mk_cloud_keygen(jax.random.PRNGKey(7), sks, params,
                            forms=("fblock",))
    return params, sks, ck


def test_mk_word_helpers(keys):
    """mk_subtract / mk_mux_word / mk_bubble_sort against plaintext."""
    params, sks, ck = keys
    lwe_keys = [sk.lwe for sk in sks]
    width = 4
    a = mk_int_encrypt(jax.random.PRNGKey(0), lwe_keys, 11, width, params)
    b = mk_int_encrypt(jax.random.PRNGKey(1), lwe_keys, 5, width, params)
    d = g3.mk_subtract(ck, a, b, width)
    assert int(mk_int_decrypt(lwe_keys, d, width)) == 6

    sel = g3.mk_gate_constant(ck, jnp.asarray(True))
    m = g3.mk_mux_word(ck, sel, a, b)
    assert int(mk_int_decrypt(lwe_keys, m, width)) % 16 == 11

    vals = [9, 3, 6]
    words = [mk_int_encrypt(jax.random.PRNGKey(10 + i), lwe_keys, v, width,
                            params) for i, v in enumerate(vals)]
    pay = [mk_int_encrypt(jax.random.PRNGKey(20 + i), lwe_keys, i, 2, params)
           for i in range(len(vals))]
    swords, (spay,) = g3.mk_bubble_sort(ck, words, width, [pay])
    got = [int(mk_int_decrypt(lwe_keys, w, width)) % 16 for w in swords]
    assert got == sorted(vals), got
    gotp = [int(mk_int_decrypt(lwe_keys, w, 2)) % 4 for w in spay]
    assert gotp == [1, 2, 0], gotp  # payload follows its key


def test_mk_threshold_tail(keys):
    """Flattened MK decision bit -> ring embed -> (3,5)-threshold decryption
    recovers the bit at every bound of the reference sweep (the smudging
    bounds are all far below the 1/8 margin here)."""
    params, sks, ck = keys
    lwe_keys = [sk.lwe for sk in sks]
    for msg in (True, False):
        ct = mk_encrypt(jax.random.PRNGKey(3 if msg else 4), lwe_keys,
                        jnp.asarray(msg), params)
        res = mk_knn.mk_threshold_tail(ct, lwe_keys, jax.random.PRNGKey(5))
        assert len(res) >= 3
        for row in res:
            assert row["bit"] == int(msg), (msg, res)


def _write_tiny_csv(path, tr_f, tr_l, te_f, te_l):
    rows = np.concatenate([tr_f, te_f])
    labs = np.concatenate([tr_l, te_l])
    with open(path, "w") as f:
        f.write("id," + ",".join(f"c{i}" for i in range(rows.shape[1]))
                + ",label\n")
        for i, (r, l) in enumerate(zip(rows, labs)):
            f.write(",".join(map(str, [i] + list(r) + [l])) + "\n")


def test_mk_knn_pipeline_tiny(keys, tmp_path):
    """Full MK KNN pipeline at tiny sizes, with the test rows batched through
    the circuit as one batch axis: predictions bit-match the circuit oracle,
    and the threshold tail agrees with the MK decryption per row."""
    params, _, _ = keys
    tr_f = np.array([[1, 2], [6, 7], [2, 1]])
    tr_l = np.array([1, 0, 1])
    te_f = np.array([[1, 1], [7, 7]])
    te_l = np.array([1, 0])
    csv = str(tmp_path / "tiny.csv")
    _write_tiny_csv(csv, tr_f, tr_l, te_f, te_l)

    res = mk_knn.run_mk_pipeline(jax.random.PRNGKey(0), params, PARTIES, csv,
                                 k=3, width=4, train_rows=3, test_rows=2,
                                 batch_tests=True)
    assert res["matches_oracle"], res
    assert res["predictions"] == res["oracle"], res
    for pred, tail in zip(res["predictions"], res["threshold_tail"]):
        for row in tail:
            assert row["bit"] == pred, res["threshold_tail"]


def test_single_key_threshold_tail():
    """The single-key KNN tail (run_pipeline(with_threshold_tail=True))
    recovers the decision bit across the bound sweep."""
    from torus_fhe_tpu.apps import knn
    from torus_fhe_tpu.boot import api
    from torus_fhe_tpu.core.params import test_parameters

    p = test_parameters(n=16, N=64)
    sk, ck = api.make_key_pair(jax.random.PRNGKey(0), p)
    ct = api.encrypt(jax.random.PRNGKey(1), sk, jnp.asarray(True))
    res = knn.threshold_tail(ct, sk, jax.random.PRNGKey(2))
    assert all(r["bit"] == 1 for r in res), res
