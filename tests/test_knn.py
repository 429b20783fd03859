"""Encrypted KNN pipeline test (KNN_medical_data flow, scaled down).

Models src/KNN_medical_data.cpp:818-851 end-to-end on synthetic rows: encrypt
train + test features, batched Manhattan distances, sort-by-distance, majority
vote, decrypt the decision bit, and finally convert + threshold-decrypt the
decision like ciphertext_conversion_threshold_decryption (:531-572)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torus_fhe_tpu import threshold
from torus_fhe_tpu.apps import knn
from torus_fhe_tpu.boot import api
from torus_fhe_tpu.core.params import test_parameters as make_test_params
from torus_fhe_tpu.threshold import shares as sh

PARAMS = make_test_params(n=16, N=64)
WIDTH = 8  # distances reach 60; comparisons need values < 2^(WIDTH-1)
K = 3

FEATS = np.array([[3, 7, 2], [4, 6, 3], [20, 25, 30], [22, 24, 29]])
LABELS = np.array([1, 1, 0, 0])
TEST_ROW = np.array([5, 7, 3])  # near the label-1 cluster


@pytest.fixture(scope="module")
def keys():
    return api.make_key_pair(jax.random.PRNGKey(99), PARAMS)


def test_knn_end_to_end(keys):
    sk, ck = keys
    feats, labs = knn.encrypt_dataset(jax.random.PRNGKey(1), sk, FEATS, LABELS, WIDTH)
    from torus_fhe_tpu.circuits import words

    test_word = words.int_encrypt(jax.random.PRNGKey(2), sk,
                                  jnp.asarray(TEST_ROW), WIDTH)
    decision = knn.knn_predict(ck, feats, labs, test_word, K, WIDTH)
    got = bool(np.asarray(api.decrypt(sk, decision)))
    assert got is True  # majority of the 3 nearest rows carries label 1

    # decision bit -> ring ciphertext -> (2,3)-threshold decryption
    ring = threshold.tlwe_from_lwe(decision)
    rkey = threshold.tlwe_key_from_lwe_key(sk.key)
    repo = sh.share_secret_streaming(np.asarray(rkey.key), 2, 3, jax.random.PRNGKey(3))
    plain = threshold.threshold_decrypt(ring, repo, [1, 3], 1e-4, jax.random.PRNGKey(4))
    assert (np.asarray(plain)[0] > 0) == got


def test_abs_difference(keys):
    sk, ck = keys
    from torus_fhe_tpu.circuits import words

    a = words.int_encrypt(jax.random.PRNGKey(5), sk, jnp.asarray([9, 2]), WIDTH)
    b = words.int_encrypt(jax.random.PRNGKey(6), sk, jnp.asarray([4, 11]), WIDTH)
    d = knn.abs_difference(ck, a, b, WIDTH)
    np.testing.assert_array_equal(words.int_decrypt(sk, d, WIDTH), [5, 9])


def test_csv_pipeline(keys, tmp_path):
    """CSV ingest + accuracy tally (inputDataSet + the accuracy loop,
    src/KNN_medical_data.cpp:576-776) on a synthetic cardio-schema file."""
    sk, ck = keys
    csv = tmp_path / "data.csv"
    header = ("id,age_days,age_year,gender,height,weight,ap_hi,ap_lo,"
              "cholesterol,gluc,smoke,alco,active,cardio")
    # two separable clusters in the (ap_hi, ap_lo) columns
    rows = [
        [0, 0, 0, 1, 0, 0, 30, 20, 1, 1, 0, 0, 1, 0],
        [1, 0, 0, 2, 0, 0, 28, 22, 1, 1, 0, 0, 1, 0],
        [3, 0, 0, 1, 0, 0, 2, 3, 3, 2, 1, 0, 0, 1],
        [5, 0, 0, 1, 0, 0, 4, 3, 3, 2, 1, 1, 0, 1],  # test row: low-BP class
    ]
    csv.write_text(header + "\n" +
                   "\n".join(",".join(map(str, r)) for r in rows) + "\n")
    report = knn.run_pipeline(jax.random.PRNGKey(5), sk, ck, str(csv), k=1,
                              width=7, train_rows=3, test_rows=1,
                              feature_cols=[6, 7])
    assert report["total"] == 1
    assert report["predictions"][0] == 1
    assert report["correct"] == 1


CARDIO_CSV = "/root/reference/test/bootstrap_modules/data1.csv"


def _plain_knn_oracle(tr_f, tr_l, te_f, k):
    """Plaintext KNN with the pipeline's exact semantics: Manhattan distance,
    stable sort by distance, majority > k/2 of the k nearest labels."""
    preds = []
    for row in te_f:
        d = np.abs(tr_f - row).sum(axis=1)
        order = np.argsort(d, kind="stable")
        votes = tr_l[order[:k]].sum()
        preds.append(int(votes > k // 2))
    return preds


@pytest.mark.slow
def test_knn_on_reference_cardio_fixtures(keys):
    """The reference's own cardio data (test/bootstrap_modules/data1.csv, the
    dataset KNN_medical_data.cpp:582-647 is built around): encrypted pipeline
    prediction must equal the plaintext-KNN oracle row for row."""
    import os

    if not os.path.exists(CARDIO_CSV):
        pytest.skip("reference fixtures not present")
    sk, ck = keys
    width, shift, k, n_train, n_test = 16, 4, 3, 5, 2
    tr_f, tr_l, te_f, te_l = knn.load_cardio_csv(CARDIO_CSV, n_train, n_test)
    tr_s, te_s = tr_f >> shift, te_f >> shift
    # distances must be distinct so the encrypted sort's tie-order is moot
    for row in te_s:
        d = np.abs(tr_s - row).sum(axis=1)
        assert len(set(d.tolist())) == len(d), "pick different rows"
        assert d.max() < 2 ** (width - 1)

    res = knn.run_pipeline(jax.random.PRNGKey(3), sk, ck, CARDIO_CSV, k=k,
                           width=width, train_rows=n_train, test_rows=n_test,
                           scale_shift=shift, jit_predict=True)
    oracle = _plain_knn_oracle(tr_s, tr_l, te_s, k)
    assert res["predictions"] == oracle, (res, oracle)
