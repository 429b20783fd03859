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
