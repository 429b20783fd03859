"""Integer-word circuit tests (bootstrap_modules / tutorial flows).

Models the reference's self-checking programs: FullAdder sum/carry goldens
(src/bootstrap_modules.cpp:20-44 + test/ fixtures), two's-complement
difference (:284-339), bubble sort (:341-387), encrypted minimum
(3-gen-mk-tfhe/tutorial.jl:43-63)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torus_fhe_tpu.boot import api
from torus_fhe_tpu.circuits import words
from torus_fhe_tpu.core.params import test_parameters as make_test_params

PARAMS = make_test_params(n=32, N=64)
WIDTH = 8


@pytest.fixture(scope="module")
def keys():
    return api.make_key_pair(jax.random.PRNGKey(321), PARAMS)


def test_int_roundtrip(keys):
    sk, _ = keys
    vals = jnp.array([0, 1, 77, 201, 255])
    ct = words.int_encrypt(jax.random.PRNGKey(1), sk, vals, WIDTH)
    got = words.int_decrypt(sk, ct, WIDTH)
    np.testing.assert_array_equal(got, np.asarray(vals))


def test_adder(keys):
    sk, ck = keys
    a = jnp.array([13, 200, 5])
    b = jnp.array([29, 55, 250])
    ca = words.int_encrypt(jax.random.PRNGKey(2), sk, a, WIDTH)
    cb = words.int_encrypt(jax.random.PRNGKey(3), sk, b, WIDTH)
    cin = api.encrypt(jax.random.PRNGKey(4), sk, jnp.zeros(3, bool))
    total = words.add(ck, ca, cb, cin, WIDTH, with_carry=True)
    got = words.int_decrypt(sk, total, WIDTH + 1)
    np.testing.assert_array_equal(got, np.asarray(a) + np.asarray(b))


def test_subtract_and_less(keys):
    sk, ck = keys
    a = jnp.array([45, 3, 100])
    b = jnp.array([12, 90, 100])
    ca = words.int_encrypt(jax.random.PRNGKey(5), sk, a, WIDTH)
    cb = words.int_encrypt(jax.random.PRNGKey(6), sk, b, WIDTH)
    diff = words.subtract(ck, ca, cb, WIDTH)
    got = words.int_decrypt(sk, diff, WIDTH)
    want = (np.asarray(a) - np.asarray(b)) % (1 << WIDTH)
    np.testing.assert_array_equal(got, want)
    less = words.less_than(ck, ca, cb, WIDTH)
    np.testing.assert_array_equal(np.asarray(api.decrypt(sk, less)),
                                  np.asarray(a) < np.asarray(b))


def test_minimum_and_sort(keys):
    sk, ck = keys
    vals = [23, 7, 99, 41]
    cts = [words.int_encrypt(jax.random.PRNGKey(10 + i), sk, jnp.asarray([v]), WIDTH)
           for i, v in enumerate(vals)]
    mn = words.minimum(ck, cts[0], cts[1], WIDTH)
    assert int(words.int_decrypt(sk, mn, WIDTH)[0]) == min(vals[0], vals[1])

    labels = [words.int_encrypt(jax.random.PRNGKey(20 + i), sk, jnp.asarray([i]), 4)
              for i in range(len(vals))]
    sorted_cts, (sorted_labels,) = words.bubble_sort(ck, cts, WIDTH, [labels])
    got = [int(words.int_decrypt(sk, c, WIDTH)[0]) for c in sorted_cts]
    assert got == sorted(vals)
    got_labels = [int(words.int_decrypt(sk, c, 4)[0]) for c in sorted_labels]
    assert got_labels == list(np.argsort(vals, kind="stable"))
