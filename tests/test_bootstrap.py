"""End-to-end single-key tests: encrypt -> gate -> decrypt truth tables.

Model: the reference's Jute suite (3-gen-mk-tfhe/test/runtests.jl:10-59) — all
gates against plaintext truth tables under fixed seeds, on tiny insecure
parameters so CPU runs stay fast.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torus_fhe_tpu.boot import api, gates
from torus_fhe_tpu.core.params import test_parameters as make_test_params
from torus_fhe_tpu.lwe import lwe_phase


PARAMS = make_test_params(n=32, N=64)

PLAIN_OPS = {
    "nand": lambda a, b: ~(a & b), "or": lambda a, b: a | b,
    "and": lambda a, b: a & b, "xor": lambda a, b: a ^ b,
    "xnor": lambda a, b: ~(a ^ b), "nor": lambda a, b: ~(a | b),
    "andny": lambda a, b: ~a & b, "andyn": lambda a, b: a & ~b,
    "orny": lambda a, b: ~a | b, "oryn": lambda a, b: a | ~b,
}


@pytest.fixture(scope="module")
def keys():
    key = jax.random.PRNGKey(123)
    return api.make_key_pair(key, PARAMS)


def test_encrypt_decrypt_roundtrip(keys):
    sk, _ = keys
    msgs = jnp.array([True, False, True, True, False, False, True, False])
    ct = api.encrypt(jax.random.PRNGKey(7), sk, msgs)
    dec = api.decrypt(sk, ct)
    assert np.array_equal(np.asarray(dec), np.asarray(msgs))


def test_all_binary_gates_truth_tables(keys):
    sk, ck = keys
    # batch covers the full truth table
    xs = jnp.array([False, False, True, True])
    ys = jnp.array([False, True, False, True])
    cx = api.encrypt(jax.random.PRNGKey(1), sk, xs)
    cy = api.encrypt(jax.random.PRNGKey(2), sk, ys)
    xb = np.asarray(xs)
    yb = np.asarray(ys)
    for name, gate in gates.BINARY_GATES.items():
        out = gate(ck, cx, cy)
        dec = np.asarray(api.decrypt(sk, out))
        want = PLAIN_OPS[name](xb, yb)
        assert np.array_equal(dec, want), name


def test_not_and_constant(keys):
    sk, ck = keys
    xs = jnp.array([True, False])
    cx = api.encrypt(jax.random.PRNGKey(3), sk, xs)
    assert np.array_equal(np.asarray(api.decrypt(sk, gates.gate_not(ck, cx))),
                          ~np.asarray(xs))
    const = gates.gate_constant(ck, jnp.array([True, False, True]))
    assert np.array_equal(np.asarray(api.decrypt(sk, const)),
                          np.array([True, False, True]))


def test_mux_truth_table(keys):
    sk, ck = keys
    xs = jnp.array([False, False, False, False, True, True, True, True])
    ys = jnp.array([False, False, True, True, False, False, True, True])
    zs = jnp.array([False, True, False, True, False, True, False, True])
    cx = api.encrypt(jax.random.PRNGKey(4), sk, xs)
    cy = api.encrypt(jax.random.PRNGKey(5), sk, ys)
    cz = api.encrypt(jax.random.PRNGKey(6), sk, zs)
    out = gates.gate_mux(ck, cx, cy, cz)
    dec = np.asarray(api.decrypt(sk, out))
    want = np.where(np.asarray(xs), np.asarray(ys), np.asarray(zs))
    assert np.array_equal(dec, want)


def test_gate_chain(keys):
    """Bootstrapped outputs must be valid inputs to further gates."""
    sk, ck = keys
    xs = jnp.array([False, True, False, True])
    ys = jnp.array([False, False, True, True])
    cx = api.encrypt(jax.random.PRNGKey(8), sk, xs)
    cy = api.encrypt(jax.random.PRNGKey(9), sk, ys)
    s1 = gates.gate_xor(ck, cx, cy)
    s2 = gates.gate_and(ck, s1, cx)  # (x ^ y) & x == x & ~y
    dec = np.asarray(api.decrypt(sk, s2))
    want = np.asarray(xs) & ~np.asarray(ys)
    assert np.array_equal(dec, want)


def test_gates_with_bk_compression():
    """bk_drop_limbs=1 (BK byte truncation) must still decrypt correctly —
    the added noise sits far below the decomposition floor."""
    import dataclasses

    params = dataclasses.replace(PARAMS, bk_drop_limbs=1)
    sk, ck = api.make_key_pair(jax.random.PRNGKey(77), params)
    xs = jnp.array([False, False, True, True])
    ys = jnp.array([False, True, False, True])
    cx = api.encrypt(jax.random.PRNGKey(1), sk, xs)
    cy = api.encrypt(jax.random.PRNGKey(2), sk, ys)
    out = gates.gate_and(ck, cx, cy)
    assert np.array_equal(np.asarray(api.decrypt(sk, out)),
                          np.asarray(xs) & np.asarray(ys))
    out = gates.gate_xor(ck, cx, cy)
    assert np.array_equal(np.asarray(api.decrypt(sk, out)),
                          np.asarray(xs) ^ np.asarray(ys))
