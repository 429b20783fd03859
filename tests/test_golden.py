"""Golden-scenario parity against the reference's own committed fixtures.

The reference commits plaintexts (test/plain22.txt = 13452, plain23.txt =
223416) and golden decrypted outputs of its 32-bit adder/difference flow
(test/bootstrap_modules/{sum,carry,diff}.txt, written by
src/bootstrap_modules.cpp:540-593 from ciphertexts produced by compute()
:389-430 and difference() :284-339). These tests re-enact those scenarios and
assert plaintext-math equality on the reference's own values (bit-exact RNG
parity stays waived — SURVEY §7; the ciphertexts differ, the decrypted bit
patterns must not).

The committed operands are plain1.txt = 9876, plain2.txt = 686; the goldens
decode consistently (sum.txt = 10562 = 9876+686, diff.txt = 9190 = 9876-686,
carry.txt = the FullAdder carry-array state for those operands).

Reference bit-array conventions (bootstrap_modules.cpp:91-96, :568-586):
array index j holds bit 31-j (index 0 = MSB), so the .txt strings are
MSB-first; FullAdder (:20-44) ripples from index 31 (LSB) down to 0 and
leaves carrybit[j] = carry INTO bit 31-j (carrybit[31] = the initial
carry-in, lsbZero).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torus_fhe_tpu.boot import api, gates
from torus_fhe_tpu.circuits import words
from torus_fhe_tpu.core.params import test_parameters

REF = "/root/reference/test"
GOLD = os.path.join(REF, "bootstrap_modules")

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference fixtures not present")


def _read_int(path):
    with open(path) as f:
        return int(f.read().strip())


def _read_bits_msb_first(path):
    with open(path) as f:
        s = f.read().strip()
    return [int(c) for c in s]


def _msb_string(bits_lsb_first):
    return "".join(str(int(b)) for b in reversed(bits_lsb_first))


@pytest.fixture(scope="module")
def keys():
    p = test_parameters(n=16, N=64)
    sk, ck = api.make_key_pair(jax.random.PRNGKey(0), p)
    return sk, ck


def test_golden_operands_decode():
    """The committed goldens decode consistently from plain1/plain2."""
    p1 = _read_int(os.path.join(GOLD, "plain1.txt"))
    p2 = _read_int(os.path.join(GOLD, "plain2.txt"))
    assert (p1, p2) == (9876, 686)
    sum_bits = _read_bits_msb_first(os.path.join(GOLD, "sum.txt"))
    diff_bits = _read_bits_msb_first(os.path.join(GOLD, "diff.txt"))
    s = int("".join(map(str, sum_bits)), 2)
    d = int("".join(map(str, diff_bits)), 2)
    assert s == p1 + p2 == 10562
    assert d == p1 - p2 == 9190


def _ref_fulladder_carries(a: int, b: int, cin: int = 0, nbits: int = 32):
    """Plaintext twin of FullAdder's carry-array semantics
    (bootstrap_modules.cpp:20-44): returns (sum, carry_into_bit[k] for k)."""
    carries = [0] * (nbits + 1)
    carries[0] = cin
    out = []
    for k in range(nbits):
        s = (a >> k & 1) ^ (b >> k & 1) ^ carries[k]
        carries[k + 1] = ((a >> k & 1) & (b >> k & 1)) | (
            ((a >> k & 1) ^ (b >> k & 1)) & carries[k])
        out.append(s)
    return out, carries[:nbits]


def test_golden_adder_bits_encrypted(keys):
    """Encrypted 32-bit FullAdder on the golden operands reproduces the
    committed sum.txt and carry.txt bit patterns exactly."""
    sk, ck = keys
    a, b = 9876, 686
    ca = words.int_encrypt(jax.random.PRNGKey(1), sk, a, 32)
    cb = words.int_encrypt(jax.random.PRNGKey(2), sk, b, 32)

    # our ripple adder, collecting the carry-in of every position like the
    # reference's carrybit array
    carry = gates.gate_constant(ck, jnp.zeros((), bool))
    sums, carry_ins = [], []
    for i in range(32):
        carry_ins.append(carry)
        s, carry = words.full_adder(ck, words.bit(ca, i), words.bit(cb, i),
                                    carry)
        sums.append(s)
    sum_bits = [int(np.asarray(api.decrypt(sk, s))) for s in sums]
    carry_bits = [int(np.asarray(api.decrypt(sk, c))) for c in carry_ins]

    golden_sum = "".join(map(str, _read_bits_msb_first(
        os.path.join(GOLD, "sum.txt"))))
    golden_carry = "".join(map(str, _read_bits_msb_first(
        os.path.join(GOLD, "carry.txt"))))
    assert _msb_string(sum_bits) == golden_sum
    assert _msb_string(carry_bits)[-len(golden_carry):] == golden_carry

    # cross-check the plaintext twin agrees too
    ps, pc = _ref_fulladder_carries(a, b)
    assert sum_bits == ps and carry_bits == pc


def test_golden_difference_bits_encrypted(keys):
    """Encrypted difference (a + ~b + 1, difference(),
    bootstrap_modules.cpp:284-339) reproduces the committed diff.txt."""
    sk, ck = keys
    a, b = 9876, 686
    ca = words.int_encrypt(jax.random.PRNGKey(3), sk, a, 32)
    cb = words.int_encrypt(jax.random.PRNGKey(4), sk, b, 32)
    diff = words.subtract(ck, ca, cb, 32)
    bits = [int(v) for v in np.asarray(api.decrypt(sk, diff))]
    golden = "".join(map(str, _read_bits_msb_first(
        os.path.join(GOLD, "diff.txt"))))
    assert _msb_string(bits) == golden


def test_plain22_convert_and_flow(keys):
    """The bin/convert scenario on the reference's own plain22/23 values
    (src/Convert.cpp:49-115): bitwise encrypt both, 32x bootsAND, decrypt —
    plaintext-math equality 13452 & 223416."""
    sk, ck = keys
    p22 = _read_int(os.path.join(REF, "plain22.txt"))
    p23 = _read_int(os.path.join(REF, "plain23.txt"))
    assert (p22, p23) == (13452, 223416)
    c1 = words.int_encrypt(jax.random.PRNGKey(5), sk, p22, 32)
    c2 = words.int_encrypt(jax.random.PRNGKey(6), sk, p23, 32)
    out = gates.gate_and(ck, c1, c2)  # all 32 ANDs in ONE batched bootstrap
    got = int(words.int_decrypt(sk, out, 32))
    assert got == (p22 & p23)


@pytest.mark.slow
def test_csv_sort_flow(keys):
    """The bootstrap_modules dataset sort (bubble_sort :341-387 over
    data.csv-style values): encrypted sort of the first column of the
    reference's own data1.csv rows equals the plaintext sort. (Slow-marked:
    the sort network is already covered at this size by test_circuits; this
    adds only the reference-data provenance.)"""
    import csv

    with open(os.path.join(GOLD, "data1.csv")) as f:
        r = csv.reader(f)
        next(r)
        vals = [int(float(row[4])) for _, row in zip(range(4), r)]  # height
    sk, ck = keys
    width = 8
    enc = [words.int_encrypt(jax.random.fold_in(jax.random.PRNGKey(8), i),
                             sk, v, width) for i, v in enumerate(vals)]
    out = words.bubble_sort(ck, enc, width)
    got = [int(words.int_decrypt(sk, w, width)) for w in out]
    assert got == sorted(v % 256 for v in vals), (got, vals)
