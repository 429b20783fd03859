"""3rd-gen multikey TFHE tests.

Models the reference's MK test (3-gen-mk-tfhe/test/runtests.jl:62-102 adapted
to the AKÖ scheme) and the multikey_3gen.jl demo: full keygen pipeline →
encrypted gates → integer adder, parties simulated in-process as array
indices. Tiny insecure parameters keep CPU runs fast."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torus_fhe_tpu import mk
from torus_fhe_tpu.core.params import test_parameters_3gen as params_3gen
from torus_fhe_tpu.mk import gates3gen

PARAMS = params_3gen(parties=2, n=16, N=64)


@pytest.fixture(scope="module")
def keys():
    sks = [mk.mk_party_keygen(jax.random.PRNGKey(10 + p), PARAMS)
           for p in range(2)]
    ck = mk.mk_cloud_keygen(jax.random.PRNGKey(0), sks, PARAMS)
    return sks, ck


def test_mk_encrypt_decrypt_roundtrip(keys):
    sks, _ = keys
    lwe_keys = [sk.lwe for sk in sks]
    msgs = jnp.array([True, False, True, True, False])
    ct = mk.mk_encrypt(jax.random.PRNGKey(1), lwe_keys, msgs, PARAMS)
    dec = np.asarray(mk.mk_decrypt(lwe_keys, ct))
    np.testing.assert_array_equal(dec, np.asarray(msgs))


def test_common_pubkey_is_sum_encryption():
    """b − (Σ_p s_p) ⊛ a must be small noise (the common-key invariant)."""
    from torus_fhe_tpu.ops import hostmath

    sks = [mk.mk_party_keygen(jax.random.PRNGKey(20 + p), PARAMS) for p in range(2)]
    crp = mk.gen_crp(jax.random.PRNGKey(2), PARAMS)
    pubs = [mk.public_keygen(jax.random.PRNGKey(30 + p), sk.rlwe, crp, PARAMS)
            for p, sk in enumerate(sks)]
    common = mk.common_public_key(pubs)
    s_total = sum(np.asarray(jax.device_get(sk.rlwe.key[0])) for sk in sks)
    prod = hostmath.negacyclic_polymul_host(
        s_total, np.asarray(jax.device_get(crp.a)), PARAMS.rlwe_bits)
    noise = np.asarray(jax.device_get(common.b)) - prod
    assert np.abs(noise.astype(np.float64) / 2.0**64).max() < 1e-6


def test_mk_gates_truth_tables(keys):
    sks, ck = keys
    lwe_keys = [sk.lwe for sk in sks]
    xs = jnp.array([False, False, True, True])
    ys = jnp.array([False, True, False, True])
    cx = mk.mk_encrypt(jax.random.PRNGKey(3), lwe_keys, xs, PARAMS)
    cy = mk.mk_encrypt(jax.random.PRNGKey(4), lwe_keys, ys, PARAMS)
    plain = {"nand": lambda a, b: ~(a & b), "or": lambda a, b: a | b,
             "and": lambda a, b: a & b, "xor": lambda a, b: a ^ b}
    for name, gate in gates3gen.BINARY_GATES.items():
        out = gate(ck, cx, cy)
        dec = np.asarray(mk.mk_decrypt(lwe_keys, out))
        np.testing.assert_array_equal(dec, plain[name](np.asarray(xs), np.asarray(ys)), name)


def test_mk_3and_and_not(keys):
    sks, ck = keys
    lwe_keys = [sk.lwe for sk in sks]
    xs = jnp.array([True, True, False, True])
    ys = jnp.array([True, False, True, True])
    zs = jnp.array([True, True, True, False])
    cx = mk.mk_encrypt(jax.random.PRNGKey(5), lwe_keys, xs, PARAMS)
    cy = mk.mk_encrypt(jax.random.PRNGKey(6), lwe_keys, ys, PARAMS)
    cz = mk.mk_encrypt(jax.random.PRNGKey(7), lwe_keys, zs, PARAMS)
    out = gates3gen.mk_gate_3and(ck, cx, cy, cz)
    dec = np.asarray(mk.mk_decrypt(lwe_keys, out))
    np.testing.assert_array_equal(dec, np.asarray(xs) & np.asarray(ys) & np.asarray(zs))
    notx = gates3gen.mk_gate_not(ck, cx)
    np.testing.assert_array_equal(np.asarray(mk.mk_decrypt(lwe_keys, notx)),
                                  ~np.asarray(xs))


def test_mk_int_add(keys):
    """8-bit encrypted adder trials (multikey_3gen.jl:64-92)."""
    sks, ck = keys
    lwe_keys = [sk.lwe for sk in sks]
    WIDTH = 8
    m1, m2 = 7, 9
    c1 = mk.mk_int_encrypt(jax.random.PRNGKey(8), lwe_keys, m1, WIDTH, PARAMS)
    c2 = mk.mk_int_encrypt(jax.random.PRNGKey(9), lwe_keys, m2, WIDTH, PARAMS)
    assert int(mk.mk_int_decrypt(lwe_keys, c1, WIDTH)) == m1
    assert int(mk.mk_int_decrypt(lwe_keys, c2, WIDTH)) == m2
    zero = mk.mk_encrypt(jax.random.PRNGKey(11), lwe_keys, jnp.asarray(False), PARAMS)
    total = gates3gen.mk_add(ck, c1, c2, zero, WIDTH)
    assert int(mk.mk_int_decrypt(lwe_keys, total, WIDTH)) == m1 + m2


def test_mk_comparator(keys):
    sks, ck = keys
    lwe_keys = [sk.lwe for sk in sks]
    WIDTH = 4
    c1 = mk.mk_int_encrypt(jax.random.PRNGKey(12), lwe_keys, 3, WIDTH, PARAMS)
    c2 = mk.mk_int_encrypt(jax.random.PRNGKey(13), lwe_keys, 6, WIDTH, PARAMS)
    one = mk.mk_encrypt(jax.random.PRNGKey(14), lwe_keys, jnp.asarray(True), PARAMS)
    less = gates3gen.mk_less(ck, c1, c2, one, WIDTH)
    assert bool(np.asarray(mk.mk_decrypt(lwe_keys, less)))
    grt = gates3gen.mk_greater(ck, c1, c2, one, WIDTH)
    assert not bool(np.asarray(mk.mk_decrypt(lwe_keys, grt)))


def test_wb_gate_variants(keys):
    """`_wb` gates (no bootstrap, 3gen_mk_gates.jl:16-21): on fresh inputs the
    affine combination already decrypts to the gate output (sign decode)."""
    sks, ck = keys
    lwe_keys = [sk.lwe for sk in sks]
    xs = jnp.array([False, False, True, True])
    ys = jnp.array([False, True, False, True])
    cx = mk.mk_encrypt(jax.random.PRNGKey(70), lwe_keys, xs, PARAMS)
    cy = mk.mk_encrypt(jax.random.PRNGKey(71), lwe_keys, ys, PARAMS)
    plain = {"nand": lambda a, b: ~(a & b), "or": lambda a, b: a | b,
             "and": lambda a, b: a & b, "xor": lambda a, b: a ^ b}
    for name, fn in gates3gen.BINARY_GATES_WB.items():
        out = fn(ck, cx, cy)
        dec = np.asarray(mk.mk_decrypt(lwe_keys, out))
        np.testing.assert_array_equal(
            dec, plain[name](np.asarray(xs), np.asarray(ys)), err_msg=name)


@pytest.fixture(scope="module")
def keys_fb():
    sks = [mk.mk_party_keygen(jax.random.PRNGKey(40 + p), PARAMS)
           for p in range(2)]
    ck = mk.mk_cloud_keygen(jax.random.PRNGKey(5), sks, PARAMS,
                            forms=("conv", "fblock"), keep_samples=True)
    return sks, ck


def test_fb_hi_word_exactness(keys_fb):
    """The 32-bit F-block rotate over the hi-word-rounded key must equal the
    64-bit scan over the SAME rounded key bit-for-bit in the hi word (the
    Torus32-granularity commutation argument in keys3gen.hi_round_samples)."""
    from torus_fhe_tpu.boot.bootstrap import BootstrapKey, blind_rotate_and_extract
    from torus_fhe_tpu.core.torus import t64_to_t32
    from torus_fhe_tpu.mk import boot3gen
    from torus_fhe_tpu.mk.keys3gen import hi_round_samples
    from torus_fhe_tpu.ops import poly

    sks, ck = keys_fb
    rng = np.random.default_rng(0)
    B = 4
    n_steps = ck.parties * PARAMS.lwe_size
    bara = jnp.asarray(rng.integers(
        0, 2 * PARAMS.rlwe_polynomial_degree, (B, n_steps), dtype=np.int64),
        jnp.int32)
    barb = jnp.asarray(rng.integers(
        0, 2 * PARAMS.rlwe_polynomial_degree, (B,), dtype=np.int64), jnp.int32)
    mu = jnp.asarray(1 << 61, jnp.int64)

    # fast path on the rounded key
    u_fast = boot3gen._fast_rotate_extract(ck, mu, bara, barb, B)

    # 64-bit scan over conv kernels packed from the SAME rounded samples
    hi = hi_round_samples(np.asarray(jax.device_get(ck.bk_samples)))
    rounded64 = hi.astype(np.int64) << 32
    kern = rounded64.reshape(n_steps, PARAMS.gsw_decomp_length * 2, 2,
                             PARAMS.rlwe_polynomial_degree)
    packed = poly.pack_kernels_host(kern, 64)
    bk64 = BootstrapKey(jnp.asarray(packed))
    tv = jnp.full((PARAMS.rlwe_polynomial_degree,), mu, jnp.int64)
    u_scan = blind_rotate_and_extract(tv, bk64, barb, bara, PARAMS)

    np.testing.assert_array_equal(np.asarray(u_fast.a), np.asarray(u_scan.a))
    np.testing.assert_array_equal(np.asarray(u_fast.b), np.asarray(u_scan.b))


def test_fb_gate_truth_table(keys_fb):
    """mk_gate_nand through the fast F-block path decrypts correctly."""
    sks, ck = keys_fb
    lwe_keys = [sk.lwe for sk in sks]
    xs = jnp.array([False, False, True, True])
    ys = jnp.array([False, True, False, True])
    cx = mk.mk_encrypt(jax.random.PRNGKey(6), lwe_keys, xs, PARAMS)
    cy = mk.mk_encrypt(jax.random.PRNGKey(7), lwe_keys, ys, PARAMS)
    assert ck.bk_fb is not None
    out = gates3gen.mk_gate_nand(ck, cx, cy)
    dec = np.asarray(mk.mk_decrypt(lwe_keys, out))
    np.testing.assert_array_equal(dec, ~(np.asarray(xs) & np.asarray(ys)))


def test_expand_fblock_chunk_matches_build(keys_fb):
    """The on-device roll-based expansion equals build_fblocks slice-for-slice
    (the streamed path's inner step)."""
    from torus_fhe_tpu.mk.keys3gen import hi_round_samples, mk_fb_geometry
    from torus_fhe_tpu.ops import fblock

    sks, ck = keys_fb
    geom = mk_fb_geometry(PARAMS, ck.parties)
    hi = hi_round_samples(np.asarray(jax.device_get(ck.bk_samples)))
    sel = fblock.build_sel(hi, geom)
    full = np.asarray(jax.device_get(fblock.build_fblocks(hi, geom)))
    got = np.asarray(jax.device_get(
        fblock.expand_fblock_chunk(jnp.asarray(sel[3:9]), geom)))
    np.testing.assert_array_equal(got, full[3:9])


def test_streamed_rotate_bit_exact(keys_fb):
    """blind_rotate_streamed (compact key, chunked on-the-fly expansion) is
    bit-identical to the full F-block path — including non-divisible chunk
    sizes exercising the identity pad steps."""
    from torus_fhe_tpu.mk import boot3gen
    from torus_fhe_tpu.mk.keys3gen import (MKCloudKey, hi_round_samples,
                                           mk_fb_geometry)
    from torus_fhe_tpu.ops import fblock

    sks, ck = keys_fb
    geom = mk_fb_geometry(PARAMS, ck.parties)
    hi = hi_round_samples(np.asarray(jax.device_get(ck.bk_samples)))
    sel = jnp.asarray(fblock.build_sel(hi, geom))
    rng = np.random.default_rng(1)
    B = 3
    n_steps = ck.parties * PARAMS.lwe_size
    bara = jnp.asarray(rng.integers(0, 2 * PARAMS.rlwe_polynomial_degree,
                                    (B, n_steps), dtype=np.int64), jnp.int32)
    barb = jnp.asarray(rng.integers(0, 2 * PARAMS.rlwe_polynomial_degree,
                                    (B,), dtype=np.int64), jnp.int32)
    mu = jnp.asarray(1 << 61, jnp.int64)
    u_full = boot3gen._fast_rotate_extract(ck, mu, bara, barb, B)

    ck_s = MKCloudKey(None, ck.ks_mat, ck.parties, PARAMS, None, None, sel)
    for chunk in (n_steps, 12):  # 12 does not divide 32 -> pad steps
        from functools import partial

        from torus_fhe_tpu.ops.fblock import blind_rotate_streamed
        import torus_fhe_tpu.ops.fblock as fbmod

        orig = fbmod.blind_rotate_streamed
        fbmod.blind_rotate_streamed = partial(orig, chunk=chunk)
        try:
            u_str = boot3gen._fast_rotate_extract(ck_s, mu, bara, barb, B)
        finally:
            fbmod.blind_rotate_streamed = orig
        np.testing.assert_array_equal(np.asarray(u_str.a), np.asarray(u_full.a))
        np.testing.assert_array_equal(np.asarray(u_str.b), np.asarray(u_full.b))


def test_streamed_gate_truth_table(keys_fb):
    """mk_gate_nand through the compact/streamed key form decrypts correctly
    end-to-end (the >=4-party one-chip fast-path configuration)."""
    from torus_fhe_tpu.mk.keys3gen import (MKCloudKey, hi_round_samples,
                                           mk_fb_geometry)
    from torus_fhe_tpu.ops import fblock

    sks, ck = keys_fb
    geom = mk_fb_geometry(PARAMS, ck.parties)
    hi = hi_round_samples(np.asarray(jax.device_get(ck.bk_samples)))
    sel = jnp.asarray(fblock.build_sel(hi, geom))
    ck_s = MKCloudKey(None, ck.ks_mat, ck.parties, PARAMS, None, None, sel)
    lwe_keys = [sk.lwe for sk in sks]
    xs = jnp.array([False, False, True, True])
    ys = jnp.array([False, True, False, True])
    cx = mk.mk_encrypt(jax.random.PRNGKey(8), lwe_keys, xs, PARAMS)
    cy = mk.mk_encrypt(jax.random.PRNGKey(9), lwe_keys, ys, PARAMS)
    out = gates3gen.mk_gate_nand(ck_s, cx, cy)
    dec = np.asarray(mk.mk_decrypt(lwe_keys, out))
    np.testing.assert_array_equal(dec, ~(np.asarray(xs) & np.asarray(ys)))


def test_wide_digit_fb64_exactness():
    """The >=16-party gadget shape (l=1, Bg=2^26): hi-word rounding is
    noise-unsafe there (the +-2^-33 BK rounding is amplified by the 2^25
    digit magnitude — measured to flip decryptions), so the fast path is the
    EXACT 64-bit streamed F-block scan with shift-combined int8 digit
    blocks — bit-identical to the 64-bit conv scan over the SAME raw key."""
    from torus_fhe_tpu.boot.bootstrap import (BootstrapKey,
                                              blind_rotate_and_extract)
    from torus_fhe_tpu.core.params import SchemeParams3Gen
    from torus_fhe_tpu.mk import boot3gen
    from torus_fhe_tpu.mk.keys3gen import mk_fb_supported
    from torus_fhe_tpu.ops import poly

    wp = SchemeParams3Gen(8, 2**-13.52, 64, 1, 64, 1, 26, 2**-62.0,
                          4, 3, 2**-13.52, 2)
    assert not mk_fb_supported(wp)  # wide digits: hi-word path excluded
    sks = [mk.mk_party_keygen(jax.random.PRNGKey(70 + p), wp)
           for p in range(2)]
    ck = mk.mk_cloud_keygen(jax.random.PRNGKey(6), sks, wp,
                            forms=("fbstream",), keep_samples=True)
    assert ck.bk_fb_sel is not None

    rng = np.random.default_rng(3)
    B = 3
    n_steps = 2 * wp.lwe_size
    N = wp.rlwe_polynomial_degree
    bara = jnp.asarray(rng.integers(0, 2 * N, (B, n_steps), dtype=np.int64),
                       jnp.int32)
    barb = jnp.asarray(rng.integers(0, 2 * N, (B,), dtype=np.int64), jnp.int32)
    mu = jnp.asarray(1 << 61, jnp.int64)
    u_fast = boot3gen._fast_rotate_extract(ck, mu, bara, barb, B)

    raw = np.asarray(jax.device_get(ck.bk_samples))
    kern = raw.reshape(n_steps, wp.gsw_decomp_length * 2, 2, N)
    packed = poly.pack_kernels_host(kern, 64)
    bk64 = BootstrapKey(jnp.asarray(packed))
    tv = jnp.full((N,), mu, jnp.int64)
    u_scan = blind_rotate_and_extract(tv, bk64, barb, bara, wp)
    np.testing.assert_array_equal(np.asarray(u_fast.a), np.asarray(u_scan.a))
    np.testing.assert_array_equal(np.asarray(u_fast.b), np.asarray(u_scan.b))

    # and the gate decrypts end-to-end on the fast form
    lwe_keys = [sk.lwe for sk in sks]
    xs = jnp.array([False, True])
    ys = jnp.array([True, True])
    cx = mk.mk_encrypt(jax.random.PRNGKey(8), lwe_keys, xs, wp)
    cy = mk.mk_encrypt(jax.random.PRNGKey(9), lwe_keys, ys, wp)
    out = gates3gen.mk_gate_nand(ck, cx, cy)
    dec = np.asarray(mk.mk_decrypt(lwe_keys, out))
    np.testing.assert_array_equal(dec, ~(np.asarray(xs) & np.asarray(ys)))
