"""2nd-gen (KMS, Kwak–Min–Song) multikey TFHE — TPU-native.

Rework of the reference KMS scheme (3-gen-mk-tfhe/src/new_mk_internals.jl,
src/tlev.jl): each party ships (a) standard single-key TGSW encryptions of its
LWE key bits under a throwaway RLWE key z_p (`gsw_key`,
new_mk_internals.jl:24-26), and (b) ONE uni-encryption of z_p under its real
RLWE key (`key_uni_enc`, :28-32). Bootstrapping runs, per party, a *single-key*
blind rotate in the TLev domain (`mk_ith_blind_rotate`, :210-223) followed by a
relinearisation back into the multikey accumulator (`mk_lev_rlwe_mul`,
:185-207, using `UniProduct_new`, :85-127). The `fast_boot` v2 variant skips
party 1's TLev phase (:255-272).

TPU-first notes:
  * The per-party TLev rotate is the existing exact-MXU CMux scan with the
    batch axis widened to B * lev_decomp_length (tgsw_intern_mul == extern_mul
    on every TLev row, tlev.jl:88-95).
  * `tlev_extern_mul` contracts gadget digits against the TLev sample itself —
    a *runtime* ciphertext — so its kernels are limb-packed in-graph
    (ops/poly.pack_kernels_traced) instead of at keygen; still exact int8
    MXU arithmetic, where the reference pays an f64 FFT round trip.
  * All keygen products are host-side exact; uni/pk/shared kernels pre-pack
    to int8 once.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Sequence

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.tree_util import register_dataclass

from ..boot.keyswitch import keyswitch_keygen
from ..core import rng as trng
from ..core.params import SchemeParamsKMS, TGswParams
from ..core.torus import decode_message, encode_message
from ..lwe import LweKey, lwe_keygen
from ..ops import hostmath, poly
from ..rlwe import RLweKey, extract_lwe_key, rlwe_keygen
from ..tgsw import PackedTGsw, pack_tgsw, tgsw_encrypt
from ..utils.device import on_host, to_device
from .ccs import (_gadget_contract, _pack_l_to_1, gen_shared_key,
                  mk_keyswitch, mk_rlwe_extract_sample)
from .samples import MKLweSample, mk_lwe_noiseless_trivial


def _stream_chunk() -> int:
    """Step-chunk size for the streamed gsw F-block scans. The default (8)
    wedged the XLA:TPU AOT compiler at the 4-party registry set in r4
    (4 attempts, R4_RESULTS) — the TORUS_KMS_STREAM_CHUNK env knob lets the
    perf harness retry with a different chunk geometry without a code edit."""
    return int(os.environ.get("TORUS_KMS_STREAM_CHUNK", "8"))


class KMSSecretKey(NamedTuple):
    """One party's secret material (SecretKey_new per CloudKeyPart_new,
    mk_api.jl:416-441)."""

    lwe: LweKey
    rlwe: RLweKey


def kms_party_keygen(key, params: SchemeParamsKMS) -> KMSSecretKey:
    k1, k2 = jax.random.split(key)
    with on_host():
        lwe = lwe_keygen(k1, params.lwe)
        rlwe = rlwe_keygen(k2, params.rlwe, negative=False)
    return KMSSecretKey(lwe, rlwe)


def uni_encrypt_poly(key, message_poly: np.ndarray, alpha: float,
                     rlwe_key: RLweKey, shared_a: np.ndarray,
                     gp: TGswParams, N: int):
    """Uni-encryption of a *polynomial* message (mk_tgsw_encrypt with
    IntPolynomial message, mk_internals.jl:390-446): returns raw d1, f0, f1
    of shape (l, N). Used on the throwaway key z_p (new_mk_internals.jl:29)."""
    bits = gp.bits
    npdt = np.int32 if bits == 32 else np.int64
    l = gp.decomp_length
    k1, k2, k3 = jax.random.split(key, 3)
    r = np.asarray(jax.device_get(trng.uniform_binary(k1, (1, N))), np.int32)
    dtype = jnp.int32 if bits == 32 else jnp.int64
    errs = np.asarray(jax.device_get(trng.gaussian_torus(
        k2, 0, alpha, (2, l, N), dtype)), npdt)
    f1 = np.asarray(jax.device_get(trng.uniform_torus(k3, (l, N), dtype)), npdt)

    gadget = np.asarray(gp.gadget_values, npdt)  # (l,)
    m = np.asarray(message_poly, np.int64)  # small-int poly (binary key)

    d1 = hostmath.negacyclic_polymul_host(r, shared_a, bits) + errs[0]
    d1 = (d1.astype(np.int64)
          + m[None, :] * gadget.astype(np.int64)[:, None]).astype(npdt)
    s = np.asarray(jax.device_get(rlwe_key.key[0]))
    f0 = hostmath.negacyclic_polymul_host(s, f1, bits) + errs[1]
    f0 = (f0.astype(np.int64)
          + r.astype(np.int64) * gadget.astype(np.int64)[:, None]).astype(npdt)
    return d1, f0, f1


@dataclass
class KMSCloudKey:
    """Assembled KMS cloud key (MKCloudKey_new, mk_api.jl:436-456).

    ``gsw_sel`` is the F-block fast backend for the hot per-party TLev/single
    rotates (VERDICT r3 item 4): the per-step 64-bit TGSW kernels as compact
    limb lines, expanded per step chunk at rotate time and contracted as
    block-circulant int8 MXU matmuls with shift-combined wide digits
    (Bg up to 2^13) — bit-identical to the conv scan. The runtime-TLev
    relinearisation (tlev_extern_mul) cannot pre-pack and stays on the
    batched-kernel path; it runs once per party per bootstrap, not per
    CMux step."""

    gsw_kern: jax.Array  # (P*n, 2*limbs, l_gsw*2, N) int8 — TGSW(LWE bits) under z_p
    d_kern: jax.Array    # (P, L, l_uni, N) int8 — uni-enc d1 of z_p
    f0_kern: jax.Array   # (P, L, l_uni, N) int8
    f1_kern: jax.Array   # (P, L, l_uni, N) int8
    pk_kern: jax.Array   # (P, L, l_uni, N) int8 — party public keys
    sk_kern: jax.Array   # (L, l_uni, N) int8 — shared key
    ks_mats: jax.Array   # (P, K, (n+1)*4) int8
    parties: int = 1
    params: SchemeParamsKMS = None
    gsw_sel: jax.Array = None  # (P*n, 2*l_gsw, 2N, 16) int8 compact F-block


register_dataclass(KMSCloudKey,
                   data_fields=("gsw_kern", "d_kern", "f0_kern", "f1_kern",
                                "pk_kern", "sk_kern", "ks_mats", "gsw_sel"),
                   meta_fields=("parties", "params"))


def kms_fb_geometry(params: SchemeParamsKMS, n_steps: int):
    """64-bit F-block geometry of one TGSW CMux contraction over n_steps."""
    from ..ops import fblock

    return fblock.fblock_geometry(
        n_steps, params.rlwe_polynomial_degree, params.rlwe_mask_size,
        params.gsw_decomp_length, params.rlwe_bits, 0)


def kms_cloud_keygen(key, secret_keys: Sequence[KMSSecretKey],
                     params: SchemeParamsKMS, device=None,
                     forms=("conv",)) -> KMSCloudKey:
    """Full KMS cloud-key pipeline (SharedKey_new → per-party CloudKeyPart_new
    → MKCloudKey_new; mk_api.jl:341-346, 411-456).

    ``forms``: "conv" packs the scan-backend gsw kernels; "fb" builds the
    compact F-block lines for the streamed fast rotate (both may be given)."""
    parties = len(secret_keys)
    assert parties <= params.max_parties
    bits = params.rlwe_bits
    N = params.rlwe_polynomial_degree
    uni = params.uni

    with on_host():
        ks_key, kz, kg, ku, kp, kk = jax.random.split(key, 6)
        # shared key uses uni_params decomp length (SharedKey_new, mk_api.jl:341-346)
        shared_a = np.zeros((uni.decomp_length, N),
                            np.int32 if bits == 32 else np.int64)
        dtype = jnp.int32 if bits == 32 else jnp.int64
        shared_a = np.asarray(jax.device_get(
            trng.uniform_torus(ks_key, (uni.decomp_length, N), dtype)))

        gsw_k, gsw_s, d_k, f0_k, f1_k, pubs, mats = [], [], [], [], [], [], []
        for p, sk in enumerate(secret_keys):
            # throwaway key z_p (rand_key, new_mk_internals.jl:20)
            z = rlwe_keygen(jax.random.fold_in(kz, p), params.rlwe, negative=False)
            # (a) gsw_key: TGSW(LWE key bits) under z_p, gsw params
            gsw = tgsw_encrypt(jax.random.fold_in(kg, p),
                               np.asarray(jax.device_get(sk.lwe.key), np.int64),
                               params.gsw_noise_stddev, z, params.tgsw, params.rlwe)
            if "conv" in forms:
                gsw_k.append(np.asarray(jax.device_get(
                    pack_tgsw(gsw, params.tgsw).kernels)))
            if "fb" in forms:
                from ..ops import fblock

                geom = kms_fb_geometry(params, params.lwe_size)
                gsw_s.append(fblock.build_sel(
                    np.asarray(jax.device_get(gsw.samples)), geom))
            # party public key under shared_a, uni params + noise
            pub = hostmath.negacyclic_polymul_host(
                np.asarray(jax.device_get(sk.rlwe.key[0])), shared_a, bits)
            pub = pub + np.asarray(jax.device_get(trng.gaussian_torus(
                jax.random.fold_in(kp, p), 0, params.uni_noise_stddev,
                shared_a.shape, dtype)))
            pubs.append(pub)
            # (b) uni-encryption of z_p under the party's real RLWE key
            d1, f0, f1 = uni_encrypt_poly(
                jax.random.fold_in(ku, p),
                np.asarray(jax.device_get(z.key[0])),
                params.uni_noise_stddev, sk.rlwe, shared_a, uni, N)
            d_k.append(_pack_l_to_1(d1, bits))
            f0_k.append(_pack_l_to_1(f0, bits))
            f1_k.append(_pack_l_to_1(f1, bits))
            ks = keyswitch_keygen(jax.random.fold_in(kk, p),
                                  params.ks_noise_stddev, params.ks,
                                  sk.lwe, extract_lwe_key(sk.rlwe))
            mats.append(np.asarray(jax.device_get(ks.mat)))

        pk_kern = _pack_l_to_1(np.stack(pubs), bits)
        sk_kern = _pack_l_to_1(shared_a, bits)

    ck = KMSCloudKey(jnp.asarray(np.concatenate(gsw_k)) if gsw_k else None,
                     jnp.asarray(np.stack(d_k)), jnp.asarray(np.stack(f0_k)),
                     jnp.asarray(np.stack(f1_k)), jnp.asarray(pk_kern),
                     jnp.asarray(sk_kern), jnp.asarray(np.stack(mats)),
                     parties, params,
                     jnp.asarray(np.concatenate(gsw_s)) if gsw_s else None)
    if jax.devices()[0].platform != "cpu":
        ck = to_device(ck, device)
    return ck


# ---------------------------------------------------------------------------
# TLev accumulator ops (src/tlev.jl, batched)
# ---------------------------------------------------------------------------


def tlev_trivial_one(B: int, params: SchemeParamsKMS):
    """TLev encryption of the integer 1: gadget values on the bodies' constant
    coefficients (tlev_trivial_int + tlev_add_gadget_times_message,
    tlev.jl:37-64). Shape (B, l_lev, 2, N)."""
    lev = params.tlev
    dtype = jnp.int32 if params.rlwe_bits == 32 else jnp.int64
    acc = jnp.zeros((B, lev.decomp_length, 2, params.rlwe_polynomial_degree), dtype)
    g = jnp.asarray(lev.gadget_values, dtype)
    return acc.at[:, :, 1, 0].add(g[None, :])


def tlev_extern_mul(c, lev, params: SchemeParamsKMS):
    """RLWE(m_lev · c) = <g_lev(c), lev> (tlev_extern_mul, tlev.jl:75-79).

    c: (B, S, N) torus polys; lev: (B, l_lev, 2, N) runtime TLev sample
    (shared across the S source polys of each batch element).
    Returns (B, S, 2, N).
    """
    levp = params.tlev
    B, S, N = c.shape
    digits = poly.decompose(c, levp.decomp_length, levp.log2_base, levp.bits,
                            levp.offset)  # (B, S, l, N)
    blocks = poly.digits_to_i8_rows(digits, levp.log2_base)
    Lb = len(blocks)
    # ALL digit-row groups that share an element's runtime kernel — the S
    # accumulator polys x Lb digit limb-blocks — ride the conv's M dim in
    # ONE contraction per element (M = S*Lb instead of Lb passes at M = 1;
    # the relin phase was ~98% of the KMS gate in the M=1 form)
    rows = jnp.stack(blocks, axis=1)  # (B, Lb, S, l, N) int8
    rows = rows.reshape(B, Lb * S, levp.decomp_length, N)
    # runtime kernels: (B, l, 2, N) -> packed (B, 2*L, l, N)
    packed = poly.pack_kernels_traced(lev, levp.bits)
    folded = poly.negacyclic_extern_product_batched_kernels_multirow(
        rows, packed, levp.bits)  # (B, Lb*S, 2*L, N) int32
    L = poly.n_limbs_for(levp.bits)
    folded = folded.reshape(B, Lb, S, 2, L, N)
    dtype = jnp.int32 if levp.bits <= 32 else jnp.int64
    total = jnp.zeros((B, S, 2, N), dtype)
    for m in range(Lb):          # digit limb-block shift
        for j in range(L):       # kernel limb shift
            total = total + (folded[:, m, :, :, j].astype(dtype)
                             << (8 * (m + j)))
    return total


def _lev_rotate_streamed(gsw_part, bara_p, B: int, params: SchemeParamsKMS,
                         chunk: int):
    """Streamed-F-block TLev partial bootstrap from an explicit per-party key
    slice (so the split-dispatch path can trace it with the slice as a plain
    argument)."""
    from ..ops import fblock

    n = params.lwe_size
    llev = params.tlev.decomp_length
    N = params.rlwe_polynomial_degree
    lev = tlev_trivial_one(B, params)  # (B, l_lev, 2, N)
    geom = kms_fb_geometry(params, n)
    gp = params.tgsw
    acc = fblock.blind_rotate_streamed(
        lev.reshape(B * llev, 2, N), gsw_part,
        jnp.broadcast_to(bara_p[:, None], (B, llev, n)).reshape(B * llev, n),
        geom, gp.decomp_length, gp.log2_base, gp.offset,
        chunk=chunk, use_pallas=False)
    return acc.reshape(B, llev, 2, N)


def _lev_blind_rotate(ck: KMSCloudKey, party: int, bara_p, B: int):
    """Per-party TLev partial bootstrap (mk_ith_blind_rotate,
    new_mk_internals.jl:210-223): a single-key CMux scan over the party's n
    TGSW key-bit encryptions, accumulator = TLev(1), batch folded to
    B * l_lev rows of RLWE."""
    from ..tgsw import tgsw_extern_mul
    from ..rlwe import RLweSample

    params = ck.params
    n = params.lwe_size
    llev = params.tlev.decomp_length
    N = params.rlwe_polynomial_degree
    lev = tlev_trivial_one(B, params)  # (B, l_lev, 2, N)

    if ck.gsw_sel is not None:
        # F-block fast backend: streamed chunk expansion + circulant matmuls,
        # the TLev rows folded into the batch axis
        return _lev_rotate_streamed(ck.gsw_sel[party * n:(party + 1) * n],
                                    bara_p, B, params, _stream_chunk())

    kernels = ck.gsw_kern[party * n:(party + 1) * n]
    bara_steps = jnp.swapaxes(bara_p, 0, 1)  # (n, B)

    def step(acc, xs):
        kern_i, bara_i = xs
        # mux in the TLev domain: acc += GSW ⊛ ((X^bara − 1)·acc), every row
        rot = poly.mul_by_monomial(acc, bara_i)
        temp = (rot - acc).reshape(B * llev, 2, N)
        gsw = PackedTGsw(kern_i, params.rlwe_bits, 1, 0)
        delta = tgsw_extern_mul(RLweSample(temp), gsw, params.tgsw)
        return acc + delta.a.reshape(B, llev, 2, N), None

    lev, _ = jax.lax.scan(step, lev, (kernels, bara_steps))
    return lev


def uni_product_new(x, ck: KMSCloudKey, party: int):
    """UniProduct_new (new_mk_internals.jl:85-127) on a batched (B, P+1, N)
    operand: like the CCS hybrid product but with a single relinearisation
    polynomial v summed over parties."""
    uni = ck.params.uni
    P = x.shape[1] - 1
    u = _gadget_contract(x, ck.d_kern[party], uni)  # (B, P+1, N)
    v = None
    for p in range(P):
        t = _gadget_contract(x[:, p], ck.pk_kern[p], uni)
        v = t if v is None else v + t
    v = v - _gadget_contract(x[:, P], ck.sk_kern, uni)  # (B, N)
    w0 = _gadget_contract(v, ck.f0_kern[party], uni)
    w1 = _gadget_contract(v, ck.f1_kern[party], uni)
    out = u.at[:, party].add(w1)
    out = out.at[:, P].add(w0)
    return out


def _lev_rlwe_mul(acc, lev, ck: KMSCloudKey, party: int):
    """Fold party ``party``'s TLev partial bootstrap into the multikey
    accumulator (mk_lev_rlwe_mul, new_mk_internals.jl:185-207).

    acc: (B, P+1, N). Applies tlev_extern_mul to every accumulator poly
    branch-free — polys of parties not yet processed are exactly zero, and
    decompose(0) == 0 makes their contribution exactly zero, reproducing the
    reference's `for i in 1:party-1` skip bit-for-bit."""
    ef = tlev_extern_mul(acc, lev, ck.params)  # (B, P+1, 2, N)
    e = ef[..., 0, :]
    f = ef[..., 1, :]
    return f - uni_product_new(e, ck, party)


def kms_blind_rotate(acc, ck: KMSCloudKey, bara, fast_boot: bool = True):
    """Party-sequential KMS blind rotate (mk_blind_rotate_new{,_v2},
    new_mk_internals.jl:241-272). acc: (B, P+1, N); bara: (B, P, n).

    ``fast_boot``: v2 — party 1 does a plain single-key blind rotate of the
    test vector under its gsw_key and enters the MK accumulator through one
    UniProduct (no TLev phase).
    """
    from ..tgsw import tgsw_extern_mul
    from ..rlwe import RLweSample

    params = ck.params
    P = ck.parties
    B = acc.shape[0]
    n = params.lwe_size
    N = params.rlwe_polynomial_degree
    start = 0
    if fast_boot:
        # single-key rotate of the test vector (mk_single_blind_rotate, :226-238)
        tv = acc[:, P]  # body carries the rotated test vector
        sacc = jnp.concatenate(
            [jnp.zeros((B, 1, N), acc.dtype), tv[:, None]], axis=1)
        if ck.gsw_sel is not None:
            from ..ops import fblock

            geom = kms_fb_geometry(params, n)
            gp = params.tgsw
            sacc = fblock.blind_rotate_streamed(
                sacc, ck.gsw_sel[:n], bara[:, 0], geom, gp.decomp_length,
                gp.log2_base, gp.offset, chunk=_stream_chunk(), use_pallas=False)
        else:
            kernels = ck.gsw_kern[:n]
            bara_steps = jnp.swapaxes(bara[:, 0], 0, 1)

            def step(a, xs):
                kern_i, bara_i = xs
                rot = poly.mul_by_monomial(a, bara_i)
                gsw = PackedTGsw(kern_i, params.rlwe_bits, 1, 0)
                delta = tgsw_extern_mul(RLweSample(rot - a), gsw, params.tgsw)
                return a + delta.a, None

            sacc, _ = jax.lax.scan(step, sacc, (kernels, bara_steps))
        # e = trivial(mask of sacc), f = trivial(body) (:259-263)
        zeros = jnp.zeros((B, P, N), acc.dtype)
        e = jnp.concatenate([zeros, sacc[:, 0][:, None]], axis=1)
        f = jnp.concatenate([zeros, sacc[:, 1][:, None]], axis=1)
        acc = f - uni_product_new(e, ck, 0)
        start = 1
    for p in range(start, P):
        lev = _lev_blind_rotate(ck, p, bara[:, p], B)
        acc = _lev_rlwe_mul(acc, lev, ck, p)
    return acc


# ---------------------------------------------------------------------------
# Split-phase dispatch: one compiled program PER BOOTSTRAP PHASE
# ---------------------------------------------------------------------------
# The monolithic jitted KMS gate at >=4-party registry sets (uni l>=5 + gsw
# streamed at N=2048) crashes the XLA:TPU AOT compile service
# ("tpu_compile_helper subprocess exit code 1" — r4: 4 attempts, r5: retried
# post relin-rework, same crash). The per-phase programs each compile fine
# (benchmarks/kms_compile_bisect.py), so this path dispatches the gate as
# P + 2 cached programs: pre (mod-switch + test vector), the fast-boot
# single-key rotate + uni entry, one SHARED party step (the party index and
# the party's key slices are traced arguments, so 16 parties reuse ONE
# program), and extract + keyswitch. Numerics are bit-identical to
# kms_blind_rotate (tests/test_kms.py::test_split_gate_bit_exact).


def _uni_product_dyn(x, d_p, f0_p, f1_p, pk_kern, sk_kern, party, uni):
    """uni_product_new with the party's kernels passed as traced arguments
    and a traced party index (scatter-add instead of a static .at index)."""
    P = x.shape[1] - 1
    u = _gadget_contract(x, d_p, uni)
    v = None
    for p in range(P):
        t = _gadget_contract(x[:, p], pk_kern[p], uni)
        v = t if v is None else v + t
    v = v - _gadget_contract(x[:, P], sk_kern, uni)
    w0 = _gadget_contract(v, f0_p, uni)
    w1 = _gadget_contract(v, f1_p, uni)
    out = u.at[:, party].add(w1)
    return out.at[:, P].add(w0)


@functools.lru_cache(maxsize=None)
def _jit_split_pre(mu_int: int, params: SchemeParamsKMS):
    def impl(xa, xb):
        N = params.rlwe_polynomial_degree
        n = params.lwe_size
        P = xa.shape[-2]
        B = int(np.prod(xb.shape)) if xb.shape else 1
        bara = decode_message(xa, 2 * N).astype(jnp.int32).reshape(B, P, n)
        barb = decode_message(xb, 2 * N).astype(jnp.int32).reshape(B)
        dtype = jnp.int32 if params.rlwe_bits == 32 else jnp.int64
        testvect = jnp.full((N,), mu_int, dtype)
        body = poly.mul_by_monomial(jnp.broadcast_to(testvect, (B, N)), -barb)
        acc = jnp.concatenate([jnp.zeros((B, P, N), dtype), body[:, None]],
                              axis=1)
        return acc, bara

    return jax.jit(impl)


@functools.lru_cache(maxsize=None)
def _jit_split_gsw(params: SchemeParamsKMS, chunk: int):
    def impl(acc, gsw_part, bara0, d0, f00, f10, pk_kern, sk_kern):
        from ..ops import fblock

        B, P1, N = acc.shape
        P = P1 - 1
        gp = params.tgsw
        geom = kms_fb_geometry(params, params.lwe_size)
        tv = acc[:, P]
        sacc = jnp.concatenate(
            [jnp.zeros((B, 1, N), acc.dtype), tv[:, None]], axis=1)
        sacc = fblock.blind_rotate_streamed(
            sacc, gsw_part, bara0, geom, gp.decomp_length, gp.log2_base,
            gp.offset, chunk=chunk, use_pallas=False)
        zeros = jnp.zeros((B, P, N), acc.dtype)
        e = jnp.concatenate([zeros, sacc[:, 0][:, None]], axis=1)
        f = jnp.concatenate([zeros, sacc[:, 1][:, None]], axis=1)
        return f - _uni_product_dyn(e, d0, f00, f10, pk_kern, sk_kern,
                                    jnp.int32(0), params.uni)

    return jax.jit(impl)


@functools.lru_cache(maxsize=None)
def _jit_split_party(params: SchemeParamsKMS, chunk: int):
    def impl(acc, gsw_part, bara_p, d_p, f0_p, f1_p, pk_kern, sk_kern,
             party):
        B = acc.shape[0]
        lev = _lev_rotate_streamed(gsw_part, bara_p, B, params, chunk)
        ef = tlev_extern_mul(acc, lev, params)  # (B, P+1, 2, N)
        e = ef[..., 0, :]
        f = ef[..., 1, :]
        return f - _uni_product_dyn(e, d_p, f0_p, f1_p, pk_kern, sk_kern,
                                    party, params.uni)

    return jax.jit(impl)


@functools.lru_cache(maxsize=None)
def _jit_split_post(params: SchemeParamsKMS):
    def impl(acc, ks_mats):
        u = mk_rlwe_extract_sample(acc)
        return mk_keyswitch(ks_mats, params.ks, params.lwe_size, u)

    return jax.jit(impl)


def mk_bootstrap_split(ck: KMSCloudKey, mu, x: MKLweSample) -> MKLweSample:
    """Phase-split KMS bootstrap (fast-boot v2 semantics, F-block form only):
    bit-identical to ``mk_bootstrap(ck, mu, x, fast_boot=True)`` but each
    phase runs as its own cached program — the workaround for parameter sets
    whose fused gate program crashes the AOT compiler."""
    assert ck.gsw_sel is not None, \
        "split dispatch needs the F-block (gsw_sel) cloud-key form"
    params = ck.params
    P = ck.parties
    n = params.lwe_size
    chunk = _stream_chunk()
    lead = x.b.shape
    acc, bara = _jit_split_pre(int(mu), params)(x.a, x.b)
    acc = _jit_split_gsw(params, chunk)(
        acc, ck.gsw_sel[:n], bara[:, 0], ck.d_kern[0], ck.f0_kern[0],
        ck.f1_kern[0], ck.pk_kern, ck.sk_kern)
    step = _jit_split_party(params, chunk)
    for p in range(1, P):
        acc = step(acc, ck.gsw_sel[p * n:(p + 1) * n], bara[:, p],
                   ck.d_kern[p], ck.f0_kern[p], ck.f1_kern[p], ck.pk_kern,
                   ck.sk_kern, jnp.int32(p))
    out = _jit_split_post(params)(acc, ck.ks_mats)
    return MKLweSample(out.a.reshape(lead + out.a.shape[-2:]),
                       out.b.reshape(lead))


def mk_gate_nand_split(ck: KMSCloudKey, x: MKLweSample,
                       y: MKLweSample) -> MKLweSample:
    """KMS NAND through the split-phase dispatch (new_mk_gates.jl:7-15
    semantics, fast_boot=True)."""
    mu32 = encode_message(1, 8)
    temp = mk_lwe_noiseless_trivial(mu32, ck.params.lwe, ck.parties,
                                    x.b.shape) - x - y
    return mk_bootstrap_split(ck, 1 << 61, temp)


# ---------------------------------------------------------------------------
# Bootstrap + gates
# ---------------------------------------------------------------------------


def mk_bootstrap_wo_keyswitch(ck: KMSCloudKey, mu, x: MKLweSample,
                              fast_boot: bool = True) -> MKLweSample:
    """Mod-switch + KMS blind rotate (mk_bootstrap_wo_keyswitch_new,
    new_mk_internals.jl:302-312). ``mu`` is a Torus64 phase."""
    params = ck.params
    N = params.rlwe_polynomial_degree
    P = ck.parties
    lead = x.b.shape
    B = int(np.prod(lead)) if lead else 1
    bara = decode_message(x.a, 2 * N).astype(jnp.int32).reshape(B, P, -1)
    barb = decode_message(x.b, 2 * N).astype(jnp.int32).reshape(B)
    dtype = jnp.int32 if params.rlwe_bits == 32 else jnp.int64
    testvect = jnp.full((N,), mu, dtype)
    body = poly.mul_by_monomial(jnp.broadcast_to(testvect, (B, N)), -barb)
    acc = jnp.concatenate([jnp.zeros((B, P, N), dtype), body[:, None]], axis=1)
    acc = kms_blind_rotate(acc, ck, bara, fast_boot)
    u = mk_rlwe_extract_sample(acc)
    return MKLweSample(u.a.reshape(lead + u.a.shape[-2:]), u.b.reshape(lead))


def mk_bootstrap(ck: KMSCloudKey, mu, x: MKLweSample,
                 fast_boot: bool = True) -> MKLweSample:
    """Full KMS multikey bootstrap (mk_bootstrap_new,
    new_mk_internals.jl:315-318)."""
    u = mk_bootstrap_wo_keyswitch(ck, mu, x, fast_boot)
    return mk_keyswitch(ck.ks_mats, ck.params.ks, ck.params.lwe_size, u)


def mk_gate_nand(ck: KMSCloudKey, x: MKLweSample, y: MKLweSample,
                 fast_boot: bool = True) -> MKLweSample:
    """KMS multikey NAND (new_mk_gates.jl:7-15)."""
    mu32 = encode_message(1, 8)
    mu64 = encode_message(1, 8, jnp.int64)
    temp = mk_lwe_noiseless_trivial(mu32, ck.params.lwe, ck.parties, x.b.shape) - x - y
    return mk_bootstrap(ck, mu64, temp, fast_boot)
