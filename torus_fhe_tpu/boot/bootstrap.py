"""Gate bootstrapping: batched blind rotation as a lax.scan of MXU products.

TPU-native rework of 3-gen-mk-tfhe/src/bootstrap.jl. The CMux chain over the
n LWE key bits is sequential by construction (each step multiplies the
accumulator by an encrypted monomial power), so latency is bought back with
batch: the whole pipeline is batch-first and every step's external product is
one exact int8 convolution on the MXU (see ops/poly.py). The reference's
`bara[i] == 0` skip (bootstrap.jl:40-44) is free here: decompose(0) == 0, so
the zero-step contributes an exactly-zero update — branch-free, same result.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.params import SchemeParams
from ..core.torus import decode_message
from ..lwe import LweKey, LweSample
from ..ops import poly
from ..rlwe import (RLweKey, RLweSample, mul_by_monomial, rlwe_extract_sample,
                    rlwe_noiseless_trivial)
from ..tgsw import PackedTGsw, TGswSample, pack_tgsw, tgsw_encrypt, tgsw_extern_mul


class BootstrapKey(NamedTuple):
    """n packed TGSW encryptions of the LWE key bits (bootstrap.jl:1-16)."""

    kernels: jax.Array  # (n, (k+1)*limbs, l*(k+1), N) int8


def bootstrap_keygen(key, alpha: float, lwe_key: LweKey, rlwe_key: RLweKey,
                     params: SchemeParams) -> BootstrapKey:
    """TGSW-encrypt each LWE key bit under the RLWE key and pack for the MXU."""
    gsw = tgsw_encrypt(key, lwe_key.key, alpha, rlwe_key, params.tgsw, params.rlwe)
    packed = pack_tgsw(gsw, params.tgsw, getattr(params, "bk_drop_limbs", 0))
    return BootstrapKey(packed.kernels)


def mux_rotate(accum: RLweSample, kernels_i, barai, params: SchemeParams) -> RLweSample:
    """accum += BK_i (*) [(X^bara_i - 1) * accum]  (bootstrap.jl:19-23)."""
    rotated = mul_by_monomial(accum, barai)
    temp = RLweSample(rotated.a - accum.a)
    gsw = PackedTGsw(kernels_i, params.rlwe_bits, params.rlwe_mask_size,
                     getattr(params, "bk_drop_limbs", 0))
    delta = tgsw_extern_mul(temp, gsw, params.tgsw)
    return RLweSample(accum.a + delta.a)


def blind_rotate(accum: RLweSample, bk: BootstrapKey, bara, params: SchemeParams) -> RLweSample:
    """Multiply accum by X^{<bara, s>} via the CMux chain (bootstrap.jl:31-45).

    accum.a: (B, k+1, N); bara: (B, n). Scans over the n key positions with
    the batch axis vectorised inside each step.
    """
    bara_steps = jnp.swapaxes(bara, 0, 1)  # (n, B)

    def step(acc_a, xs):
        kern_i, bara_i = xs
        acc = RLweSample(acc_a)
        out = mux_rotate(acc, kern_i, bara_i, params)
        return out.a, None

    acc_a, _ = jax.lax.scan(step, accum.a, (bk.kernels, bara_steps))
    return RLweSample(acc_a)


def blind_rotate_and_extract(v, bk: BootstrapKey, barb, bara, params: SchemeParams) -> LweSample:
    """result = LWE(v[phase]) (bootstrap.jl:56-65).

    v: (N,) or (B, N) test polynomial; barb: (B,); bara: (B, n).
    """
    B = bara.shape[0]
    dtype = jnp.int32 if params.rlwe_bits == 32 else jnp.int64
    v = jnp.broadcast_to(jnp.asarray(v, dtype), (B, params.rlwe_polynomial_degree))
    testvect = poly.mul_by_monomial(v, -barb)
    accum = rlwe_noiseless_trivial(testvect, params.rlwe, (B,))
    # noiseless trivial broadcast puts mu at poly index k; shape (B, k+1, N)
    accum = blind_rotate(accum, bk, bara, params)
    return rlwe_extract_sample(accum)


def bootstrap_wo_keyswitch(bk: BootstrapKey, mu, x: LweSample, params: SchemeParams) -> LweSample:
    """Mod-switch to Z_2N then blind-rotate the [mu...mu] test vector
    (bootstrap.jl:75-88). Accepts any leading batch shape (flattened for the
    scan, restored on the output)."""
    N = params.rlwe_polynomial_degree
    lead = x.b.shape
    B = int(np.prod(lead)) if lead else 1
    bara = decode_message(x.a, 2 * N).astype(jnp.int32).reshape(B, -1)
    barb = decode_message(x.b, 2 * N).astype(jnp.int32).reshape(B)
    dtype = jnp.int32 if params.rlwe_bits == 32 else jnp.int64
    testvect = jnp.full((N,), mu, dtype)
    u = blind_rotate_and_extract(testvect, bk, barb, bara, params)
    return LweSample(u.a.reshape(lead + u.a.shape[-1:]), u.b.reshape(lead))


def bootstrap(bk: BootstrapKey, ks, mu, x: LweSample, params: SchemeParams) -> LweSample:
    """Full gate bootstrap: rotate-extract then keyswitch (bootstrap.jl:95-101)."""
    from .keyswitch import keyswitch

    u = bootstrap_wo_keyswitch(bk, mu, x, params)
    return keyswitch(ks, params.ks, u)
