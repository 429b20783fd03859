"""3rd-gen multikey gate bootstrapping on the shared exact-MXU machinery.

TPU-native rework of 3-gen-mk-tfhe/src/3gen_mk_internals.jl:59-121 and
mk_keyswitch_3gen (mk_internals.jl:730-744). Because the AKÖ external product
is packed as a standard TGSW kernel (see keys3gen.py), the multikey blind
rotate is ONE lax.scan over parties×n CMux steps — party p's n key bits occupy
steps [p·n, (p+1)·n) exactly like the reference's sequential per-party loop
(mk_blind_rotate_3gen, 3gen_mk_internals.jl:78-84), and the accumulator stays
a single 2-poly RLWE sample regardless of party count (the AKÖ
linear-complexity property).

The multikey keyswitch applies every party's table to the SAME extracted mask,
so all parties share one one-hot digit matrix and the per-party tables
concatenate into a single MXU matmul; the b-parts reduce by summation — the
`psum` target when parties are sharded over the mesh `party` axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..boot.bootstrap import BootstrapKey, blind_rotate_and_extract
from ..core.params import SchemeParams3Gen
from ..core.torus import decode_message, encode_message
from ..lwe import LweSample
from ..ops import poly
from .keys3gen import MKCloudKey
from .samples import MKLweSample


def mk_bootstrap_wo_keyswitch(ck: MKCloudKey, mu, x: MKLweSample) -> LweSample:
    """Mod-switch the (parties, n) mask and blind-rotate the [mu..mu] test
    vector through all parties' CMux steps (3gen_mk_internals.jl:99-109)."""
    params = ck.params
    N = params.rlwe_polynomial_degree
    lead = x.b.shape  # arbitrary leading (batch) shape, () included
    B = int(np.prod(lead)) if lead else 1
    bara = decode_message(x.a, 2 * N).astype(jnp.int32).reshape(B, -1)  # party-major
    barb = decode_message(x.b, 2 * N).astype(jnp.int32).reshape(B)
    dtype = jnp.int32 if params.rlwe_bits == 32 else jnp.int64
    testvect = jnp.full((N,), mu, dtype)
    bk = BootstrapKey(ck.bk_kernels)
    u = blind_rotate_and_extract(testvect, bk, barb, bara, params)
    return LweSample(u.a.reshape(lead + u.a.shape[-1:]), u.b.reshape(lead))


def mk_keyswitch(ck: MKCloudKey, u: LweSample) -> MKLweSample:
    """Per-party keyswitch of the extracted sample with one shared one-hot
    matmul (mk_keyswitch_3gen, mk_internals.jl:730-744)."""
    params = ck.params
    ksp = params.ks
    l, lb = ksp.decomp_length, ksp.log2_base
    base = 1 << lb
    n = params.lwe_size
    P = ck.parties

    lead = u.b.shape
    prec_offset = jnp.int32(1 << (32 - (1 + lb * l)))
    aibar = u.a + prec_offset  # (..., N_in)

    j = np.arange(1, l + 1, dtype=np.int32)
    digits = (aibar[..., None] >> (32 - j * lb)) & (base - 1)  # (..., N_in, l)
    h = np.arange(1, base, dtype=np.int32)
    onehot = (digits[..., None] == h).astype(jnp.int8)
    onehot = onehot.reshape(lead + (-1,))

    deltas = jnp.dot(onehot, ck.ks_mat, preferred_element_type=jnp.int32)
    deltas = deltas.reshape(lead + (P, n + 1, 4))
    deltas = poly.limb_combine(deltas, 32, axis=-1)  # (..., P, n+1)

    a = -deltas[..., :n]  # (..., P, n)
    b = u.b - jnp.sum(deltas[..., n], axis=-1, dtype=jnp.int32)
    return MKLweSample(a, b)


def mk_bootstrap(ck: MKCloudKey, mu, x: MKLweSample) -> MKLweSample:
    """Full multikey bootstrap (mk_bootstrap_3gen, 3gen_mk_internals.jl:112-117)."""
    u = mk_bootstrap_wo_keyswitch(ck, mu, x)
    return mk_keyswitch(ck, u)
