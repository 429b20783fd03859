"""Fused blind-rotate Pallas TPU kernel over the F-block bootstrapping key.

One pallas_call runs the *entire* CMux chain (n sequential steps) for a tile
of gates: the RLWE accumulator lives in VMEM for all n steps, each step's
F-block slice (D x R*bs x ncols*bs int8) streams from HBM through the
automatic grid pipeline (double-buffered), and the per-step work is

    rotate:    branch-free barrel of log2(2N) static negacyclic rolls (VPU)
    decompose: gadget digits via shifts/masks (VPU)
    contract:  nb*nb int8 (B, R*bs) @ (R*bs, ncols*bs) matmuls w/ exact int32
               accumulation (MXU), block-circulant delta indexing static
    combine:   per-column limb shift-add onto the accumulator (VPU); column
               layout (geom.cols) supports quantized keys where mask and body
               polys keep different limb counts

Grid = (batch tiles, n steps).  The output ref doubles as the accumulator
(constant index per batch tile -> stays resident, written back once per tile).

Semantics are bit-identical to ops/fblock.blind_rotate_fblock (tested on CPU
via interpret mode); this kernel exists purely to keep the MXU at the roofline
— reference hot loop being replaced: 3-gen-mk-tfhe/src/bootstrap.jl:19-45 +
polynomials.jl:208-242.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fblock import FBlockGeometry


def _negacyclic_roll(x, s: int):
    """x * X^s mod (X^N + 1), static 0 <= s < N, on the last axis."""
    N = x.shape[-1]
    if s == 0:
        return x
    return jnp.concatenate([-x[..., N - s:], x[..., :N - s]], axis=-1)


def _rotate_kernel(bara_ref, acc0_ref, fb_ref, out_ref, digits_ref, *,
                   geom: FBlockGeometry, decomp_length: int, log2_base: int,
                   offset: int):
    C, R = geom.C, geom.R
    nb, D, bs, N = geom.nb, geom.D, geom.bs, geom.N
    ncols = len(geom.cols)
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        out_ref[:] = acc0_ref[:]

    acc = out_ref[0]  # (C, B, N) int32
    # (1, B, 1) int32 so i1 masks are born 3-D (Mosaic can't reshape i1)
    sh = bara_ref[0, pl.ds(s, 1), :].reshape(1, -1, 1) & (2 * N - 1)
    x = acc
    bit = 1
    while bit < N:
        rolled = _negacyclic_roll(x, bit)
        x = jnp.where((sh & bit) != 0, rolled, x)
        bit <<= 1
    x = jnp.where((sh & N) != 0, -x, x)
    t = x - acc  # (X^bara - 1) * acc
    shifted = t + jnp.int32(offset)
    mask = jnp.int32((1 << log2_base) - 1)
    half = jnp.int32(1 << (log2_base - 1))
    for lev in range(decomp_length):
        d = ((shifted >> (32 - (lev + 1) * log2_base)) & mask) - half
        d8 = d.astype(jnp.int8)  # (C, B, N)
        for j in range(C):
            r = lev * C + j
            for i in range(nb):
                digits_ref[i, :, r * bs:(r + 1) * bs] = \
                    d8[j, :, i * bs:(i + 1) * bs]

    B = digits_ref.shape[1]
    for j in range(nb):
        acc32 = jnp.zeros((B, ncols * bs), jnp.int32)
        for i in range(nb):
            delta = (j - i) % D
            acc32 = acc32 + jax.lax.dot_general(
                digits_ref[i], fb_ref[0, delta],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        sl = pl.ds(j * bs, bs)
        for c in range(C):
            comb = jnp.zeros((B, bs), jnp.int32)
            for ci, (p, shift) in enumerate(geom.cols):
                if p == c:
                    comb = comb + (acc32[:, ci * bs:(ci + 1) * bs] << shift)
            cur = out_ref[0, c, :, sl]
            out_ref[0, c, :, sl] = cur + comb


def blind_rotate_pallas(acc_a, fb, bara, geom: FBlockGeometry,
                        decomp_length: int, log2_base: int, offset: int,
                        *, b_tile: int = 128, interpret: bool = False):
    """Fused CMux chain. acc_a: (B, C, N) int32; fb: (n, D, R*bs, ncols*bs)
    int8; bara: (B, n) int32. Returns (B, C, N) int32. B is padded to a
    multiple of b_tile; each tile re-streams the full F-block key
    (compute-bound for b_tile >= ~128 at the shipped 128-bit set)."""
    assert geom.bits == 32, "pallas rotate implements the 32-bit torus path"
    B, C, N = acc_a.shape
    n = geom.n
    ncols = len(geom.cols)
    bt = min(b_tile, max(8, B))
    pad = (-B) % bt
    if pad:
        acc_a = jnp.concatenate(
            [acc_a, jnp.zeros((pad, C, N), acc_a.dtype)], axis=0)
        bara = jnp.concatenate(
            [bara, jnp.zeros((pad, n), bara.dtype)], axis=0)
    nt = (B + pad) // bt

    acc_t = jnp.swapaxes(acc_a, 0, 1).reshape(C, nt, bt, N)
    acc_t = jnp.swapaxes(acc_t, 0, 1)  # (nt, C, bt, N)
    bara_t = jnp.swapaxes(bara, 0, 1).reshape(n, nt, bt)
    bara_t = jnp.swapaxes(bara_t, 0, 1)  # (nt, n, bt)

    kern = functools.partial(
        _rotate_kernel, geom=geom, decomp_length=decomp_length,
        log2_base=log2_base, offset=offset)

    Rbs = geom.R * geom.bs
    CLbs = ncols * geom.bs
    out = pl.pallas_call(
        kern,
        grid=(nt, n),
        in_specs=[
            pl.BlockSpec((1, n, bt), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, bt, N), lambda b, s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, geom.D, Rbs, CLbs), lambda b, s: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, bt, N), lambda b, s: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt, C, bt, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((geom.nb, bt, Rbs), jnp.int8)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nt * n * bt * Rbs * CLbs * geom.nb,
            bytes_accessed=n * geom.D * Rbs * CLbs + nt * C * bt * N * 8,
            transcendentals=0,
        ),
    )(bara_t, acc_t, fb)

    out = jnp.swapaxes(out, 0, 1).reshape(C, nt * bt, N)
    out = jnp.swapaxes(out, 0, 1)
    return out[:B] if pad else out
