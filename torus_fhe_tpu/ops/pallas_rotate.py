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

The batch tile is split into ``interleave`` independent sub-tiles whose
rotate/decompose (VPU) and contraction (MXU) phases are interleaved in
program order, exposing two independent dependence chains so the Mosaic
scheduler can keep the MXU busy during the serial VPU work of the other
sub-tile — the CMux chain is serial per gate, but sub-tiles are not.

``stepvec_mu`` mode builds the initial accumulator in-kernel from barb (the
noiseless [mu..mu] test vector rotated by X^-barb is a +-mu step function),
dropping the (C, BT, N) acc0 input block and its VMEM residency — that 2 MB
(at BT=256) is what lets the bigger tile fit in the ~16 MB VMEM budget.

Semantics are bit-identical to ops/fblock.blind_rotate_fblock (tested on CPU
via interpret mode); this kernel exists purely to keep the MXU at the
roofline — reference hot loop being replaced:
3-gen-mk-tfhe/src/bootstrap.jl:19-45 + polynomials.jl:208-242.
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


def _rotate_kernel(bara_ref, init_ref, fb_ref, out_ref, digits_ref, *,
                   geom: FBlockGeometry, decomp_length: int, log2_base: int,
                   offset: int, il: int, stepvec_mu, unroll: int = 1,
                   ablate: str | None = None):
    C, R = geom.C, geom.R
    nb, D, bs, N = geom.nb, geom.D, geom.bs, geom.N
    Rbs = R * bs
    ncols = len(geom.cols)
    s = pl.program_id(1)
    BT = out_ref.shape[2]
    bts = BT // il

    @pl.when(s == 0)
    def _init():
        if stepvec_mu is None:
            out_ref[:] = init_ref[:]
        else:
            # acc0 = X^{-barb} * trivial([mu..mu]): mask polys zero, body poly
            # (index C-1) is the +-mu step function of barb in [0, 2N).
            t = init_ref[0, 0].reshape(1, BT, 1) & (2 * N - 1)
            w = jax.lax.broadcasted_iota(jnp.int32, (1, BT, N), 2)
            tt = t & (N - 1)
            pos = (w < (N - tt)) ^ (t >= N)
            mu = jnp.int32(stepvec_mu)
            body = jnp.where(pos, mu, -mu)
            for c in range(C - 1):
                out_ref[0, c] = jnp.zeros((BT, N), jnp.int32)
            out_ref[0, C - 1] = jnp.broadcast_to(body[0], (BT, N))

    def rot_dec(sub: int, bara_row):
        """Barrel-rotate + gadget-decompose sub-tile ``sub`` into digits_ref."""
        lo = sub * bts
        acc = out_ref[0, :, lo:lo + bts, :]  # (C, bts, N) int32
        # (1, bts, 1) int32 so i1 masks are born 3-D (Mosaic can't reshape i1)
        sh = bara_row[:, lo:lo + bts].reshape(1, -1, 1) & (2 * N - 1)
        x = acc
        if ablate != "norot":  # ablation harness: skip the barrel (timing)
            bit = 1
            while bit < N:
                rolled = _negacyclic_roll(x, bit)
                x = jnp.where((sh & bit) != 0, rolled, x)
                bit <<= 1
            x = jnp.where((sh & N) != 0, -x, x)
        if ablate == "nodec":  # skip the decompose+scatter (digits stale)
            return
        shifted = (x - acc) + jnp.int32(offset)  # (X^bara - 1) * acc + offset
        mask = jnp.int32((1 << log2_base) - 1)
        half = jnp.int32(1 << (log2_base - 1))
        for lev in range(decomp_length):
            d = ((shifted >> (32 - (lev + 1) * log2_base)) & mask) - half
            d8 = d.astype(jnp.int8)  # (C, bts, N)
            for j in range(C):
                r = lev * C + j
                for i in range(nb):
                    digits_ref[sub, :, i * Rbs + r * bs:
                               i * Rbs + (r + 1) * bs] = \
                        d8[j, :, i * bs:(i + 1) * bs]

    def contract(sub: int, u: int):
        """Per output block j: the fb rows for digit blocks i = 0..nb-1 are
        seq positions m = (i-j) mod D — contiguous in the seq-ordered key, so
        the whole nb-block contraction is 1-2 long-K matmuls (MXU-internal
        accumulation). The combine for block j-1 hides behind block j's dot."""
        lo = sub * bts
        pending = None
        for j in range(nb):
            if ablate == "nodot":  # keep combine honest: a non-foldable read
                junk = digits_ref[sub, :, :bs].astype(jnp.int32)
                _combine(lo, j, jnp.concatenate([junk] * ncols, axis=-1))
                continue
            m0 = (-j) % D
            len1 = min(nb, D - m0)
            acc32 = jax.lax.dot_general(
                digits_ref[sub, :, :len1 * Rbs],
                fb_ref[u, m0 * Rbs:(m0 + len1) * Rbs, :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            if len1 < nb:
                acc32 = acc32 + jax.lax.dot_general(
                    digits_ref[sub, :, len1 * Rbs:],
                    fb_ref[u, :(nb - len1) * Rbs, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            if pending is not None:
                _combine(*pending)
            pending = (lo, j, acc32)
        if pending is not None:
            _combine(*pending)

    def _combine(lo: int, j: int, acc32):
        sl = pl.ds(j * bs, bs)
        for c in range(C):
            comb = jnp.zeros((bts, bs), jnp.int32)
            for ci, (p, shift) in enumerate(geom.cols):
                if p == c:
                    comb = comb + (acc32[:, ci * bs:(ci + 1) * bs] << shift)
            cur = out_ref[0, c, lo:lo + bts, sl]
            out_ref[0, c, lo:lo + bts, sl] = cur + comb

    # Interleaved program order: each sub-tile's VPU phase is followed by its
    # MXU phase; the next sub-tile's VPU phase is independent of the previous
    # sub-tile's MXU phase, so the scheduler overlaps them. With ``unroll``
    # steps per grid iteration the window widens further: sub-tile 0's step
    # u+1 rotate depends only on its own step-u combine, so it can run under
    # sub-tile 1's step-u contraction.
    for u in range(unroll):
        # full-width row load: Mosaic can't combine the dynamic sublane index
        # with a partial lane slice, so slice the loaded vector per sub-tile
        bara_row = bara_ref[0, pl.ds(s * unroll + u, 1), :]  # (1, BT)
        for sub in range(il):
            rot_dec(sub, bara_row)
            contract(sub, u)


def _pad_batch(arrs, B: int, bt: int):
    pad = (-B) % bt
    if not pad:
        return arrs, 0
    out = []
    for a in arrs:
        out.append(jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0))
    return out, pad


def blind_rotate_pallas(acc_a, fb, bara, geom: FBlockGeometry,
                        decomp_length: int, log2_base: int, offset: int,
                        *, b_tile: int | None = None, interleave: int = 0,
                        unroll: int = 1, stepvec=None,
                        interpret: bool = False, ablate: str | None = None):
    """Fused CMux chain. fb: (n, D*R*bs, ncols*bs) int8 (seq_perm delta
    order, see ops/fblock.seq_perm); bara: (B, n) int32.

    Init modes: ``acc_a`` (B, C, N) int32 explicit accumulator, or
    ``stepvec=(mu, barb)`` with barb (B,) int32 and static int mu — the
    gate-bootstrap test vector built in-kernel (acc_a must be None).
    Returns (B, C, N) int32. B is padded to a multiple of b_tile; each tile
    re-streams the full F-block key (compute-bound for tiles >= ~128 at the
    shipped 128-bit set)."""
    assert geom.bits == 32, "pallas rotate implements the 32-bit torus path"
    C, N = geom.C, geom.N
    n = geom.n
    ncols = len(geom.cols)
    B = bara.shape[0]
    if b_tile is None:
        # swept on v5e (benchmarks/rotate_sweep.py): one big tile streams the
        # F-block key from HBM once per batch, and 16 interleaved sub-chains
        # keep the MXU fed through each chain's serial VPU phase (12.6k vs
        # 11.3k rot/s for il=4 under identical load at the 128-bit set);
        # small batches prefer the 256-tile 2-chain interleave
        b_tile, interleave = (4096, 16) if B >= 2048 else (256, 2)
        # VMEM guard: accumulator/out (C*bt*N*4), digit scratch
        # (bt*nb*R*bs), and the double-buffered key block must fit the
        # ~128 MB budget — wider-column geometries (e.g. the 8-col MK key)
        # overflow at the 4096 tile (seen: 134.5M/128M compile error)
        def _vmem_est(bt_):
            return (C * bt_ * N * 4 * (1 if stepvec is not None else 2)
                    + bt_ * geom.nb * geom.R * geom.bs
                    + 2 * geom.D * geom.R * geom.bs * ncols * geom.bs)

        while b_tile > 256 and _vmem_est(b_tile) > 100 * 1024 * 1024:
            b_tile //= 2
            interleave = max(2, interleave // 2)
    elif not interleave:
        interleave = 2
    bt = min(b_tile, max(8, B))
    il = interleave if bt % interleave == 0 and bt >= 8 * interleave else 1
    mu = None
    if stepvec is not None:
        assert acc_a is None
        mu, barb = stepvec
        mu = int(mu)
        (bara, barb), pad = _pad_batch([bara, jnp.asarray(barb, jnp.int32)],
                                       B, bt)
        # (nt, 1, bt): the block (1, 1, bt) covers full trailing dims, which
        # satisfies the Mosaic (8, 128)-divisible-or-full block rule
        init_t = barb.reshape(-1, 1, bt)
        init_spec = pl.BlockSpec((1, 1, bt), lambda b, s: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        (bara, acc_a), pad = _pad_batch([bara, acc_a], B, bt)
        acc_t = jnp.swapaxes(acc_a, 0, 1).reshape(C, -1, bt, N)
        init_t = jnp.swapaxes(acc_t, 0, 1)  # (nt, C, bt, N)
        init_spec = pl.BlockSpec((1, C, bt, N), lambda b, s: (b, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    nt = (B + pad) // bt

    # pad the step axis to a multiple of ``unroll``: zero kernel steps add an
    # exactly-zero delta (digits x 0), so trailing pad steps are identity
    U = max(1, unroll)
    spad = (-n) % U
    if spad:
        fb = jnp.concatenate(
            [fb, jnp.zeros((spad,) + fb.shape[1:], fb.dtype)], axis=0)
        bara = jnp.concatenate(
            [bara, jnp.zeros((bara.shape[0], spad), bara.dtype)], axis=1)
    ns = n + spad

    bara_t = jnp.swapaxes(bara, 0, 1).reshape(ns, nt, bt)
    bara_t = jnp.swapaxes(bara_t, 0, 1)  # (nt, ns, bt)

    kern = functools.partial(
        _rotate_kernel, geom=geom, decomp_length=decomp_length,
        log2_base=log2_base, offset=offset, il=il, stepvec_mu=mu, unroll=U,
        ablate=ablate)

    Rbs = geom.R * geom.bs
    CLbs = ncols * geom.bs
    out = pl.pallas_call(
        kern,
        grid=(nt, ns // U),
        in_specs=[
            pl.BlockSpec((1, ns, bt), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            init_spec,
            pl.BlockSpec((U, geom.D * Rbs, CLbs), lambda b, s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, bt, N), lambda b, s: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt, C, bt, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((il, bt // il, geom.nb * Rbs), jnp.int8)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nt * n * bt * Rbs * CLbs * geom.nb,
            bytes_accessed=n * geom.D * Rbs * CLbs + nt * C * bt * N * 8,
            transcendentals=0,
        ),
    )(bara_t, init_t, fb)

    out = jnp.swapaxes(out, 0, 1).reshape(C, nt * bt, N)
    out = jnp.swapaxes(out, 0, 1)
    return out[:B] if pad else out
