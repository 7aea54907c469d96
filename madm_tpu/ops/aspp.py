"""Pallas TPU kernels for the DAFormer sep-ASPP head's hot path.

Profile (v5e, 512x512 eval crop, bs 8; see tools/profile_eval.py): the XLA
head spends per crop ~9.3 ms in the three dilated depthwise convs (each
re-reads the 512 MB channel-concat and XLA's dilated-window conv is far off
the VPU roofline), ~4.8 ms materializing the embed concat + its layout copy,
and ~8.5 ms in the bottleneck+conv_seg fusion whose 11-channel output is
lane-padded 11->128 (plus a separate padded argmax pass).

Kernels here:

- ``dw_branches``: ALL THREE dilated depthwise convs (+ folded BN + ReLU) in
  one pass, reading the four 256-channel embed maps directly (the 1024-ch
  concat is never materialized).  A rolling ring buffer keeps the live
  44-row window (2*18+8) of one 128-channel tile in VMEM; each grid step
  DMAs 8 new rows and computes 27 shifted fused-multiply-adds — x is read
  from HBM exactly once.
- ``matmul_argmax``: conv_seg (1x1, C->num_classes) + bias + argmax fused:
  reads the 256-ch bottleneck output once and writes int32 ids — the padded
  logits tensor never exists.

The fused eval head that uses them lives in ``fused_head`` below; training
keeps the Flax/XLA path (these kernels are forward-only).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 8  # output rows per grid step
CB = 128  # channel tile
NSLOTS = 8  # ring slots: blocks t-3..t+4 stay live for dilation 18
_APAD = 24  # aspp_fused zero-pad rows (top+bottom): dilation<=18 -> 3 blocks


def _dw_kernel(*refs, dilations: Tuple[int, ...], h: int, w: int,
               n_embeds: int, tiles_per: int, dtype):
    """refs: [e0..e{n-1}, dw_w, scale, bias, out0..out2, ring, sems]."""
    embeds = refs[:n_embeds]
    dw_w, scale, bias = refs[n_embeds : n_embeds + 3]
    outs = refs[n_embeds + 3 : n_embeds + 3 + len(dilations)]
    ring, sems = refs[-2:]

    b = pl.program_id(0)
    ct = pl.program_id(1)
    t = pl.program_id(2)
    nblocks = pl.num_programs(2)

    def start_dma(block):
        # channel tile ct -> embed ct // tiles_per, slice within it
        slot = block % NSLOTS
        for e in range(n_embeds):
            for s in range(tiles_per):
                tile = e * tiles_per + s

                @pl.when((ct == tile) & (block >= 0) & (block < nblocks))
                def _():
                    pltpu.make_async_copy(
                        embeds[e].at[b, pl.ds(block * R, R), :,
                                     pl.ds(s * CB, CB)],
                        ring.at[slot],
                        sems.at[slot],
                    ).start()

    def wait_dma(block):
        @pl.when((block >= 0) & (block < nblocks))
        def _():
            pltpu.make_async_copy(
                ring.at[block % NSLOTS], ring.at[block % NSLOTS],
                sems.at[block % NSLOTS],
            ).wait()

    @pl.when(t == 0)
    def _prologue():
        # blocks 0..3 are needed by t=0; block 4 is the t=1 lookahead
        for blk in range(5):
            start_dma(blk)

    @pl.when(t > 0)
    def _steady():
        start_dma(t + 4)

    @pl.when(t == 0)
    def _wait0():
        for blk in range(4):
            wait_dma(blk)

    @pl.when(t > 0)
    def _waitn():
        wait_dma(t + 3)

    # ---- gather the 7 distinct row-offset slices (offsets 0, +-6, +-12, +-18)
    offsets = sorted({ky * d for d in dilations for ky in (-1, 0, 1)})

    def rows_at(offset: int):
        """[R, w, CB] f32 rows (t*R + j + offset) with zero rows outside."""
        r0 = t * R + offset
        om = offset % R  # static
        blk0 = (t * R + offset) // R  # traced
        if om == 0:
            sl = pl.ds(blk0 % NSLOTS, 1)
            rows = ring[sl][0]
        else:
            a = ring[pl.ds(blk0 % NSLOTS, 1)][0][om:, :, :]
            bpart = ring[pl.ds((blk0 + 1) % NSLOTS, 1)][0][:om, :, :]
            rows = jnp.concatenate([a, bpart], axis=0)
        rows = rows.astype(jnp.float32)
        # zero out-of-image rows (conv zero padding)
        ids = jax.lax.broadcasted_iota(jnp.int32, (R, 1, 1), 0) + r0
        valid = (ids >= 0) & (ids < h)
        return jnp.where(valid, rows, 0.0)

    del offsets
    center = rows_at(0)
    for di, d in enumerate(dilations):
        acc = jnp.zeros((R, w, CB), jnp.float32)
        for ky in (-1, 0, 1):
            # fetch only this dilation's rows: keeps VMEM stack pressure to
            # ~3 live row slices instead of all 7 offsets at once
            rows = center if ky == 0 else rows_at(ky * d)
            for kx in (-1, 0, 1):
                wgt = dw_w[di, ky + 1, kx + 1, :]  # [CB]
                if kx == -1:  # out[:, x] += w * in[:, x - d]
                    shifted = jnp.pad(rows[:, : w - d, :], ((0, 0), (d, 0), (0, 0)))
                elif kx == 1:
                    shifted = jnp.pad(rows[:, d:, :], ((0, 0), (0, d), (0, 0)))
                else:
                    shifted = rows
                acc = acc + shifted * wgt[None, None, :]
        acc = jnp.maximum(acc * scale[di][None, None, :] + bias[di][None, None, :], 0.0)
        outs[di][0] = acc.astype(dtype)


def dw_branches(
    embeds: Sequence[jax.Array],  # each [B, H, W, 256]
    dw_w: jax.Array,  # [n_dil, 3, 3, C] (C = sum of embed channels)
    scale: jax.Array,  # [n_dil, C] folded BN scale
    bias: jax.Array,  # [n_dil, C] folded BN bias
    dilations: Tuple[int, ...] = (6, 12, 18),
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """relu(bn(depthwise_conv_d(concat(embeds)))) for each dilation, without
    materializing the concat.  Returns n_dil arrays [B, H, W, C]."""
    n = len(embeds)
    b, h, w, ec = embeds[0].shape
    c = ec * n
    assert ec % CB == 0 and c == dw_w.shape[-1], (ec, c, dw_w.shape)
    assert h % R == 0 and max(dilations) * 2 + R <= NSLOTS * R
    dtype = embeds[0].dtype
    grid = (b, c // CB, h // R)

    kernel = functools.partial(
        _dw_kernel, dilations=tuple(dilations), h=h, w=w, n_embeds=n,
        tiles_per=ec // CB, dtype=dtype,
    )
    out_specs = [
        pl.BlockSpec((1, R, w, CB), lambda bi, ct, t: (bi, t, 0, ct),
                     memory_space=pltpu.VMEM)
        for _ in dilations
    ]
    in_specs = (
        [pl.BlockSpec(memory_space=pl.ANY) for _ in embeds]
        + [
            pl.BlockSpec((len(dilations), 3, 3, CB),
                         lambda bi, ct, t: (0, 0, 0, ct),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((len(dilations), CB), lambda bi, ct, t: (0, ct),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((len(dilations), CB), lambda bi, ct, t: (0, ct),
                         memory_space=pltpu.VMEM),
        ]
    )
    flops = len(dilations) * 9 * 2 * b * h * w * c
    bytes_accessed = (
        sum(e.size * e.dtype.itemsize for e in embeds)
        + len(dilations) * b * h * w * c * np.dtype(dtype).itemsize
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((b, h, w, c), dtype) for _ in dilations],
        scratch_shapes=[
            pltpu.VMEM((NSLOTS, R, w, CB), dtype),
            pltpu.SemaphoreType.DMA((NSLOTS,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(*embeds, dw_w, scale, bias)


# ------------------------------------------- fused DW+PW ASPP branches
def _aspp_fused_kernel(*refs, dilations: Tuple[int, ...], h: int, w: int,
                       n_embeds: int, tiles_per: int, pc: int, dtype):
    """One grid step computes R output rows of the WHOLE sep-ASPP fuse
    layer: aspp_0 (1x1+BN+ReLU) and every dilated branch's
    depthwise(3x3,d)+BN+ReLU -> pointwise(1x1)+BN+ReLU — with the
    depthwise outputs living only in VMEM.  The XLA head writes/rereads
    each 4.3 GB DW output and the channel concat (~35 GB of HBM traffic
    per batch-8 iter); here each embed row is read exactly once.

    refs: [e0..e{n-1}, zrows, dw_w (BN scale pre-folded), dw_b, pw_w,
    pw_s, pw_b, a0_w, a0_s, a0_b, out, ring, sems].

    Boundary handling: block indices run in a virtual ``_APAD``-row-padded
    space; ring slots whose block falls outside the image are DMA'd from
    the small HBM ``zrows`` zero buffer.  The compute path then never
    bounds-checks, the ring is only ever DMA-written (a VMEM zero-store
    variant loses ~2% — the vector stores serialize against the DMA
    pipeline), and unlike an HBM ``jnp.pad`` of the embeds (which costs
    ~10 ms/iter of un-fusable pad copies in the real graph) the extra HBM
    traffic is 6 zero blocks per batch row.

    Interleaved same-session A/B at B=8 512x512 (chip-state drifts ~15%
    across sessions, so only interleaved numbers are comparable): masked
    boundary 74.4 ms/iter -> zero-DMA 73.5 -> zero-DMA + column-sum DW
    restructure (below) 59.5.
    """
    embeds = refs[:n_embeds]
    zrows = refs[n_embeds]
    dw_w, dw_b, pw_w, pw_s, pw_b, a0_w, a0_s, a0_b = refs[
        n_embeds + 1 : n_embeds + 9
    ]
    out_ref, ring, sems = refs[-3:]

    b = pl.program_id(0)
    t = pl.program_id(1)
    c = ring.shape[-1]
    nct = c // CB
    ec = c // n_embeds

    npad = _APAD // R  # 3 pad blocks each side (virtual)
    nib = h // R  # image blocks
    # output block t needs padded-space blocks t..t+6 (offsets -18..+25
    # shifted by _APAD); slot 8 holds the t+7 lookahead
    n_in_blocks = nib + 2 * npad  # static

    def start_image_dma(block, e):
        pltpu.make_async_copy(
            embeds[e].at[b, pl.ds((block - npad) * R, R), :, :],
            ring.at[block % NSLOTS, :, :, pl.ds(e * ec, ec)],
            sems.at[block % NSLOTS, e],
        ).start()

    def start_zero_dma(block, e):
        pltpu.make_async_copy(
            zrows,
            ring.at[block % NSLOTS, :, :, pl.ds(e * ec, ec)],
            sems.at[block % NSLOTS, e],
        ).start()

    def start_dma(block):  # block indexes the virtual padded row space
        """Fill the slot: image rows when in-bounds, zeros otherwise.
        Either way exactly one DMA signals sems[slot, e] — waits are
        unconditional."""
        if isinstance(block, int):  # prologue: static choice
            for e in range(n_embeds):
                if npad <= block < npad + nib:
                    start_image_dma(block, e)
                else:
                    start_zero_dma(block, e)
            return
        valid = (block >= npad) & (block < npad + nib)
        for e in range(n_embeds):
            @pl.when(valid)
            def _():
                start_image_dma(block, e)

            @pl.when(jnp.logical_not(valid))
            def _():
                start_zero_dma(block, e)

    def wait_dma(block):
        for e in range(n_embeds):
            pltpu.make_async_copy(
                ring.at[block % NSLOTS, :, :, pl.ds(e * ec, ec)],
                ring.at[block % NSLOTS, :, :, pl.ds(e * ec, ec)],
                sems.at[block % NSLOTS, e],
            ).wait()

    @pl.when(t == 0)
    def _prologue():
        for blk in range(min(NSLOTS, n_in_blocks)):  # static blocks
            start_dma(blk)

    @pl.when(t > 0)
    def _steady():
        @pl.when(t + 7 < n_in_blocks)
        def _():
            start_dma(t + 7)

    @pl.when(t == 0)
    def _wait0():
        for blk in range(min(NSLOTS - 1, n_in_blocks)):
            wait_dma(blk)

    @pl.when(t > 0)
    def _waitn():
        wait_dma(t + 6)

    def rows_at(offset: int, ct: int):
        """[R, w, CB] padded-space rows (t*R + j + offset + _APAD) of
        channel tile ct — always in-bounds, no masking."""
        om = offset % R  # static (_APAD % R == 0)
        blk0 = t + (offset + _APAD) // R  # traced
        cs = slice(ct * CB, (ct + 1) * CB)
        if om == 0:
            return ring[pl.ds(blk0 % NSLOTS, 1), :, :, cs][0]
        a = ring[pl.ds(blk0 % NSLOTS, 1), :, :, cs][0][om:, :, :]
        bpart = ring[pl.ds((blk0 + 1) % NSLOTS, 1), :, :, cs][0][:om, :, :]
        return jnp.concatenate([a, bpart], axis=0)

    # ---- aspp_0: pointwise over the concat, accumulated per channel tile
    psum = jnp.zeros((R * w, pc), jnp.float32)
    for ct in range(nct):
        rows = rows_at(0, ct)
        psum = psum + jax.lax.dot_general(
            rows.reshape(R * w, CB), a0_w[ct * CB : (ct + 1) * CB, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
    y = jnp.maximum(psum * a0_s[:][None, :] + a0_b[:][None, :], 0.0)
    out_ref[0, :, :, 0:pc] = y.reshape(R, w, pc).astype(dtype)

    # ---- dilated branches: DW+BN+ReLU in VMEM, PW accumulated per tile
    for di, d in enumerate(dilations):
        psum = jnp.zeros((R * w, pc), jnp.float32)
        for ct in range(nct):
            # column sums first: acc = sum_kx shift_kx(sum_ky w[ky,kx]*rows_ky)
            # — 2 shift passes instead of 6 (the 9 FMAs are unavoidable).
            # rows stay bf16: the f32 promotion fuses into the multiply
            # pass (an explicit astype costs 3 extra VPU passes per tile),
            # and the BN scale is pre-folded into dw_w by the wrapper so
            # only the bias-add pass remains here.
            rows3 = [rows_at(ky * d, ct) for ky in (-1, 0, 1)]
            cols = []
            for kx in (-1, 0, 1):
                cs_ = jnp.zeros((R, w, CB), jnp.float32)
                for ky in (-1, 0, 1):
                    wgt = dw_w[di, ky + 1, kx + 1, ct * CB : (ct + 1) * CB]
                    cs_ = cs_ + rows3[ky + 1] * wgt[None, None, :]
                cols.append(cs_)
            acc = (
                jnp.pad(cols[0][:, : w - d, :], ((0, 0), (d, 0), (0, 0)))
                + cols[1]
                + jnp.pad(cols[2][:, d:, :], ((0, 0), (0, d), (0, 0)))
            )
            acc = jnp.maximum(
                acc + dw_b[di, ct * CB : (ct + 1) * CB][None, None, :], 0.0,
            )
            psum = psum + jax.lax.dot_general(
                acc.astype(dtype).reshape(R * w, CB),
                pw_w[di, ct * CB : (ct + 1) * CB, :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
        y = jnp.maximum(psum * pw_s[di, :][None, :] + pw_b[di, :][None, :], 0.0)
        o0 = (di + 1) * pc
        out_ref[0, :, :, o0 : o0 + pc] = y.reshape(R, w, pc).astype(dtype)


def aspp_fused(
    embeds: Sequence[jax.Array],  # each [B, H, W, ec], same resolution
    dw_w: jax.Array,  # [n_dil, 3, 3, C] f32 depthwise kernels
    dw_s: jax.Array,  # [n_dil, C] folded-BN scale (depthwise)
    dw_b: jax.Array,  # [n_dil, C]
    pw_w: jax.Array,  # [n_dil, C, PC] pointwise kernels
    pw_s: jax.Array,  # [n_dil, PC] folded-BN scale (pointwise)
    pw_b: jax.Array,  # [n_dil, PC]
    a0_w: jax.Array,  # [C, PC] aspp_0 1x1 kernel
    a0_s: jax.Array,  # [PC]
    a0_b: jax.Array,  # [PC]
    dilations: Tuple[int, ...] = (6, 12, 18),
    interpret: bool = False,
) -> jax.Array:
    """The whole separable-ASPP fuse layer (eval BN) in one Pallas pass.

    Returns the branch concat [B, H, W, (1+n_dil)*PC] in branch order
    (aspp_0, then one 256-ch block per dilation) — exactly the
    ``jnp.concatenate(outs)`` the bottleneck conv consumes in
    ``ASPPWrapper`` (models/daformer.py:113; reference
    ``daformer_head.py:455-479``).  The 1024-ch embed concat and the three
    4.3 GB depthwise outputs are never materialized in HBM."""
    n = len(embeds)
    b, h, w, ec = embeds[0].shape
    c = ec * n
    pc = pw_w.shape[-1]
    assert ec % CB == 0 and c == dw_w.shape[-1], (ec, c, dw_w.shape)
    assert h % R == 0 and max(dilations) <= _APAD
    dtype = embeds[0].dtype
    grid = (b, h // R)

    kernel = functools.partial(
        _aspp_fused_kernel, dilations=tuple(dilations), h=h, w=w,
        n_embeds=n, tiles_per=ec // CB, pc=pc, dtype=dtype,
    )
    n_dil = len(dilations)
    # HBM zero rows DMA'd into out-of-image ring slots (== conv zero pad)
    zrows = jnp.zeros((R, w, ec), dtype)
    # fold the depthwise BN scale into the f32 DW taps (exact in f32):
    # saves one VPU scale pass per (branch, tile) inside the kernel
    dw_w = dw_w * dw_s[:, None, None, :]
    in_specs = (
        [pl.BlockSpec(memory_space=pl.ANY) for _ in embeds]
        + [pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8
    )
    oc = (n_dil + 1) * pc
    flops = (n_dil * 9 * 2 + (n_dil + 1) * 2 * pc) * b * h * w * c
    bytes_accessed = (
        sum(e.size * e.dtype.itemsize for e in embeds)
        + b * h * w * oc * np.dtype(dtype).itemsize
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, R, w, oc), lambda bi, t: (bi, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, oc), dtype),
        scratch_shapes=[
            pltpu.VMEM((NSLOTS, R, w, c), dtype),
            pltpu.SemaphoreType.DMA((NSLOTS, n)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(*embeds, zrows, dw_w, dw_b, pw_w, pw_s, pw_b, a0_w, a0_s, a0_b)


_WHALO = 24  # column halo: >= max dilation 18, 8-aligned for the sublane dim


def aspp_fused_tiled(
    embeds: Sequence[jax.Array],
    dw_w: jax.Array,
    dw_s: jax.Array,
    dw_b: jax.Array,
    pw_w: jax.Array,
    pw_s: jax.Array,
    pw_b: jax.Array,
    a0_w: jax.Array,
    a0_s: jax.Array,
    a0_b: jax.Array,
    dilations: Tuple[int, ...] = (6, 12, 18),
    w_tile: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """``aspp_fused`` over overlapping column strips.

    The single-pass kernel's VMEM footprint scales with the image width
    (ring slots + unrolled compute temporaries are full-width rows): the
    proven 512-wide shape uses ~86 MB, the slide path's 1024-wide stitched
    features need ~172 MB vs the 128 MB budget (measured r4 compile OOM).
    The fuse layer is spatially local — receptive field max(dilations)=18
    columns — so each strip of ``w_tile`` output columns is computed
    exactly from a ``w_tile + 2*_WHALO`` input slice:

    - interior strip edges: the kernel's zero x-shift padding corrupts
      only columns < 18 from the strip edge, all inside the trimmed halo;
    - true image edges: the slice starts/ends at the image boundary where
      the kernel's zero padding IS the conv's zero padding (no trim).

    Strip overlap cost at 1024/512: 2x536-wide strips = 4.7% extra
    compute + one XLA slice copy of the embeds per strip.
    """
    b, h, w, ec = embeds[0].shape
    if w <= w_tile:
        return aspp_fused(embeds, dw_w, dw_s, dw_b, pw_w, pw_s, pw_b,
                          a0_w, a0_s, a0_b, dilations, interpret=interpret)
    assert w_tile % 8 == 0 and w_tile > 2 * _WHALO
    outs = []
    for o_lo in range(0, w, w_tile):
        o_hi = min(o_lo + w_tile, w)
        s_lo = max(o_lo - _WHALO, 0)
        s_hi = min(o_hi + _WHALO, w)
        strip = [e[:, :, s_lo:s_hi, :] for e in embeds]
        out = aspp_fused(strip, dw_w, dw_s, dw_b, pw_w, pw_s, pw_b,
                         a0_w, a0_s, a0_b, dilations, interpret=interpret)
        outs.append(out[:, :, o_lo - s_lo : o_hi - s_lo, :])
    return jnp.concatenate(outs, axis=2)


# --------------------------------------------------------------- argmax head
def _argmax_kernel(x_ref, w_ref, b_ref, o_ref, *, valid: int):
    x = x_ref[0]  # [R, W, C]
    r, w_, c = x.shape
    logits = jax.lax.dot_general(
        x.reshape(r * w_, c), w_ref[:, :],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[:, :]
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < valid, logits, -jnp.inf)
    # first-occurrence argmax (jnp.argmax semantics) via max + min-index
    m = jnp.max(logits, axis=-1, keepdims=True)
    idx = jnp.min(jnp.where(logits == m, col, valid), axis=-1)
    o_ref[0] = idx.astype(jnp.int32).reshape(r, w_)


def matmul_argmax(x: jax.Array, w: jax.Array, bias: jax.Array,
                  interpret: bool = False) -> jax.Array:
    """argmax(x @ w + bias) over the last dim — the eval conv_seg+argmax,
    fused so the lane-padded logits tensor never reaches HBM.

    x: [B, H, W, C]; w: [C, num_classes]; returns int32 [B, H, W]."""
    b, h, w_, c = x.shape
    nc = w.shape[-1]
    nc_pad = max(128, -(-nc // 128) * 128)
    wp = jnp.pad(w.astype(jnp.float32), ((0, 0), (0, nc_pad - nc)))
    bp = jnp.pad(bias.astype(jnp.float32), ((0, nc_pad - nc),)).reshape(1, nc_pad)
    rows = 16
    grid = (b, h // rows)
    return pl.pallas_call(
        functools.partial(_argmax_kernel, valid=nc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows, w_, c), lambda bi, t: (bi, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, nc_pad), lambda bi, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc_pad), lambda bi, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, w_), lambda bi, t: (bi, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w_), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w_ * c * nc_pad,
            bytes_accessed=x.size * x.dtype.itemsize + b * h * w_ * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, wp, bp)


# ------------------------------------------------------------ fused head
def _fold_bn(bn_params: Dict, bn_stats: Dict, eps: float = 1e-5):
    """BatchNorm (eval) -> per-channel scale/bias."""
    s = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)
    return s, bn_params["bias"] - bn_stats["mean"] * s


def fused_head_forward(
    head_params: Dict,
    head_bn: Dict,
    features: Dict[str, jax.Array],
    in_keys: Sequence[str],
    num_classes: int,
    dilations: Sequence[int] = (1, 6, 12, 18),
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Eval-only DAFormer head forward returning argmax ids [B, H, W].

    Numerically matches ``DAFormerHead.__call__`` with
    ``use_running_average`` BN (same param tree), restructured for TPU:

    - per-scale Dense embeds + bilinear resize (XLA),
    - the 1x1 ``aspp_0`` branch is computed per scale at its LOW resolution
      and bilinearly upsampled afterwards — exact because resize and the
      channel-wise matmul are both linear and BN is affine per channel,
    - ``dw_branches`` pallas kernel for the three dilated depthwise convs,
    - pointwise convs as per-embed matmul sums (no concat),
    - bottleneck 3x3 conv (XLA, MXU-bound at roofline),
    - ``matmul_argmax`` for conv_seg.
    """
    assert tuple(dilations) == (1, 6, 12, 18), dilations
    fuse_p = head_params["fuse_layer"]
    fuse_bn = head_bn["fuse_layer"]

    xs = [features[k] for k in in_keys]
    os_size = xs[0].shape[1:3]
    b = xs[0].shape[0]
    h, w = os_size

    # --- per-scale embeds at native resolution
    embeds_low = []
    for i, x in enumerate(xs):
        p = head_params[f"embed_{i}"]
        e = (x.astype(compute_dtype) @ p["kernel"].astype(compute_dtype)
             + p["bias"].astype(compute_dtype))
        embeds_low.append(e)

    # --- full-res embeds -> ONE concat (XLA lays this out once; the
    # per-embed "concat-free" variant was measured slower: the 12-way
    # depthwise/pointwise split costs more than the concat it saves)
    embeds = [
        e if e.shape[1:3] == (h, w)
        else jax.image.resize(e, (b, h, w, e.shape[-1]), method="bilinear")
        for e in embeds_low
    ]
    xcat = jnp.concatenate(embeds, axis=-1)

    # --- aspp_0: 1x1 conv + BN + ReLU
    s0, b0 = _fold_bn(fuse_p["aspp_0"]["bn"], fuse_bn["aspp_0"]["bn"])
    w0 = fuse_p["aspp_0"]["conv"]["kernel"][0, 0]  # [1024, 256]
    aspp0 = jnp.maximum(
        (xcat @ w0.astype(compute_dtype)) * s0.astype(compute_dtype)
        + b0.astype(compute_dtype), 0
    ).astype(compute_dtype)

    # --- dilated depthwise + pointwise branches
    import os

    dil = (6, 12, 18)
    names = ["aspp_1", "aspp_2", "aspp_3"]
    dw_impl = os.environ.get("MADM_DW_IMPL", "xla")
    branches = [aspp0]
    for n, d in zip(names, dil):
        dwk = fuse_p[n]["depthwise_conv"]["conv"]["kernel"]  # [3,3,1,C]
        s_dw, b_dw = _fold_bn(
            fuse_p[n]["depthwise_conv"]["bn"], fuse_bn[n]["depthwise_conv"]["bn"]
        )
        # the optimization_barrier chains the branches — XLA otherwise
        # schedules all three depthwise convs before any pointwise matmul
        # and the three 4 GB DW outputs coexist (OOM at batch 8)
        if len(branches) > 1:
            xcat = jax.lax.optimization_barrier((xcat, branches[-1]))[0]
        if dw_impl == "pallas":
            dwo = dw_branches(
                [xcat], dwk[None, :, :, 0, :].astype(jnp.float32),
                s_dw[None].astype(jnp.float32), b_dw[None].astype(jnp.float32),
                (d,), interpret=interpret,
            )[0]
        else:
            dwo = jax.lax.conv_general_dilated(
                xcat, dwk.astype(compute_dtype),
                window_strides=(1, 1), padding=((d, d), (d, d)),
                rhs_dilation=(d, d), feature_group_count=xcat.shape[-1],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=compute_dtype,
            )
            dwo = jnp.maximum(
                dwo * s_dw.astype(compute_dtype) + b_dw.astype(compute_dtype), 0
            )
        pw = fuse_p[n]["pointwise_conv"]
        s_pw, b_pw = _fold_bn(pw["bn"], fuse_bn[n]["pointwise_conv"]["bn"])
        wk = pw["conv"]["kernel"][0, 0].astype(compute_dtype)  # [C, 256]
        out = jnp.maximum(
            (dwo @ wk) * s_pw.astype(compute_dtype) + b_pw.astype(compute_dtype), 0
        )
        branches.append(out.astype(compute_dtype))

    x = jnp.concatenate(branches, axis=-1)

    # --- bottleneck 3x3 conv + BN + ReLU (XLA, at roofline)
    bk = fuse_p["bottleneck"]
    s, bb = _fold_bn(bk["bn"], fuse_bn["bottleneck"]["bn"])
    y = jax.lax.conv_general_dilated(
        x, bk["conv"]["kernel"].astype(compute_dtype),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=compute_dtype,
    )
    y = jnp.maximum(y * s.astype(compute_dtype) + bb.astype(compute_dtype), 0)

    # --- conv_seg + argmax (pallas)
    cs = head_params["conv_seg"]
    return matmul_argmax(
        y.astype(compute_dtype), cs["kernel"][0, 0], cs["bias"],
        interpret=interpret,
    )


def aspp_head_forward(
    head_params: Dict,
    head_bn: Dict,
    features: Dict[str, jax.Array],
    in_keys: Sequence[str],
    num_classes: int,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Eval DAFormer head with the whole sep-ASPP fuse layer in ONE Pallas
    pass (``aspp_fused``), returning argmax ids [B, H, W].

    Pipeline: per-scale Dense embeds + bilinear upsample (XLA) ->
    ``aspp_fused`` (aspp_0 + the three DW+BN+ReLU+PW branches; the 1024-ch
    embed concat, its batch-in-sublanes layout copy and the three 4.3 GB
    depthwise outputs never reach HBM) -> bottleneck 3x3 conv + conv_seg
    (one XLA convolution fusion, MXU at roofline) -> ``argmax_classes``.

    Numerics match ``DAFormerHead.__call__`` with running-average BN (same
    param tree; BN folded to per-channel scale/bias in fp32)."""
    from ..models.daformer import argmax_classes, resize_bilinear

    fuse_p = head_params["fuse_layer"]
    fuse_bn = head_bn["fuse_layer"]
    xs = [features[k] for k in in_keys]
    os_size = xs[0].shape[1:3]
    b = xs[0].shape[0]
    h, w = os_size

    embeds = []
    for i, x in enumerate(xs):
        p = head_params[f"embed_{i}"]
        e = (x.astype(compute_dtype) @ p["kernel"].astype(compute_dtype)
             + p["bias"].astype(compute_dtype))
        embeds.append(resize_bilinear(e, os_size))

    dil = (6, 12, 18)
    s_a0, b_a0 = _fold_bn(fuse_p["aspp_0"]["bn"], fuse_bn["aspp_0"]["bn"])
    dw_w, dw_s, dw_b, pw_w, pw_s, pw_b = [], [], [], [], [], []
    for n in ("aspp_1", "aspp_2", "aspp_3"):
        dwc = fuse_p[n]["depthwise_conv"]
        s_dw, b_dw = _fold_bn(dwc["bn"], fuse_bn[n]["depthwise_conv"]["bn"])
        dw_w.append(dwc["conv"]["kernel"][:, :, 0, :])  # [3,3,C]
        dw_s.append(s_dw)
        dw_b.append(b_dw)
        pwc = fuse_p[n]["pointwise_conv"]
        s_pw, b_pw = _fold_bn(pwc["bn"], fuse_bn[n]["pointwise_conv"]["bn"])
        pw_w.append(pwc["conv"]["kernel"][0, 0])  # [C, 256]
        pw_s.append(s_pw)
        pw_b.append(b_pw)

    fused = aspp_fused_tiled(
        embeds,
        jnp.stack(dw_w).astype(jnp.float32),
        jnp.stack(dw_s).astype(jnp.float32),
        jnp.stack(dw_b).astype(jnp.float32),
        jnp.stack(pw_w).astype(compute_dtype),
        jnp.stack(pw_s).astype(jnp.float32),
        jnp.stack(pw_b).astype(jnp.float32),
        fuse_p["aspp_0"]["conv"]["kernel"][0, 0].astype(compute_dtype),
        s_a0.astype(jnp.float32),
        b_a0.astype(jnp.float32),
        dil,
        w_tile=int(os.environ.get("MADM_ASPP_WTILE", "512")),
        interpret=interpret,
    )

    bk = fuse_p["bottleneck"]
    s_bk, b_bk = _fold_bn(bk["bn"], fuse_bn["bottleneck"]["bn"])
    y = jax.lax.conv_general_dilated(
        fused, bk["conv"]["kernel"].astype(compute_dtype),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=compute_dtype,
    )
    y = jnp.maximum(
        y * s_bk.astype(compute_dtype) + b_bk.astype(compute_dtype), 0
    )
    cs = head_params["conv_seg"]
    tail = os.environ.get("MADM_ASPP_TAIL", "nchw")
    if tail == "pallas":
        # conv_seg + argmax in one Pallas pass.  Measured r3 bs8: LOSES
        # (21.20 vs 21.27 crops/s) — pulling conv_seg out of XLA forces
        # the bottleneck fusion out of its batch-in-sublanes output
        # layout, which costs more than the argmax saves.  Kept opt-in.
        return matmul_argmax(
            y, cs["kernel"][0, 0].astype(compute_dtype), cs["bias"],
            interpret=interpret,
        )
    if tail == "nchw":
        # conv_seg emitting NCHW: the argmax then reduces over a MAJOR
        # axis (11 sequential vector passes) instead of lane-shuffle
        # reductions on the 11->128 lane-padded NHWC logits, which
        # measured 7.5 ms/iter at bs8 (daformer.argmax_classes)
        logits = jax.lax.conv_general_dilated(
            y, cs["kernel"].astype(compute_dtype),
            window_strides=(1, 1), padding=((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NCHW"),
            preferred_element_type=compute_dtype,
        ) + cs["bias"].astype(compute_dtype)[None, :, None, None]
        nc = logits.shape[1]
        m = jnp.max(logits, axis=1, keepdims=True)
        cls = jax.lax.broadcasted_iota(jnp.int32, (1, nc, 1, 1), 1)
        ids = jnp.min(jnp.where(logits == m, cls, nc), axis=1)
        return ids.astype(jnp.int32)
    logits = (
        jax.lax.conv_general_dilated(
            y, cs["kernel"].astype(compute_dtype),
            window_strides=(1, 1), padding=((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=compute_dtype,
        )
        + cs["bias"].astype(compute_dtype)
    )
    return argmax_classes(logits)
