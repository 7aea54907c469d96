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
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 8  # output rows per grid step
CB = 128  # channel tile
NSLOTS = 8  # ring slots: blocks t-3..t+4 stay live for dilation 18


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
        [pl.BlockSpec(memory_space=pltpu.ANY) for _ in embeds]
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
