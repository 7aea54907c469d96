"""DAFormer decode head in Flax NHWC (reference: ``modeling/sem_seg_head/daformer_head.py``).

Architecture (as configured by the shipped MADM configs —
``config_files/common/models/mtmadise_multi_lora.py:42-63``):

  per-scale Dense embed (-> 256) -> bilinear upsample to the largest scale ->
  concat -> depthwise-separable ASPP fusion (dilations 1/6/12/18, BN+ReLU) ->
  3x3 bottleneck conv -> dropout -> 1x1 conv_seg.

BatchNorm note: the reference uses per-GPU local BN (DDP with
``broadcast_buffers=False`` — ``config_files/common/train.py:11-12``); we use
flax BatchNorm with a ``batch_stats`` collection, updated per-device without
cross-device sync, which matches that semantics under data parallelism.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def resize_bilinear(x: jax.Array, size) -> jax.Array:
    """align_corners=False bilinear resize (torch F.interpolate semantics).

    ``antialias=False``: torch's F.interpolate does not antialias, but
    jax.image.resize does by default when DOWNSCALING — caught by the
    final_fuse_vae_decoder_feat torch golden (the head's 512->256 s0
    downscale, daformer_head.py:727-729)."""
    b, h, w, c = x.shape
    if (h, w) == tuple(size):
        return x
    return jax.image.resize(
        x, (b, size[0], size[1], c), method="bilinear", antialias=False
    )


def argmax_classes(logits: jax.Array) -> jax.Array:
    """First-index argmax over the trailing (class) dim, as simple reduces.

    ``jnp.argmax`` lowers to a variadic (value, index) reduce that measured
    ~3.5 ms/crop on the lane-padded [B, H, W, C] logits (pad_maximum +
    iota_reduce fusions in the round-3 eval profile); max + first-match
    min-of-iota uses two plain reduces that XLA fuses cleanly.  Ties return
    the first maximal index — identical to jnp.argmax / torch ``.max``.
    Exact for any dtype: comparison against the tensor's own max involves
    no arithmetic, so bf16 logits argmax == fp32-cast logits argmax."""
    c = logits.shape[-1]
    m = jnp.max(logits, axis=-1, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, logits.shape, logits.ndim - 1)
    return jnp.min(jnp.where(logits == m, iota, c), axis=-1).astype(jnp.int32)


class ConvModule(nn.Module):
    """mmcv ConvModule: conv -> BN -> ReLU (bias off under norm)."""

    out_channels: int
    kernel_size: int = 1
    dilation: int = 1
    depthwise: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        pad = self.dilation * (self.kernel_size // 2)
        x = nn.Conv(
            x.shape[-1] if self.depthwise else self.out_channels,
            (self.kernel_size, self.kernel_size),
            kernel_dilation=(self.dilation, self.dilation),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=x.shape[-1] if self.depthwise else 1,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(x)
        return nn.relu(x)


class DepthwiseSeparableConvModule(nn.Module):
    """mmcv DepthwiseSeparableConvModule: depthwise(k3, dil) + pointwise."""

    out_channels: int
    dilation: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = ConvModule(x.shape[-1], 3, dilation=self.dilation, depthwise=True,
                       dtype=self.dtype, name="depthwise_conv")(x, train)
        x = ConvModule(self.out_channels, 1, dtype=self.dtype, name="pointwise_conv")(x, train)
        return x


class _BNShell(nn.Module):
    """Declares flax-``BatchNorm``-identical params/stats without compute.

    Used by the scan-serialized ASPP path so the variable tree (names,
    shapes, init values — init RNGs are path-keyed) is byte-identical to
    the module path's, while the math runs inside a ``lax.scan`` body."""

    feats: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones,
                           (self.feats,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.feats,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.feats,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.feats,), jnp.float32))
        return scale, bias, mean, var


class _ConvModuleShell(nn.Module):
    """Param/stat declaration twin of ``ConvModule`` (conv/kernel + bn/*)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    depthwise: bool

    @nn.compact
    def __call__(self):
        if self.depthwise:
            kshape = (self.kernel_size, self.kernel_size, 1, self.in_channels)
            feats = self.in_channels
        else:
            kshape = (self.kernel_size, self.kernel_size,
                      self.in_channels, self.out_channels)
            feats = self.out_channels

        class _K(nn.Module):
            @nn.compact
            def __call__(self):
                return self.param("kernel", nn.linear.default_kernel_init,
                                  kshape, jnp.float32)

        kernel = _K(name="conv")()
        scale, bias, mean, var = _BNShell(feats, name="bn")()
        return {"kernel": kernel, "scale": scale, "bias": bias,
                "mean_var": (mean, var)}


class _SepShell(nn.Module):
    """Declaration twin of ``DepthwiseSeparableConvModule``."""

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self):
        return {
            "dw": _ConvModuleShell(self.in_channels, self.in_channels, 3,
                                   True, name="depthwise_conv")(),
            "pw": _ConvModuleShell(self.in_channels, self.out_channels, 1,
                                   False, name="pointwise_conv")(),
        }


def _bn_train(xf: jax.Array, scale, bias, eps: float = 1e-5):
    """Train-mode BatchNorm on an fp32 tensor: flax semantics (biased var,
    stats over all non-channel axes).  Returns (normalized fp32, mean, var)."""
    mean = xf.mean(axis=(0, 1, 2))
    var = jnp.maximum(0.0, (xf * xf).mean(axis=(0, 1, 2)) - mean * mean)
    mul = jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    return (xf - mean) * mul + bias.astype(jnp.float32), mean, var


def _bn_stats(x: jax.Array):
    """fp32 batch mean/var of a compute-dtype tensor via dtype'd reductions
    (fp32 accumulators over the raw input — no full-size fp32 tensor exists
    in forward or backward; an explicit ``astype(f32)`` materialized its
    1.0 GB cotangent inside the scan-branch backward, r5 OOM dump).  The
    square is taken in the compute dtype before the fp32 accumulate — in
    fp32 configs (tests) this is exact; in bf16 it shifts var by ~1 ulp²,
    same order as the conv lowering's reassociation."""
    mean = jnp.mean(x, axis=(0, 1, 2), dtype=jnp.float32)
    var = jnp.mean(jnp.square(x), axis=(0, 1, 2), dtype=jnp.float32)
    var = jnp.maximum(0.0, var - mean * mean)
    return mean, var


def _bn_apply_relu(x: jax.Array, mean, var, scale, bias, eps: float = 1e-5):
    """BN-normalize + ReLU applied IN THE COMPUTE DTYPE as a per-channel
    scale+shift (scale/shift formed in fp32).  Keeps every full-size tensor
    in x.dtype — the fp32 normalize chain materialized 3x 1.08 GB
    conv-layout fp32 temps in the scan backward at 512^2 (r5 OOM dump)."""
    mul = jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    shift = bias.astype(jnp.float32) - mean * mul
    return jnp.maximum(x * mul.astype(x.dtype) + shift.astype(x.dtype), 0.0)


def sep_branch_scan(
    x: jax.Array,  # [B,H,W,C] compute dtype
    dilations,  # static tuple of the scanned dilations (e.g. (6, 12, 18))
    stacked: Dict[str, jax.Array],  # {dw,pw} x {kernel,scale,bias}, leading N
    eps: float = 1e-5,
):
    """The dilated DW-separable ASPP branches as ONE ``lax.scan``.

    Sequencing rationale: with the branches as three unrolled remat calls,
    XLA schedules their backwards' recomputes and BN cotangents
    concurrently — measured 2026-08-19 on v5e: ~7.6 GB of simultaneously
    live [512^2, 1024] head-fuse buffers in the bs-1 512^2 train step
    (probe dumps in tools/train_memory_probe.py).  A scan body is a
    separate computation: one branch's working set is live at a time, in
    forward AND backward, by construction.

    The body is a ``lax.switch`` over one closure per STATIC dilation, so
    each branch's depthwise conv is a real ``lax.conv_general_dilated``
    (``rhs_dilation`` must be static).  The first scan version expressed
    the DW conv as nine ``dynamic_slice`` taps on a shared max-dilation
    padded input instead — measured r5 (tools/profile_train.py, bs1 512²):
    the tap accumulation plus its transpose (``dynamic_update_slice`` +
    ``add_any`` cotangent plumbing) made the head backward 753 ms of the
    1252 ms step, ~9 full-tensor HBM passes per branch each way where the
    conv form does ~1.  The switch keeps one shared while-loop body
    (serial by construction, buffers sized by max not sum) with the conv
    speed.  The pointwise conv is a plain dot.  BN follows flax train
    semantics exactly (``_bn_train``; conv accumulation is fp32 internal —
    identical to the ``nn.Conv(feature_group_count=C)`` module path).

    ``MADM_ASPP_SCAN_IMPL`` selects the body (read at trace time):

    - ``taps`` (default): nine ``dynamic_slice`` taps on a shared
      max-dilation padded input (dilation as data, one closure).  The
      MEMORY-floor body — fits bs-1 512² AdamW on 16GB (r4 headline) —
      but its backward's tap-transpose plumbing costs ~753 ms/step (r5
      trace).
    - ``conv``: the switch-over-static-dilations conv body above.  ~9x
      less HBM traffic per branch, but XLA's dilated depthwise conv keeps
      layout-transformed copies live in the branch backward — +1.45G over
      the 16GB AdamW fit at bs1 512² by the AOT memory report, and the
      REAL remote compile rejects it for AdamW *and* adafactor-with-
      momentum (HTTP-500 compile OOM, measured r5 on chip,
      tools/ab_aspp_scan_impl.py).  Usable with ``no_momentum`` (−1.7G),
      with ZeRO-1 sharded optimizer state multi-chip, or at smaller
      crops; the taps body stays the single-chip 512² memory floor.

    Returns (outs [N,B,H,W,Co] in x.dtype, new running stats {.. [N,C]}).
    """
    import os

    b, h, w, c = x.shape
    impl = os.environ.get("MADM_ASPP_SCAN_IMPL", "taps")

    def tail(acc, inp):
        dw_mean, dw_var = _bn_stats(acc)
        ydw = _bn_apply_relu(acc, dw_mean, dw_var,
                             inp["dw_scale"], inp["dw_bias"], eps)
        pw_w = inp["pw_kernel"][0, 0].astype(x.dtype)  # [C, Co]
        z = jax.lax.dot_general(
            ydw, pw_w, (((3,), (0,)), ((), ())),
            preferred_element_type=x.dtype,
        )
        pw_mean, pw_var = _bn_stats(z)
        out = _bn_apply_relu(z, pw_mean, pw_var,
                             inp["pw_scale"], inp["pw_bias"], eps)
        return {"out": out, "dw_mean": dw_mean, "dw_var": dw_var,
                "pw_mean": pw_mean, "pw_var": pw_var}

    # TPU depthwise convs use a batch-in-sublanes layout (8 batch rows fill
    # the 8 sublanes — CLAUDE.md r2 measurement): at b<8 the DW conv runs
    # at b/8 of the VPU.  Chunk H into n=8//b halo'd row blocks stacked on
    # the batch axis so the conv sees batch 8 (halo = max dilation, so one
    # chunking serves every branch).  Measured r5 (bs1 512², adafactor):
    # head bwd conv 366 ms -> the chunked form runs the same conv at full
    # sublane fill; the per-iter chunk build is 2 transient full passes.
    n_chunk = 8 // b if (b < 8 and 8 % b == 0 and h % (8 // b) == 0) else 1
    p_halo = max(dilations)

    def branch(d: int):
        def f(inp):
            dw_w = inp["dw_kernel"].astype(x.dtype)  # [3,3,1,C]
            if n_chunk > 1:
                # the WHOLE branch tail runs on the chunked tensor: BN
                # batch stats over (0,1,2) see the same element multiset
                # chunked or not, and keeping the 1024-wide tensor only in
                # its chunked batch-8 form avoids the [1,512,512,1024]
                # sublane-padded layout copies (2x 1.0G, r5 OOM dump) —
                # only the Co-wide output (4x smaller) is reassembled.
                hc = h // n_chunk
                xp = jnp.pad(x, ((0, 0), (p_halo, p_halo), (0, 0), (0, 0)))
                xch = jnp.concatenate(
                    [jax.lax.dynamic_slice(
                        xp, (0, i * hc, 0, 0), (b, hc + 2 * p_halo, w, c))
                     for i in range(n_chunk)], axis=0)
                ych = jax.lax.conv_general_dilated(
                    xch, dw_w, window_strides=(1, 1),
                    padding=((0, 0), (d, d)), rhs_dilation=(d, d),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=c,
                    preferred_element_type=x.dtype,
                )  # rows: hc + 2*(p_halo - d)
                ych = jax.lax.slice_in_dim(
                    ych, p_halo - d, p_halo - d + hc, axis=1)
                r = tail(ych, inp)
                co = r["out"].shape[-1]
                r["out"] = jnp.transpose(
                    r["out"].reshape(n_chunk, b, hc, w, co), (1, 0, 2, 3, 4)
                ).reshape(b, h, w, co)
                return r
            acc = jax.lax.conv_general_dilated(
                x, dw_w, window_strides=(1, 1),
                padding=((d, d), (d, d)), rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c,
                preferred_element_type=x.dtype,
            )
            return tail(acc, inp)

        return f

    if impl == "conv":
        def body(carry, inp):
            return carry, jax.lax.switch(
                inp["bi"], [branch(d) for d in dilations], inp
            )

        xs = dict(stacked, bi=jnp.arange(len(dilations), dtype=jnp.int32))
    else:
        p = max(dilations)

        def body(carry, inp):
            d = inp["d"]
            # pad INSIDE the body: as a scan-invariant closure the padded
            # tensor (590 MB at 512^2) was held in 4 concurrent backward
            # copies; per-iteration it is transient.  Tap accumulation in
            # the compute dtype (an fp32 accumulator materializes 1.0 GB
            # in the while body at 512^2, measured r4)
            xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
            dw_w = inp["dw_kernel"].astype(x.dtype)  # [3,3,1,C]
            acc = None
            for oi in (-1, 0, 1):
                for oj in (-1, 0, 1):
                    win = jax.lax.dynamic_slice(
                        xp, (0, p + oi * d, p + oj * d, 0), (b, h, w, c)
                    )
                    term = win * dw_w[oi + 1, oj + 1, 0]
                    acc = term if acc is None else acc + term
            return carry, tail(acc, inp)

        xs = dict(stacked, d=jnp.asarray(dilations, jnp.int32))

    _, ys = jax.lax.scan(jax.checkpoint(body), 0.0, xs)
    return ys.pop("out"), ys


class ASPPWrapper(nn.Module):
    """Separable ASPP fusion (``daformer_head.py:414-479``, sep=True, pool=False).

    ``remat`` checkpoints each branch separately: the stride-1 ASPP's
    activations dominate training memory on 16GB v5e, and per-branch remat
    keeps the backward's working set to one branch at a time."""

    channels: int
    dilations: Sequence[int] = (1, 6, 12, 18)
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        import os

        wrap = (lambda m: nn.remat(m, static_argnums=(2,))) if self.remat else (lambda m: m)
        barrier = os.environ.get("MADM_ASPP_BARRIER", "1") != "0"
        # scan-serialized dilated branches (sep_branch_scan): one branch's
        # working set live at a time in fwd AND bwd — the memory-floor path
        # for 512^2 single-chip training.  Variable tree identical to the
        # module path (shells), so checkpoints/tests are unaffected.
        use_scan = (
            self.remat and train
            and os.environ.get("MADM_ASPP_SCAN", "0") == "1"
            and len(self.dilations) >= 3
            and self.dilations[0] == 1
            and all(d > 1 for d in self.dilations[1:])
        )
        if use_scan:
            out0 = wrap(ConvModule)(self.channels, 1, dtype=self.dtype,
                                    name="aspp_0")(x, train)
            shells = [
                _SepShell(x.shape[-1], self.channels, name=f"aspp_{i}")()
                for i in range(1, len(self.dilations))
            ]
            stacked = {
                f"{mod}_{leaf}": jnp.stack([s[mod][leaf] for s in shells])
                for mod in ("dw", "pw")
                for leaf in ("kernel", "scale", "bias")
            }
            outs_s, stats = sep_branch_scan(
                x.astype(self.dtype), tuple(self.dilations[1:]), stacked
            )
            if (self.is_mutable_collection("batch_stats")
                    and not self.is_initializing()):
                m = 0.9  # ConvModule BN momentum
                for j, s in enumerate(shells):
                    for mod, key in (("dw", "dw"), ("pw", "pw")):
                        rm, rv = s[mod]["mean_var"]
                        rm.value = m * rm.value + (1 - m) * stats[f"{key}_mean"][j]
                        rv.value = m * rv.value + (1 - m) * stats[f"{key}_var"][j]
            outs = [out0] + [outs_s[j] for j in range(len(shells))]
            bottleneck = ConvModule(self.channels, 3, dtype=self.dtype,
                                    name="bottleneck")

            def tail(mdl, branch_outs, train):
                return mdl(jnp.concatenate(branch_outs, axis=-1), train)

            return nn.remat(tail, static_argnums=(2,))(
                bottleneck, tuple(outs), train
            )
        outs = []
        for i, d in enumerate(self.dilations):
            xin = x
            if self.remat and outs and barrier:
                # identity barrier chains the branches: without it XLA
                # schedules all rematted branch backwards concurrently and
                # their combined working set OOMs a 16GB v5e (r2).  Each
                # barrier output is, however, its own saved remat residual
                # (3 extra 512 MB copies of x at 512^2) — MADM_ASPP_BARRIER=0
                # drops the chain for memory probes / alternative schedulers.
                xin = jax.lax.optimization_barrier((x, outs[-1]))[0]
            if d == 1:
                outs.append(wrap(ConvModule)(self.channels, 1, dtype=self.dtype,
                                             name=f"aspp_{i}")(xin, train))
            else:
                outs.append(wrap(DepthwiseSeparableConvModule)(
                    self.channels, d, dtype=self.dtype, name=f"aspp_{i}")(xin, train))
        bottleneck = ConvModule(self.channels, 3, dtype=self.dtype,
                                name="bottleneck")
        if self.remat:
            # concat INSIDE the remat: otherwise the 1024-ch concat output
            # (520 MB bf16 at 512^2) is the remat boundary residual saved
            # from forward to backward; rematting concat+bottleneck together
            # saves only the four 256-ch branch outputs instead
            def tail(mdl, branch_outs, train):
                return mdl(jnp.concatenate(branch_outs, axis=-1), train)

            return nn.remat(tail, static_argnums=(2,))(
                bottleneck, tuple(outs), train
            )
        x = jnp.concatenate(outs, axis=-1)
        return bottleneck(x, train)


class SelfAttentionBlock(nn.Module):
    """mmseg ISA self-attention block (reference ``daformer_head.py:35-245``):
    key/query via stacked 1x1 ConvModules (conv+BN+ReLU), value via a plain
    1x1 conv to ``in_channels``, scaled softmax, then an output ConvModule."""

    channels: int  # key/query transform width
    key_query_num_convs: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        b, h, w, c = x.shape

        def project(inp, name, n):
            y = inp
            for i in range(n):
                y = ConvModule(self.channels, 1, dtype=self.dtype,
                               name=f"{name}_{i}")(y, train)
            return y

        q = project(x, "query_project", self.key_query_num_convs)
        k = project(x, "key_project", self.key_query_num_convs)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="value_project")(x)
        q = q.reshape(b, h * w, self.channels)
        k = k.reshape(b, h * w, self.channels)
        v = v.reshape(b, h * w, c)
        sim = jnp.einsum("bqc,bkc->bqk", q, k,
                         preferred_element_type=jnp.float32)
        sim = jax.nn.softmax(sim * self.channels ** -0.5, axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bqk,bkc->bqc", sim, v).reshape(b, h, w, c)
        return ConvModule(c, 1, dtype=self.dtype, name="output_project")(ctx, train)


class ISALayer(nn.Module):
    """Interlaced sparse self-attention (reference ``daformer_head.py:246-338``):
    in-conv, attention over the global grid within each local offset, then
    attention within each local window, with centered padding."""

    channels: int
    isa_channels: int = 128
    down_factor: Tuple[int, int] = (8, 8)
    key_query_num_convs: int = 2
    in_conv_kernel_size: Optional[int] = 1
    out_cat_and_conv: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.in_conv_kernel_size is not None:
            x = ConvModule(self.channels, self.in_conv_kernel_size,
                           dtype=self.dtype, name="in_conv")(x, train)
        residual = x
        n, h, w, c = x.shape
        lh, lw = self.down_factor
        gh, gw = -(-h // lh), -(-w // lw)
        ph, pw = gh * lh - h, gw * lw - w
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (ph // 2, ph - ph // 2),
                            (pw // 2, pw - pw // 2), (0, 0)))
        # global relation: attend across the (gh, gw) grid per local offset
        x = x.reshape(n, gh, lh, gw, lw, c)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(n * lh * lw, gh, gw, c)
        x = SelfAttentionBlock(self.isa_channels, self.key_query_num_convs,
                               dtype=self.dtype, name="global_relation")(x, train)
        # local relation: attend within each (lh, lw) window
        x = x.reshape(n, lh, lw, gh, gw, c)
        x = x.transpose(0, 3, 4, 1, 2, 5).reshape(n * gh * gw, lh, lw, c)
        x = SelfAttentionBlock(self.isa_channels, self.key_query_num_convs,
                               dtype=self.dtype, name="local_relation")(x, train)
        x = x.reshape(n, gh, gw, lh, lw, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n, gh * lh, gw * lw, c)
        if ph or pw:
            x = x[:, ph // 2 : ph // 2 + h, pw // 2 : pw // 2 + w]
        if self.out_cat_and_conv:
            x = ConvModule(self.channels, 1, dtype=self.dtype, name="out_conv")(
                jnp.concatenate([x, residual], axis=-1), train
            )
        return x


class DAFormerHead(nn.Module):
    """DAFormer decode head; logits at the resolution of the largest input.

    __call__ expects the projected feature dict from MultiScaleProjection.
    ``in_keys`` orders the scales (largest first); with MADM's trained config
    the largest is the stride-1 VAE-decoder feature, so logits are full-res.
    """

    in_keys: Sequence[str]  # e.g. ('s0', 's3', 's4', 's5')
    num_classes: int
    channels: int = 256
    embed_dims: int = 256
    dilations: Sequence[int] = (1, 6, 12, 18)
    dropout_ratio: float = 0.1
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    # fusion layer choice (reference ``build_layer``, daformer_head.py:608-643;
    # shipped configs use 'aspp')
    fusion: str = "aspp"
    fusion_kernel_size: int = 3  # for 'conv'/'sep_conv'
    isa_channels: int = 128  # for 'isa'
    # fuse the raw s0 decoder feature into conv_seg at full res via a
    # GN-bottleneck projection (daformer_head.py:73-88,677-698; the head
    # then fuses at half the s0 resolution)
    final_fuse_vae_decoder_feat: bool = False
    # concat an externally-computed attention map to the conv_seg input
    # (daformer_head.py:71-72,682-687)
    concat_attention_to_conv_seg: bool = False

    @nn.compact
    def __call__(
        self,
        features: Dict[str, jax.Array],
        train: bool = False,
        dropout_rng: Optional[jax.Array] = None,
        return_pre_seg: bool = False,
        cross_attention_feat: Optional[jax.Array] = None,
    ) -> jax.Array:
        xs = [features[k] for k in self.in_keys]
        vae_decoder_feat = None
        if self.final_fuse_vae_decoder_feat:
            vae_decoder_feat = xs[0]
            h0, w0 = xs[0].shape[1:3]
            xs[0] = resize_bilinear(xs[0], (h0 // 2, w0 // 2))  # 512 -> 256
        os_size = xs[0].shape[1:3]
        embeds = []
        for i, x in enumerate(xs):
            e = nn.Dense(self.embed_dims, dtype=self.dtype, name=f"embed_{i}")(x)
            embeds.append(resize_bilinear(e, os_size))
        x = jnp.concatenate(embeds, axis=-1)
        if self.fusion == "aspp":
            x = ASPPWrapper(self.channels, self.dilations, dtype=self.dtype,
                            remat=self.remat, name="fuse_layer")(x, train)
        elif self.fusion == "isa":
            x = ISALayer(self.channels, self.isa_channels, dtype=self.dtype,
                         name="fuse_layer")(x, train)
        elif self.fusion == "sep_conv":
            x = DepthwiseSeparableConvModule(
                self.channels, 1, dtype=self.dtype, name="fuse_layer",
            )(x, train)
        elif self.fusion == "conv":
            x = ConvModule(self.channels, self.fusion_kernel_size,
                           dtype=self.dtype, name="fuse_layer")(x, train)
        else:
            raise NotImplementedError(self.fusion)
        if train and self.dropout_ratio > 0 and self.has_rng("dropout"):
            # Dropout2d: drop whole channels (torch nn.Dropout2d semantics)
            x = nn.Dropout(
                self.dropout_ratio, broadcast_dims=(1, 2), deterministic=False,
                rng_collection="dropout", name="dropout",
            )(x)
        if cross_attention_feat is not None:
            assert self.concat_attention_to_conv_seg
            att = resize_bilinear(cross_attention_feat, x.shape[1:3])
            x = jnp.concatenate([x, att.astype(x.dtype)], axis=-1)
        elif vae_decoder_feat is not None:
            # full-res fuse: upsample the fused features back to the s0
            # resolution and concat the projected raw decoder feature
            from .projections import BottleneckBlock

            x = resize_bilinear(x, vae_decoder_feat.shape[1:3])
            proj = BottleneckBlock(32, 64, dtype=self.dtype,
                                   name="vae_decoder_feat_proj")(vae_decoder_feat)
            x = jnp.concatenate([x, proj], axis=-1)
        if return_pre_seg:
            # eval fast path: the caller fuses conv_seg+argmax in Pallas so
            # the lane-padded [.., num_classes] logits never reach HBM
            # (conv_seg params exist from init, which runs the full path)
            return x
        x = nn.Conv(
            self.num_classes, (1, 1), dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01), name="conv_seg",
        )(x)
        return x
