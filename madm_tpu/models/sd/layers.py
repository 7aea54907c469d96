"""Shared Flax building blocks for the SD-v1.4 VAE and UNet.

Original TPU-first implementation of the layer types the reference consumes
from HuggingFace diffusers (``modeling/meta_arch/ldm_diffusers.py`` drives
``AutoencoderKL`` / ``UNet2DConditionModel`` forward passes functionally).
Everything here is NHWC (TPU conv layout) with a configurable compute dtype;
parameter names intentionally mirror diffusers module names so torch
checkpoints convert mechanically (see ``madm_tpu/checkpoint/converter.py``).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.attention import dot_product_attention
from ...ops.group_norm import group_norm


def timestep_embedding(timesteps: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal timestep embedding, diffusers ``Timesteps`` semantics.

    SD-v1.4 uses flip_sin_to_cos=True, freq_shift=0: output is [cos | sin].
    ``timesteps``: [B] int/float -> [B, dim] float32.
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class GroupNorm(nn.Module):
    """GroupNorm with diffusers defaults (32 groups); NHWC, fp32 statistics.

    Backed by the TPU-friendly reduction in ``madm_tpu.ops.group_norm``
    (flax's group-reshape reduce tiles badly on TPU — see that module);
    ``act`` fuses the following SiLU/ReLU into the normalize pass."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm(x, scale, bias, self.num_groups, self.epsilon, self.act)


class TimestepEmbedding(nn.Module):
    """two-layer MLP lifting the sinusoidal embedding to ``time_embed_dim``."""

    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb: jax.Array) -> jax.Array:
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(t_emb)
        x = nn.silu(x)
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(x)
        return x


class ResnetBlock2D(nn.Module):
    """GN -> SiLU -> conv -> (+temb) -> GN -> SiLU -> conv, with shortcut.

    diffusers ResnetBlock2D ("default" time scale-shift): the projected time
    embedding is added as a per-channel bias after conv1.
    """

    out_channels: int
    use_temb: bool = True
    dtype: jnp.dtype = jnp.float32
    # diffusers: UNet resnets use eps=1e-5, the VAE's use 1e-6
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, temb: Optional[jax.Array] = None) -> jax.Array:
        in_channels = x.shape[-1]
        h = GroupNorm(name="norm1", epsilon=self.epsilon, dtype=self.dtype, act="silu")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv1")(h)
        if self.use_temb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = GroupNorm(name="norm2", epsilon=self.epsilon, dtype=self.dtype, act="silu")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv2")(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class Downsample2D(nn.Module):
    """stride-2 3x3 conv (diffusers Downsample2D with padding=1)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv",
        )(x)


class _DilatedUpConv(nn.Module):
    """nearest-2x + 3x3 conv collapsed into one input-dilated conv.

    Param layout identical to ``nn.Conv(features, (3, 3))`` (kernel
    [3, 3, cin, cout] + bias) so checkpoints are unaffected; the 4x4
    dgrad kernel ``w4 = w3 ⊛ ones(2, 2)`` is formed at trace time
    (per axis: w4 = [w0, w0+w1, w1+w2, w2] — the exact algebraic
    collapse of conv3x3(nearest2x(x)))."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.linear.default_kernel_init,
            (3, 3, cin, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        p = lambda dh, dw: jnp.pad(kernel, ((dh, 1 - dh), (dw, 1 - dw),
                                            (0, 0), (0, 0)))
        w4 = p(0, 0) + p(1, 0) + p(0, 1) + p(1, 1)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w4.astype(self.dtype),
            window_strides=(1, 1), padding=((2, 2), (2, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype,
        )
        return y + bias.astype(self.dtype)


class Upsample2D(nn.Module):
    """2x nearest resize + 3x3 conv (diffusers Upsample2D).

    Default path: the two ops collapse into ONE input-dilated conv
    (``_DilatedUpConv``) — nearest-2x followed by a 3x3 conv touches
    only a 2x2 window of *distinct* input pixels per output, so the
    up-sampled tensor (up to 1 GB/layer at bs 8) is never materialized
    and XLA's conv-transpose lowering skips the duplicated MACs (the
    broadcast+conv path ran 9 MACs per output on 2x2-duplicated
    pixels).  ``MADM_UPSAMPLE=broadcast`` restores the materializing
    path (also used for the non-2x ``out_size`` case)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, out_size: Optional[tuple] = None) -> jax.Array:
        import os

        b, h, w, c = x.shape
        native = out_size is None or out_size == (h * 2, w * 2)
        if native and os.environ.get("MADM_UPSAMPLE", "dilated") == "dilated":
            return _DilatedUpConv(self.out_channels, dtype=self.dtype,
                                  name="conv")(x)
        if native:
            # 2x nearest as broadcast+reshape: avoids the gather/layout
            # copies jax.image.resize introduces (profiled on v5e)
            x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
            x = x.reshape(b, h * 2, w * 2, c)
        else:
            x = jax.image.resize(x, (b, out_size[0], out_size[1], c), method="nearest")
        return nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv")(x)


class _Kernel(nn.Module):
    """Declares a bias-free Dense kernel at ``<name>/kernel`` without the
    matmul, so callers can fuse several projections into one dot while the
    param tree (and checkpoint mapping) stays identical to ``nn.Dense``."""

    shape: tuple

    @nn.compact
    def __call__(self) -> jax.Array:
        # same init as nn.Dense's default (lecun_normal over (in, out))
        return self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32
        )


class Attention(nn.Module):
    """Multi-head attention with optional cross-attention context and LoRA.

    LoRA deltas (reference: peft adapters on to_q/to_k/to_v/to_out.0,
    ``modeling/meta_arch/mtmadise.py:115-127``) are *not* parameters of this
    module; they arrive pre-merged into the kernels by
    ``madm_tpu.models.sd.lora.merge_lora`` so adapter switching is a pytree
    selection, never module mutation.
    """

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32
    attention_impl: Optional[str] = None
    # sow head-averaged attention probabilities into the 'attn_probs'
    # collection (the working replacement for the reference's never-defined
    # ``atte_controller``, cmdise.py:484-485 / mtmadise.py:259)
    capture_attn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, context: Optional[jax.Array] = None) -> jax.Array:
        import os

        # x: [B, S, C]; context: [B, Sk, Ck] or None (self-attention)
        inner = self.num_heads * self.head_dim
        ctx = x if context is None else context
        if (
            context is None
            and x.shape[-1] == inner
            and os.environ.get("MADM_FUSED_QKV", "0") == "1"
        ):
            # self-attention: one [C, 3*inner] matmul instead of three
            # [C, inner] dots over the same activations (wider MXU N-dim,
            # one pass over x).  Params stay at to_q/to_k/to_v kernels so
            # torch checkpoints convert unchanged; the kernel concat is
            # trace-time and XLA folds it once per step.
            ws = [
                _Kernel((x.shape[-1], inner), name=n)()
                for n in ("to_q", "to_k", "to_v")
            ]
            w = jnp.concatenate(ws, axis=1).astype(self.dtype)
            qkv = x.astype(self.dtype) @ w
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        b, s, _ = q.shape
        sk = k.shape[1]
        q = q.reshape(b, s, self.num_heads, self.head_dim)
        k = k.reshape(b, sk, self.num_heads, self.head_dim)
        v = v.reshape(b, sk, self.num_heads, self.head_dim)
        if self.capture_attn:
            # explicit-softmax path so the probabilities exist to tap; the
            # capture is an ablation feature, perf is secondary here
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32,
            ) * (self.head_dim ** -0.5)
            p = jax.nn.softmax(logits, axis=-1)
            self.sow("attn_probs", "probs", p.mean(axis=1))  # [B, Sq, Sk] fp32
            out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)
        else:
            out = dot_product_attention(q, k, v, impl=self.attention_impl)
        out = out.reshape(b, s, inner)
        return nn.Dense(inner, dtype=self.dtype, name="to_out_0")(out)


class FeedForward(nn.Module):
    """GEGLU feed-forward (diffusers FeedForward with geglu activation)."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inner = self.dim * self.mult
        h = nn.Dense(inner * 2, dtype=self.dtype, name="net_0_proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(h)


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn -> GEGLU FF, pre-LayerNorm, residuals."""

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32
    attention_impl: Optional[str] = None
    capture_attn: bool = False  # cross-attention (attn2) probability tap

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        attn = lambda name, cap=False: Attention(
            self.num_heads, self.head_dim, dtype=self.dtype,
            attention_impl=self.attention_impl, capture_attn=cap, name=name,
        )
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        x = x + attn("attn1")(ln("norm1")(x))
        x = x + attn("attn2", cap=self.capture_attn)(ln("norm2")(x), context=context)
        x = x + FeedForward(x.shape[-1], dtype=self.dtype, name="ff")(ln("norm3")(x))
        return x


class Transformer2DModel(nn.Module):
    """Spatial transformer: GN -> 1x1 proj_in -> transformer block -> 1x1 proj_out + residual.

    SD-v1.x uses conv (not linear) projections; in NHWC a 1x1 conv over
    flattened tokens is exactly a Dense, which is what we use — the weight
    converter squeezes the torch conv kernel accordingly.
    """

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32
    attention_impl: Optional[str] = None
    capture_attn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        residual = x
        x = GroupNorm(name="norm", epsilon=1e-6, dtype=self.dtype)(x)
        x = x.reshape(b, h * w, c)
        x = nn.Dense(self.num_heads * self.head_dim, dtype=self.dtype, name="proj_in")(x)
        x = BasicTransformerBlock(
            self.num_heads, self.head_dim, dtype=self.dtype,
            attention_impl=self.attention_impl,
            capture_attn=self.capture_attn, name="transformer_blocks_0",
        )(x, context)
        x = nn.Dense(c, dtype=self.dtype, name="proj_out")(x)
        return x.reshape(b, h, w, c) + residual
