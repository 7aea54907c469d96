"""Flax SD-v1.4 UNet2DCondition with segmentation feature taps.

TPU-native re-implementation of the functional UNet forward the reference
builds over diffusers (``modeling/meta_arch/ldm_diffusers.py:454-616`` and the
up-block walkers at ``:363-451``).  Differences from a plain SD UNet that MADM
depends on and which are reproduced here:

- **feature taps**: up-block resnets are numbered globally 0..11; for each
  index in ``unet_block_indices`` the hidden state is recorded either before
  the resnet (``'in'``) or after the resnet(+attention) (``'after'``).  The
  shipped configs tap {5, 8, 11} 'after' -> [B,16,16,1280], [B,32,32,640],
  [B,64,64,320].
- **residual time embedding**: an optional learned [B, 1280] vector added to
  the time embedding (``ldm_diffusers.py:506-509``), produced by the prompt/
  time generator.
- **static shapes**: 64x64 latents divide evenly by 2^3, so no dynamic
  ``upsample_size`` path is needed (XLA requires static shapes anyway).

Layout: NHWC.  ``sample``: [B, 64, 64, 4]; returns (eps prediction, taps).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    Downsample2D,
    GroupNorm,
    ResnetBlock2D,
    TimestepEmbedding,
    Transformer2DModel,
    Upsample2D,
    timestep_embedding,
)

BLOCK_OUT_CHANNELS = (320, 640, 1280, 1280)
LAYERS_PER_BLOCK = 2
NUM_HEADS = 8
CROSS_ATTENTION_DIM = 768
TIME_EMBED_DIM = 1280
IN_CHANNELS = 4
OUT_CHANNELS = 4

# Channels/strides of the 12 up-block resnet tap points ('after' type).
UP_TAP_CHANNELS = (1280,) * 3 + (1280,) * 3 + (640,) * 3 + (320,) * 3
UP_TAP_STRIDES = (64,) * 3 + (32,) * 3 + (16,) * 3 + (8,) * 3  # vs 512 input


class CrossAttnDownBlock(nn.Module):
    out_channels: int
    num_layers: int = LAYERS_PER_BLOCK
    add_downsample: bool = True
    dtype: jnp.dtype = jnp.float32
    attention_impl: Optional[str] = None

    capture_attn: bool = False

    @nn.compact
    def __call__(self, x, temb, context):
        # context: [B,S,D] shared, or [num_layers,B,S,D] per-cross-attn-layer
        # (multi_layer_prompt, ldm_base.py:649-651 + ldm_diffusers.py:28-29)
        skips = []
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, dtype=self.dtype, name=f"resnets_{i}")(x, temb)
            x = Transformer2DModel(
                NUM_HEADS, self.out_channels // NUM_HEADS, dtype=self.dtype,
                attention_impl=self.attention_impl,
                capture_attn=self.capture_attn, name=f"attentions_{i}",
            )(x, context if context.ndim == 3 else context[i])
            skips.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype, name="downsamplers_0")(x)
            skips.append(x)
        return x, skips


class DownBlock(nn.Module):
    out_channels: int
    num_layers: int = LAYERS_PER_BLOCK
    add_downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        skips = []
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, dtype=self.dtype, name=f"resnets_{i}")(x, temb)
            skips.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype, name="downsamplers_0")(x)
            skips.append(x)
        return x, skips


class MidBlockCrossAttn(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32
    attention_impl: Optional[str] = None

    capture_attn: bool = False

    @nn.compact
    def __call__(self, x, temb, context):
        x = ResnetBlock2D(self.channels, dtype=self.dtype, name="resnets_0")(x, temb)
        x = Transformer2DModel(
            NUM_HEADS, self.channels // NUM_HEADS, dtype=self.dtype,
            attention_impl=self.attention_impl,
            capture_attn=self.capture_attn, name="attentions_0",
        )(x, context if context.ndim == 3 else context[0])
        x = ResnetBlock2D(self.channels, dtype=self.dtype, name="resnets_1")(x, temb)
        return x


class UpBlock(nn.Module):
    """UpBlock2D / CrossAttnUpBlock2D with global-index feature taps."""

    out_channels: int
    has_cross_attention: bool
    add_upsample: bool
    start_index: int  # global index of this block's first resnet (0, 3, 6, 9)
    num_layers: int = LAYERS_PER_BLOCK + 1
    unet_block_indices: Sequence[int] = ()
    unet_block_indices_type: str = "after"
    dtype: jnp.dtype = jnp.float32
    attention_impl: Optional[str] = None
    capture_attn: bool = False

    @nn.compact
    def __call__(self, x, skips, temb, context):
        taps = []
        for i in range(self.num_layers):
            x = jnp.concatenate([x, skips[-(i + 1)]], axis=-1)
            gidx = self.start_index + i
            if self.unet_block_indices_type == "in" and gidx in self.unet_block_indices:
                taps.append(x)
            x = ResnetBlock2D(self.out_channels, dtype=self.dtype, name=f"resnets_{i}")(x, temb)
            if self.has_cross_attention:
                x = Transformer2DModel(
                    NUM_HEADS, self.out_channels // NUM_HEADS, dtype=self.dtype,
                    attention_impl=self.attention_impl,
                    capture_attn=self.capture_attn, name=f"attentions_{i}",
                )(x, context if context.ndim == 3 else context[i])
            if self.unet_block_indices_type == "after" and gidx in self.unet_block_indices:
                taps.append(x)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x)
        return x, taps


class UNet2DCondition(nn.Module):
    """SD-v1.4 conditional UNet with MADM feature taps.

    __call__(sample [B,H/8,W/8,Cin], timesteps [B], context [B,77,768],
             res_time_embedding [B,1280]|None)
        -> (eps [B,H/8,W/8,4], taps list[NHWC])
    """

    in_channels: int = IN_CHANNELS
    unet_block_indices: Sequence[int] = (5, 8, 11)
    unet_block_indices_type: str = "after"
    block_out_channels: Sequence[int] = BLOCK_OUT_CHANNELS  # shrink for tests
    dtype: jnp.dtype = jnp.float32
    attention_impl: Optional[str] = None
    remat: bool = False
    # cross-attention probability taps (working replacement for the
    # reference's broken attention-features path — its config stores
    # attention_features_res/location but nothing ever fills
    # ``attention_features``, feature_extractor.py:287-396).  ``res`` uses
    # the reference's 512-input naming: 64 = stride-8 level, 32 = stride-16,
    # 16 = stride-32, 8 = the mid block's stride-64 level.
    attention_features_res: Sequence[int] = ()
    attention_features_location: Sequence[str] = ()  # 'down' | 'mid' | 'up'

    def _capture(self, location: str, res: int) -> bool:
        return (
            location in tuple(self.attention_features_location)
            and res in tuple(self.attention_features_res)
        )

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,
        timesteps: jax.Array,
        context: jax.Array,
        res_time_embedding: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, list]:
        assert self.unet_block_indices_type in {"in", "after"}
        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        boc = tuple(self.block_out_channels)
        t_emb = timestep_embedding(timesteps, boc[0]).astype(self.dtype)
        # TIME_EMBED_DIM == boc[0] * 4 == 1280 for SD-v1.4
        temb = TimestepEmbedding(boc[0] * 4, dtype=self.dtype, name="time_embedding")(t_emb)
        if res_time_embedding is not None:
            if res_time_embedding.ndim == 3:  # [B, 1, 1280]
                res_time_embedding = res_time_embedding[:, 0]
            temb = temb + res_time_embedding.astype(temb.dtype)

        context = context.astype(self.dtype)
        # multi_layer_prompt: context [16,B,77,768] — one row per cross-attn
        # layer in the reference's layer order (ldm_diffusers.py:28-29:
        # IN01 IN02 IN04 IN05 IN07 IN08 MID OUT03..OUT11); blocks consume
        # their slice in encounter order
        per_layer = context.ndim == 4
        coff = 0

        maybe_remat = (lambda m: nn.remat(m)) if self.remat else (lambda m: m)

        x = nn.Conv(boc[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(sample.astype(self.dtype))

        skips = [x]
        for bi, out_ch in enumerate(boc):
            is_final = bi == len(boc) - 1
            if not is_final:
                ctx = context[coff:coff + LAYERS_PER_BLOCK] if per_layer else context
                coff += LAYERS_PER_BLOCK
                x, s = maybe_remat(CrossAttnDownBlock)(
                    out_ch, add_downsample=True, dtype=self.dtype,
                    attention_impl=self.attention_impl,
                    capture_attn=self._capture("down", 64 >> bi),
                    name=f"down_blocks_{bi}",
                )(x, temb, ctx)
            else:
                x, s = maybe_remat(DownBlock)(
                    out_ch, add_downsample=False, dtype=self.dtype, name=f"down_blocks_{bi}",
                )(x, temb)
            skips.extend(s)

        ctx = context[coff:coff + 1] if per_layer else context
        coff += 1
        x = maybe_remat(MidBlockCrossAttn)(
            boc[-1], dtype=self.dtype,
            attention_impl=self.attention_impl,
            capture_attn=self._capture("mid", 8),
            name="mid_block",
        )(x, temb, ctx)

        taps = []
        up_channels = tuple(reversed(boc))  # (1280, 1280, 640, 320)
        for bi, out_ch in enumerate(up_channels):
            is_final = bi == len(up_channels) - 1
            blk_skips = skips[-(LAYERS_PER_BLOCK + 1):]
            skips = skips[: -(LAYERS_PER_BLOCK + 1)]
            has_cross = bi != 0
            if has_cross:
                ctx = context[coff:coff + LAYERS_PER_BLOCK + 1] if per_layer else context
                coff += LAYERS_PER_BLOCK + 1
            else:
                ctx = context
            x, t = maybe_remat(UpBlock)(
                out_channels=out_ch,
                has_cross_attention=has_cross,
                add_upsample=not is_final,
                start_index=bi * (LAYERS_PER_BLOCK + 1),
                unet_block_indices=tuple(self.unet_block_indices),
                unet_block_indices_type=self.unet_block_indices_type,
                dtype=self.dtype,
                attention_impl=self.attention_impl,
                capture_attn=self._capture("up", 8 << bi) and has_cross,
                name=f"up_blocks_{bi}",
            )(x, blk_skips, temb, ctx)
            taps.extend(t)

        assert len(taps) == len(self.unet_block_indices)

        x = GroupNorm(name="conv_norm_out", dtype=self.dtype, act="silu")(x)
        x = nn.Conv(OUT_CHANNELS, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_out")(x)
        return x, taps
