"""Flax SD-v1.4 AutoencoderKL (VAE) with feature taps.

TPU-native re-implementation of the functional VAE passes the reference drives
through diffusers (``modeling/meta_arch/ldm_diffusers.py:284-346``):

- ``Encoder.__call__`` returns the *deterministic* latent (posterior mean x
  scaling factor — reference ``ldm_diffusers.py:303-308``) plus features
  tapped after the ``encoder_block_indices``-th resnet.
- ``Decoder.__call__`` decodes a latent to RGB; features are tapped *before*
  the ``decoder_block_indices``-th resnet (reference ``ldm_diffusers.py:
  315-346``).  ``output_final=False`` skips the conv_out tail.

NHWC layout; images in [-1, 1]; latents are [B, 64, 64, 4].
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import GroupNorm, ResnetBlock2D, Upsample2D

SCALING_FACTOR = 0.18215
BLOCK_OUT_CHANNELS = (128, 256, 512, 512)
LAYERS_PER_BLOCK = 2
LATENT_CHANNELS = 4


class VAEAttention(nn.Module):
    """Single-head attention in the VAE mid block (qkv with bias)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        residual = x
        x = GroupNorm(name="group_norm", epsilon=1e-6, dtype=self.dtype)(x)
        x = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(x)
        # single head as [B, S, 1, C]: the shared attention op (flash kernel
        # on TPU) keeps the [S, S] fp32 scores in VMEM — the inline-einsum
        # form materialized 537 MB of scores per 512x512 crop batch and its
        # softmax lowered to VPU loop fusions (measured ~6.6 ms/crop, the
        # single largest op in the round-2 eval profile)
        from ...ops.attention import dot_product_attention

        out = dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        out = nn.Dense(c, dtype=self.dtype, name="to_out_0")(out)
        return out.reshape(b, h, w, c) + residual


class VAEDownsample(nn.Module):
    """VAE stride-2 conv with asymmetric (0,1) pad (diffusers Downsample2D pad=0)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2), padding="VALID",
            dtype=self.dtype, name="conv",
        )(x)


class MidBlock2D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = ResnetBlock2D(self.channels, use_temb=False, epsilon=1e-6, dtype=self.dtype, name="resnets_0")(x)
        x = VAEAttention(self.channels, dtype=self.dtype, name="attentions_0")(x)
        x = ResnetBlock2D(self.channels, use_temb=False, epsilon=1e-6, dtype=self.dtype, name="resnets_1")(x)
        return x


class Encoder(nn.Module):
    """VAE encoder: image [-1,1] -> scaled latent mean + tapped features."""

    encoder_block_indices: Sequence[int] = ()
    block_out_channels: Sequence[int] = BLOCK_OUT_CHANNELS  # shrink for tests
    dtype: jnp.dtype = jnp.float32
    # 'after': post-resnet, 1-based (the active path, ldm_diffusers.py:284-311)
    # 'in': pre-resnet input, 0-based (the legacy LdmExtractor, ldm.py:419-446)
    tap_type: str = "after"

    @nn.compact
    def __call__(self, images: jax.Array) -> Tuple[jax.Array, list]:
        feats = []
        index = 0
        boc = tuple(self.block_out_channels)
        x = nn.Conv(boc[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(images)
        for bi, out_ch in enumerate(boc):
            for ri in range(LAYERS_PER_BLOCK):
                if self.tap_type == "in" and index in self.encoder_block_indices:
                    feats.append(x)
                x = ResnetBlock2D(out_ch, use_temb=False, epsilon=1e-6, dtype=self.dtype,
                                  name=f"down_blocks_{bi}_resnets_{ri}")(x)
                index += 1
                if self.tap_type == "after" and index in self.encoder_block_indices:
                    feats.append(x)
            if bi != len(boc) - 1:
                x = VAEDownsample(out_ch, dtype=self.dtype,
                                  name=f"down_blocks_{bi}_downsamplers_0")(x)
        x = MidBlock2D(boc[-1], dtype=self.dtype, name="mid_block")(x)
        x = GroupNorm(name="conv_norm_out", epsilon=1e-6, dtype=self.dtype, act="silu")(x)
        x = nn.Conv(2 * LATENT_CHANNELS, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_out")(x)
        moments = nn.Conv(2 * LATENT_CHANNELS, (1, 1), dtype=self.dtype, name="quant_conv")(x)
        # deterministic: posterior mean, not a sample (ldm_diffusers.py:303-308)
        mean = moments[..., :LATENT_CHANNELS]
        latents = mean * SCALING_FACTOR
        assert len(feats) == len(self.encoder_block_indices)
        return latents, feats


class Decoder(nn.Module):
    """VAE decoder: scaled latent -> RGB [-1,1] (+ tapped features)."""

    decoder_block_indices: Sequence[int] = ()
    block_out_channels: Sequence[int] = BLOCK_OUT_CHANNELS  # shrink for tests
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latents: jax.Array, output_final: bool = True):
        feats = []
        index = 0
        up_channels = tuple(reversed(tuple(self.block_out_channels)))  # (512, 512, 256, 128)
        x = latents / SCALING_FACTOR
        x = nn.Conv(LATENT_CHANNELS, (1, 1), dtype=self.dtype, name="post_quant_conv")(x)
        x = nn.Conv(up_channels[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(x)
        x = MidBlock2D(up_channels[0], dtype=self.dtype, name="mid_block")(x)
        for bi, out_ch in enumerate(up_channels):
            for ri in range(LAYERS_PER_BLOCK + 1):
                if index in self.decoder_block_indices:
                    feats.append(x)
                index += 1
                x = ResnetBlock2D(out_ch, use_temb=False, epsilon=1e-6, dtype=self.dtype,
                                  name=f"up_blocks_{bi}_resnets_{ri}")(x)
            if bi != len(up_channels) - 1:
                x = Upsample2D(out_ch, dtype=self.dtype,
                               name=f"up_blocks_{bi}_upsamplers_0")(x)
        if not output_final:
            return None, feats
        x = GroupNorm(name="conv_norm_out", epsilon=1e-6, dtype=self.dtype, act="silu")(x)
        x = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_out")(x)
        return x, feats
