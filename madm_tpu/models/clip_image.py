"""Flax CLIP vision transformer + ClipAdapter facade.

Reference: ``modeling/meta_arch/clip.py`` — an open_clip ViT-L-14-336 wrapper
providing image/text embeddings for the ``clip_state != 'no'`` conditioning
paths (CLIP image prefix -> PositionalLinear prompts, ``ldm_base.py:844-853``)
and the unused MaskCLIP classifier.  The trained MADM configs never enable
these (``clip_state='no'``), so this module is surface-completeness: a
CLIP-ViT vision tower whose weights convert from HF ``CLIPVisionModel``
checkpoints, and an adapter exposing ``embed_image`` / ``embed_text``.

Architecture (ViT-L/14-336): patch 14, width 1024, 24 layers, 16 heads,
MLP 4096, pre-LN, class token, final LN on CLS + projection to 768.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .clip_text import CLIPEncoderLayer, CLIPTextTransformer, quick_gelu


class CLIPVisionTransformer(nn.Module):
    image_size: int = 336
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    mlp_dim: int = 4096
    out_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array, normalize: bool = False) -> jax.Array:
        """[B, H, W, 3] (CLIP-normalized) -> image embedding [B, out_dim]."""
        b = images.shape[0]
        x = nn.Conv(
            self.width, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), use_bias=False,
            dtype=self.dtype, name="patch_embedding",
        )(images)
        x = x.reshape(b, -1, self.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (self.width,), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.width)).astype(x.dtype), x], axis=1)
        n = x.shape[1]
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         ((self.image_size // self.patch_size) ** 2 + 1, self.width),
                         jnp.float32)
        x = x + pos[None, :n].astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pre_layernorm")(x)
        no_mask = jnp.zeros((n, n), jnp.float32)
        for i in range(self.layers):
            x = CLIPEncoderLayer(self.heads, self.mlp_dim, dtype=self.dtype,
                                 name=f"layers_{i}")(x, no_mask)
        cls_out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="post_layernorm")(x[:, 0])
        emb = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                       name="visual_projection")(cls_out)
        if normalize:
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return emb


CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


class ClipAdapter:
    """embed_image / embed_text facade (reference ``clip.py:96-242``).

    Images arrive [0, 1] NHWC at any size; they are bilinearly resized to the
    CLIP resolution and channel-normalized like open_clip's preprocessing.
    """

    def __init__(self, normalize: bool = False, dtype=jnp.float32):
        self.vision = CLIPVisionTransformer(dtype=dtype)
        self.text = CLIPTextTransformer(dtype=dtype)
        self.normalize = normalize

    @property
    def dim_latent(self) -> int:
        return self.vision.out_dim

    def preprocess(self, images: jax.Array) -> jax.Array:
        b, h, w, c = images.shape
        s = self.vision.image_size
        if (h, w) != (s, s):
            images = jax.image.resize(images, (b, s, s, c), method="bilinear")
        mean = jnp.asarray(CLIP_IMAGE_MEAN)
        std = jnp.asarray(CLIP_IMAGE_STD)
        return (images - mean) / std

    def embed_image(self, params, images: jax.Array) -> jax.Array:
        return self.vision.apply(
            {"params": params}, self.preprocess(images), normalize=self.normalize
        )

    def embed_text(self, params, input_ids: jax.Array) -> jax.Array:
        """Last-hidden-state text features (projection left to the caller:
        MADM only consumes the prompt sequence, ``build_clip_text_embed``)."""
        return self.text.apply({"params": params}, input_ids)
