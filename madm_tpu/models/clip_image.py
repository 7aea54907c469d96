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
    def __call__(
        self,
        images: jax.Array,
        normalize: bool = False,
        return_spatial: bool = False,
        num_mask_tokens: int = 0,
        attn_mask: Optional[jax.Array] = None,
    ):
        """[B, H, W, 3] (CLIP-normalized) -> image embedding [B, out_dim].

        ``return_spatial``: also return per-patch encodings [B, g, g, out_dim]
        (reference ``clip.py:181-226`` spatial image embeddings).
        ``num_mask_tokens`` + ``attn_mask``: MaskCLIP forward — Q copies of
        the (pos-embedded, pre-LN'd) class token prepended, attention
        restricted by an additive [B,1,N,N] mask; returns the projected mask
        tokens [B, Q, out_dim] (reference ``clip.py:263-292``)."""
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
        if num_mask_tokens:
            mask_tok = jnp.broadcast_to(
                x[:, 0:1], (b, num_mask_tokens, self.width)
            )
            x = jnp.concatenate([mask_tok, x], axis=1)
            n = x.shape[1]
        mask = attn_mask if attn_mask is not None else jnp.zeros((n, n), jnp.float32)
        for i in range(self.layers):
            x = CLIPEncoderLayer(self.heads, self.mlp_dim, dtype=self.dtype,
                                 name=f"layers_{i}")(x, mask)
        ln_post = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="post_layernorm")
        proj = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                        name="visual_projection")
        if num_mask_tokens:
            return proj(ln_post(x[:, :num_mask_tokens]))
        if return_spatial:
            all_tok = proj(ln_post(x))
            emb = all_tok[:, 0]
            g = self.image_size // self.patch_size
            enc = all_tok[:, 1:].reshape(b, g, g, self.out_dim)
            if normalize:
                emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
            return emb, enc
        emb = proj(ln_post(x[:, 0]))
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

    def embed_image_spatial(self, params, images: jax.Array):
        """(image_embed [B,D], image_encodings [B,H/16,W/16,D]) — the
        reference's spatial CLIP embeddings (``clip.py:181-242``): per-patch
        tokens reshaped to the grid and bilinearly resized to stride 16 of
        the *original* image size."""
        b, h, w, _ = images.shape
        emb, enc = self.vision.apply(
            {"params": params}, self.preprocess(images),
            normalize=self.normalize, return_spatial=True,
        )
        enc = jax.image.resize(
            enc, (b, h // 16, w // 16, enc.shape[-1]), method="bilinear"
        )
        return emb, enc

    def embed_text(self, params, input_ids: jax.Array) -> jax.Array:
        """Last-hidden-state text features (projection left to the caller:
        MADM only consumes the prompt sequence, ``build_clip_text_embed``)."""
        return self.text.apply({"params": params}, input_ids)


def ensemble_logits_with_labels(logits: jax.Array, labels, method: str = "max"):
    """Collapse per-synonym logits to per-class (reference
    ``helper.py:49-80``): ``labels`` is a list of synonym lists; the last
    logits dim concatenates all synonyms in order."""
    lens = [len(l) for l in labels]
    assert logits.shape[-1] == sum(lens), (logits.shape, lens)
    out, start = [], 0
    for n in lens:
        seg = logits[..., start : start + n]
        out.append(seg.max(axis=-1) if method == "max" else seg.mean(axis=-1))
        start += n
    return jnp.stack(out, axis=-1)


class MaskCLIP(ClipAdapter):
    """Masked-attention CLIP classification (reference ``clip.py:250-372``,
    MaskCLIP arXiv 2208.08984; unused by the shipped MADM configs).

    Per mask query, a copy of the class token attends only to image patches
    the (sigmoided) mask covers; the projected mask tokens are scored against
    text embeddings with the CLIP logit scale."""

    def __init__(self, dtype=jnp.float32):
        super().__init__(normalize=False, dtype=dtype)

    def encode_image_with_mask(self, params, images: jax.Array, masks: jax.Array):
        """images [B,H,W,3] in [0,1]; masks [B,Q,H',W'] (pre-sigmoid) ->
        mask embeddings [B,Q,D]."""
        images = self.preprocess(images)
        b, s, _, _ = images.shape
        q = masks.shape[1]
        p = self.vision.patch_size
        # resize masks to image res, sigmoid, then max-pool to the patch grid
        masks = jax.image.resize(masks, masks.shape[:2] + (s, s), method="bilinear")
        masks = jax.nn.sigmoid(masks)
        g = s // p
        patch_mask = masks.reshape(b, q, g, p, g, p).max(axis=(3, 5))
        # visible iff any covered pixel >= 0.5 (clip.py:306-313)
        token_masked = (patch_mask < 0.5).reshape(b, q, g * g)

        n_img = g * g + 1  # cls + patches
        n_all = q + n_img
        neg = jnp.asarray(-1e9, jnp.float32)
        attn = jnp.zeros((b, n_all, n_all), jnp.float32)
        # nothing attends to the mask tokens
        attn = attn.at[:, :, :q].set(neg)
        # mask tokens attend only to their visible patches (+ the cls token)
        attn = attn.at[:, :q, q + 1 :].set(jnp.where(token_masked, neg, 0.0))
        return self.vision.apply(
            {"params": params}, images,
            num_mask_tokens=q, attn_mask=attn[:, None],
        )

    def pred_logits(self, mask_embed, text_embed, labels, logit_scale: float = 100.0):
        """Cosine-similarity logits vs per-class text embeds, synonym-
        ensembled (``clip.py:345-357``; the exp'd CLIP logit scale saturates
        its clamp of 100 for released models)."""
        me = mask_embed / jnp.linalg.norm(mask_embed, axis=-1, keepdims=True)
        te = text_embed / jnp.linalg.norm(text_embed, axis=-1, keepdims=True)
        logits = jnp.einsum("bqc,nc->bqn", me, te) * logit_scale
        return ensemble_logits_with_labels(logits, labels)

    def __call__(self, params, images, masks, text_embed=None, labels=None):
        mask_embed = self.encode_image_with_mask(params, images, masks)
        out = {"mask_embed": mask_embed}
        if text_embed is not None and labels is not None:
            out["mask_pred_open_logits"] = self.pred_logits(
                mask_embed, text_embed, labels
            )
        return out
