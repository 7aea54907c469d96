"""Flax CLIP text encoder (SD-v1.4's conditioning model) + uncond embedding.

The trained MADM configs never run live text encoding — they need exactly one
constant from the text encoder: the empty-prompt embedding ``uncond_inputs``
[1, 77, 768], computed by driving CLIP's text transformer manually with a
causal mask and final LayerNorm (reference ``ldm_diffusers.py:219-243``).
This module implements the full CLIP-ViT-L/14 text transformer in flax so

- ``uncond_inputs`` can be recomputed bit-faithfully from any SD snapshot,
- arbitrary prompt embedding is available for the engineered-text-prompt
  path (reference ``ldm_text_prompt.py``),
- the NeTI wrapper (``madm_tpu.models.neti``) has a host transformer.

Architecture (openai/clip-vit-large-patch14): vocab 49408, width 768,
12 layers, 12 heads, MLP 3072, quick_gelu, causal attention, pre-LN.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

VOCAB_SIZE = 49408
MAX_LEN = 77
WIDTH = 768
LAYERS = 12
HEADS = 12
MLP_DIM = 3072
BOS_ID = 49406
EOS_ID = 49407


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    heads: int = HEADS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, causal_mask: jax.Array) -> jax.Array:
        b, s, c = x.shape
        HEADS = self.heads
        d = c // HEADS
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(x) * (d**-0.5)
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(b, s, HEADS, d)
        k = k.reshape(b, s, HEADS, d)
        v = v.reshape(b, s, HEADS, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        if causal_mask.ndim == 2:  # [s, s] shared mask
            logits = logits + causal_mask[None, None]
        else:  # [b, 1|h, s, s] per-sample mask (MaskCLIP)
            logits = logits + causal_mask
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, c)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    heads: int = HEADS
    mlp_dim: int = MLP_DIM
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(self.heads, dtype=self.dtype, name="self_attn")(h, causal_mask)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="mlp_fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class CLIPTextTransformer(nn.Module):
    """input_ids [B, S] -> last_hidden_state [B, S, width] (after final LN)."""

    vocab_size: int = VOCAB_SIZE
    width: int = WIDTH
    layers: int = LAYERS
    heads: int = HEADS
    mlp_dim: int = MLP_DIM
    max_len: int = MAX_LEN
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        inputs_embeds: Optional[jax.Array] = None,
        final_ln: bool = True,
    ) -> jax.Array:
        s = input_ids.shape[1] if inputs_embeds is None else inputs_embeds.shape[1]
        tok = nn.Embed(self.vocab_size, self.width, dtype=self.dtype, name="token_embedding")
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (self.max_len, self.width),
            jnp.float32,
        )
        x = tok(input_ids) if inputs_embeds is None else inputs_embeds
        x = x + pos[None, :s].astype(x.dtype)

        causal = jnp.triu(jnp.full((s, s), -jnp.inf, jnp.float32), k=1)
        for i in range(self.layers):
            x = CLIPEncoderLayer(self.heads, self.mlp_dim, dtype=self.dtype,
                                 name=f"layers_{i}")(x, causal)
        if not final_ln:
            # pre-LN encoder output — the NeTI bypass is added here before
            # the final LayerNorm (neti_clip_text_encoder.py:132-148)
            return x
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_layer_norm")(x)


def apply_final_layer_norm(params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Apply the transformer's final LayerNorm from its param tree (used by
    the NeTI bypass path, which LNs both the plain and bypassed states —
    reference ``neti_clip_text_encoder.py:147-148``)."""
    ln = params["final_layer_norm"]
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * ln["scale"] + ln["bias"]


def empty_prompt_ids(length: int = MAX_LEN) -> np.ndarray:
    """Token ids for the empty prompt '' with max-length EOS padding —
    what the reference's CLIPTokenizer produces (``ldm_diffusers.py:220-222``)."""
    ids = np.full((1, length), EOS_ID, np.int32)
    ids[0, 0] = BOS_ID
    return ids


def compute_uncond_inputs(params, dtype=jnp.float32) -> jax.Array:
    """The [1, 77, 768] empty-prompt embedding (``ldm_diffusers.py:219-243``)."""
    model = CLIPTextTransformer(dtype=dtype)
    return jax.jit(lambda p, ids: model.apply({"params": p}, ids))(
        params, jnp.asarray(empty_prompt_ids())
    )
