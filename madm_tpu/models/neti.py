"""NeTI textual-inversion machinery (reference: ``modeling/neti/``).

The reference's text encoder class is ``NeTICLIPTextModel``: a CLIP text model
whose embedding layer can overwrite a placeholder token with the output of a
**NeTI mapper** — an MLP over a Fourier positional encoding of (timestep,
unet layer) — optionally adding a scaled bypass to the encoder output
(``neti_clip_text_encoder.py:96-148``, ``neti_mapper.py:22-99``,
``models/positional_encoding.py:7-58``).  The shipped MADM configs run the
plain path (``_get_uncond_inputs`` drives the encoder directly), but the NeTI
machinery is the checkpoint-compatible class, so it is reproduced here as
flax modules + pure functions.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .clip_text import CLIPTextTransformer, WIDTH

UNET_LAYERS = 16  # ldm_diffusers.py:28-29


class NeTIPositionalEncoding(nn.Module):
    """Random-Fourier encoding of (timestep, unet_layer).

    (reference ``models/positional_encoding.py:7-58``: fixed random projection
    matrix, sigmas (0.03, 2.0), sin of the projected 2-vector.)"""

    sigma_t: float = 0.03
    sigma_l: float = 2.0
    num_freqs: int = 1024

    @nn.compact
    def __call__(self, timestep: jax.Array, unet_layer: jax.Array) -> jax.Array:
        w = self.param(
            "w",
            lambda key, shape, dtype: jax.random.normal(key, shape, dtype)
            * jnp.array([[self.sigma_t], [self.sigma_l]], dtype),
            (2, self.num_freqs),
            jnp.float32,
        )
        x = jnp.stack(
            [timestep.astype(jnp.float32), unet_layer.astype(jnp.float32)], axis=-1
        )
        return jnp.sin(x @ w)  # [B, num_freqs]


class NeTIMapper(nn.Module):
    """(t, layer) -> token embedding, with optional output bypass.

    (reference ``neti_mapper.py:22-99``: pos-enc -> Linear -> LayerNorm ->
    LeakyReLU -> Linear -> LayerNorm -> LeakyReLU -> head; nested dropout on
    the representation during training.)"""

    output_dim: int = WIDTH
    hidden_dim: int = 128
    use_nested_dropout: bool = True
    nested_dropout_prob: float = 0.5

    @nn.compact
    def __call__(
        self,
        timestep: jax.Array,
        unet_layer: jax.Array,
        train: bool = False,
        dropout_rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        enc = NeTIPositionalEncoding(name="encoder")(timestep, unet_layer)
        h = nn.Dense(self.hidden_dim, name="input_layer")(enc)
        h = nn.LayerNorm(name="norm1")(h)
        h = nn.leaky_relu(h)
        h = nn.Dense(self.hidden_dim, name="hidden_layer")(h)
        h = nn.LayerNorm(name="norm2")(h)
        h = nn.leaky_relu(h)
        if train and self.use_nested_dropout and dropout_rng is not None:
            # nested dropout: zero all dims past a random truncation index
            k1, k2 = jax.random.split(dropout_rng)
            apply = jax.random.uniform(k1, ()) < self.nested_dropout_prob
            trunc = jax.random.randint(k2, (h.shape[0],), 0, h.shape[-1])
            idx = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
            h = jnp.where(apply & (idx > trunc[:, None]), 0.0, h)
        return nn.Dense(self.output_dim, name="output_layer")(h)


class NeTICLIPText:
    """CLIP text encoding with an optional NeTI-mapped placeholder token.

    ``encode(params, input_ids)`` is the plain path (what the shipped configs
    use).  ``encode_with_neti`` overwrites ``placeholder_id`` positions with
    the mapper output for the given (timestep, unet_layer) before running the
    transformer (reference ``net_clip_text_embedding.py:39-73``)."""

    def __init__(self, dtype=jnp.float32):
        self.transformer = CLIPTextTransformer(dtype=dtype)
        self.mapper = NeTIMapper()

    def encode(self, params, input_ids: jax.Array) -> jax.Array:
        return self.transformer.apply({"params": params}, input_ids)

    def encode_with_neti(
        self,
        params,
        mapper_params,
        input_ids: jax.Array,
        timestep: jax.Array,
        unet_layer: jax.Array,
        placeholder_id: int,
    ) -> jax.Array:
        tok = params["token_embedding"]["embedding"]
        embeds = tok[input_ids]
        mapped = self.mapper.apply({"params": mapper_params}, timestep, unet_layer)
        mask = (input_ids == placeholder_id)[..., None]
        embeds = jnp.where(mask, mapped[:, None, :], embeds)
        return self.transformer.apply(
            {"params": params}, input_ids, inputs_embeds=embeds
        )
