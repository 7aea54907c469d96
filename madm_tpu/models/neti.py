"""NeTI textual-inversion machinery (reference: ``modeling/neti/``).

The reference's text encoder class is ``NeTICLIPTextModel``: a CLIP text model
whose embedding layer can overwrite a placeholder token with the output of a
**NeTI mapper** — an MLP over a Fourier positional encoding of (timestep,
unet layer) — and, when ``output_bypass`` is on (the default), adds a
normalized, 0.2-scaled *bypass* vector (the second half of the mapper's
dual output) to the encoder output at the placeholder position before the
final LayerNorm (``neti_clip_text_encoder.py:133-148``,
``net_clip_text_embedding.py:39-73``, ``neti_mapper.py:22-99``,
``models/positional_encoding.py:7-42``).  The shipped MADM configs run the
plain path (``_get_uncond_inputs`` drives the encoder directly), but the NeTI
machinery is the checkpoint-compatible class, so it is reproduced here as
flax modules + pure functions.

Structure mirrors the reference exactly so converted torch weights drop in:

- positional encoding: fixed random ``w`` [num_w, 2] (col 0 scaled by
  sigma_t=0.03, col 1 by sigma_l=2.0), encode(t, l) = unit-normalized
  ``concat(sin(w @ [t, l]), cos(w @ [t, l]))`` -> [B, 2*num_w]
  (``positional_encoding.py:20-33``; the reference detaches ``w``).
- input layer: Linear(2*num_w -> num_time_anchors*num_layers) whose weight is
  initialized to the matrix of anchor encodings (t in range(0,1000,100) x
  layer in 0..15) (``positional_encoding.py:35-42``, ``neti_mapper.py:61-67``).
- net: Linear(160->128) -> LayerNorm -> LeakyReLU -> Linear(128->128) ->
  LayerNorm -> LeakyReLU (``neti_mapper.py:54-59``).
- output layer: Linear(128 -> output_dim*2 when output_bypass)
  (``neti_mapper.py:38-40,59``).
- nested dropout: training-time, with prob p zero dims [idx:] for a random
  per-sample idx (``neti_mapper.py:84-93``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .clip_text import CLIPTextTransformer, WIDTH, apply_final_layer_norm

# ldm_diffusers.py:28-29 / neti_mapper.py:12-13
UNET_LAYERS = 16


def fourier_encode(w: jax.Array, timestep: jax.Array, unet_layer: jax.Array) -> jax.Array:
    """Unit-normalized sin/cos Fourier features of (t, layer).

    (reference ``positional_encoding.py:20-33``: ``v = cat(sin(w @ x),
    cos(w @ x))`` column-normalized; ``w`` is used detached.)"""
    w = jax.lax.stop_gradient(w)
    x = jnp.stack(
        [timestep.astype(jnp.float32), unet_layer.astype(jnp.float32)], axis=0
    )  # [2, B]
    wx = w @ x  # [num_w, B]
    v = jnp.concatenate([jnp.sin(wx), jnp.cos(wx)], axis=0)  # [2*num_w, B]
    v = v / jnp.linalg.norm(v, axis=0, keepdims=True)
    return v.T  # [B, 2*num_w]


def anchor_init_matrix(
    w: jax.Array, num_time_anchors: int, num_layers: int
) -> jax.Array:
    """The anchor-encoding weight matrix for the input layer
    (``positional_encoding.py:35-42``): rows are encode(t_anchor, l) for
    t_anchor in range(0, 1000, 1000//num_time_anchors), l in 0..num_layers-1."""
    ts, ls = [], []
    for t_anchor in range(0, 1000, 1000 // num_time_anchors):
        for l_anchor in range(num_layers):
            ts.append(float(t_anchor))
            ls.append(float(l_anchor))
    return fourier_encode(
        w, jnp.asarray(ts, jnp.float32), jnp.asarray(ls, jnp.float32)
    )  # [num_time_anchors*num_layers, 2*num_w]


class NeTIMapper(nn.Module):
    """(t, layer) -> token embedding [+ bypass vector] (``neti_mapper.py:22-99``).

    When ``output_bypass`` the output is [B, 2*output_dim]: first half is the
    word embedding that overwrites the placeholder token, second half is the
    bypass added to the encoder output (``net_clip_text_embedding.py:64-66``)."""

    output_dim: int = WIDTH
    use_nested_dropout: bool = True
    nested_dropout_prob: float = 0.5
    norm_scale: Optional[float] = None
    num_pe_time_anchors: int = 10
    num_unet_layers: int = UNET_LAYERS
    sigma_t: float = 0.03
    sigma_l: float = 2.0
    num_w: int = 1024
    output_bypass: bool = True

    @nn.compact
    def __call__(
        self,
        timestep: jax.Array,
        unet_layer: jax.Array,
        train: bool = False,
        dropout_rng: Optional[jax.Array] = None,
        truncation_idx: Optional[int] = None,
    ) -> jax.Array:
        # fixed random projection, per-column sigmas (positional_encoding.py:9-17)
        w = self.param(
            "encoder_w",
            lambda key, shape, dtype: jax.random.normal(key, shape, dtype)
            * jnp.array([[self.sigma_t, self.sigma_l]], dtype),
            (self.num_w, 2),
            jnp.float32,
        )
        enc = fourier_encode(w, timestep, unet_layer)  # [B, 2*num_w]

        input_dim = self.num_pe_time_anchors * self.num_unet_layers
        # anchor-initialized input layer (neti_mapper.py:61-67); flax kernels
        # are [in, out] so the torch [out, in] anchor matrix is transposed
        h = nn.Dense(
            input_dim,
            name="input_layer",
            kernel_init=lambda key, shape, dtype: anchor_init_matrix(
                w, self.num_pe_time_anchors, self.num_unet_layers
            ).T.astype(dtype),
        )(enc)
        # net.1..net.5 (neti_mapper.py:56-58); LeakyReLU slope 0.01 (torch default)
        h = nn.Dense(128, name="net_1")(h)
        h = nn.LayerNorm(name="net_2")(h)
        h = nn.leaky_relu(h)
        h = nn.Dense(128, name="net_4")(h)
        h = nn.LayerNorm(name="net_5")(h)
        h = nn.leaky_relu(h)

        if train and self.use_nested_dropout and dropout_rng is not None:
            # nested dropout: with prob p, zero all dims >= a random
            # per-sample truncation index (neti_mapper.py:84-89)
            k1, k2 = jax.random.split(dropout_rng)
            apply = jax.random.uniform(k1, ()) < self.nested_dropout_prob
            trunc = jax.random.randint(k2, (h.shape[0],), 0, h.shape[-1])
            idx = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
            h = jnp.where(apply & (idx >= trunc[:, None]), 0.0, h)
        elif not train and truncation_idx is not None:
            # eval-time explicit truncation (neti_mapper.py:90-92)
            idx = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
            h = jnp.where(idx >= truncation_idx, 0.0, h)

        out_dim = self.output_dim * (2 if self.output_bypass else 1)
        out = nn.Dense(out_dim, name="output_layer_0")(h)
        if self.norm_scale is not None:
            # (neti_mapper.py:95-99)
            out = out / jnp.linalg.norm(out, axis=-1, keepdims=True) * self.norm_scale
        return out


class NeTICLIPText:
    """CLIP text encoding with an optional NeTI-mapped placeholder token.

    ``encode(params, input_ids)`` is the plain path (what the shipped configs
    use — ``forward_wo_neti``, ``neti_clip_text_encoder.py:50-78``).
    ``encode_with_neti`` overwrites ``placeholder_id`` positions with the
    mapper's word half, runs the transformer, then adds the normalized
    0.2-scaled bypass half to the placeholder position of the pre-final-LN
    encoder output, returning ``(plain, with_bypass)`` last hidden states
    (reference ``neti_clip_text_encoder.py:94-148``,
    ``net_clip_text_embedding.py:39-73``)."""

    BYPASS_SCALE = 0.2  # neti_clip_text_encoder.py:143

    def __init__(
        self,
        dtype=jnp.float32,
        output_bypass: bool = True,
        transformer: Optional[CLIPTextTransformer] = None,
        mapper: Optional[NeTIMapper] = None,
    ):
        self.transformer = transformer or CLIPTextTransformer(dtype=dtype)
        self.mapper = mapper or NeTIMapper(output_bypass=output_bypass)

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
        train: bool = False,
        dropout_rng: Optional[jax.Array] = None,
        truncation_idx: Optional[int] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        tok = params["token_embedding"]["embedding"]
        embeds = tok[input_ids]
        mapped = self.mapper.apply(
            {"params": mapper_params},
            timestep,
            unet_layer,
            train=train,
            dropout_rng=dropout_rng,
            truncation_idx=truncation_idx,
        )
        if self.mapper.output_bypass:
            word, bypass = jnp.split(mapped, 2, axis=-1)
        else:
            word, bypass = mapped, None

        # overwrite the (single) placeholder position per sample
        # (net_clip_text_embedding.py:68-70)
        batch = jnp.arange(input_ids.shape[0])
        learnable_idx = jnp.argmax(input_ids == placeholder_id, axis=1)
        embeds = embeds.at[batch, learnable_idx].set(word.astype(embeds.dtype))

        hidden = self.transformer.apply(
            {"params": params}, input_ids, inputs_embeds=embeds, final_ln=False
        )
        plain = apply_final_layer_norm(params, hidden)
        if bypass is None:
            return plain, plain

        # scaled bypass on the pre-LN state (neti_clip_text_encoder.py:138-148)
        existing = hidden[batch, learnable_idx]  # [B, width]
        bypass = (
            bypass
            / jnp.linalg.norm(bypass, axis=1, keepdims=True)
            * jnp.linalg.norm(existing, axis=1, keepdims=True)
        )
        new_state = existing + self.BYPASS_SCALE * bypass.astype(hidden.dtype)
        hidden_bypass = hidden.at[batch, learnable_idx].set(new_state)
        return plain, apply_final_layer_norm(params, hidden_bypass)


def convert_neti_mapper_state(sd) -> dict:
    """torch NeTIMapper state dict -> flax NeTIMapper params.

    torch keys (``neti_mapper.py:54-67``): ``encoder.w``,
    ``input_layer.weight/bias`` (aliased as ``net.0``), ``net.{1,4}.weight/bias``
    (Linear), ``net.{2,5}.weight/bias`` (LayerNorm), ``output_layer.0.weight/bias``."""
    out = {}

    def dense(name, key):
        out[name] = {
            "kernel": np.asarray(sd[f"{key}.weight"]).T,
            "bias": np.asarray(sd[f"{key}.bias"]),
        }

    def ln(name, key):
        out[name] = {
            "scale": np.asarray(sd[f"{key}.weight"]),
            "bias": np.asarray(sd[f"{key}.bias"]),
        }

    out["encoder_w"] = np.asarray(sd["encoder.w"])
    dense("input_layer", "net.0" if "net.0.weight" in sd else "input_layer")
    dense("net_1", "net.1")
    ln("net_2", "net.2")
    dense("net_4", "net.4")
    ln("net_5", "net.5")
    dense("output_layer_0", "output_layer.0")
    return out
