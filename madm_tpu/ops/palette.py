"""Label <-> palette-RGB conversion and palette-distance pseudo-labels, on device.

The reference renders label maps to palette colors through PIL on the host
(``mtmadise.py:159-175`` — label -> 'P'-mode image -> RGB -> normalize to
[-1, 1]) and derives an uncertainty-calibrated second pseudo-label from the
per-pixel distance between the VAE-decoded prediction and the palette colors
(``mtmadise.py:327-333``).  Both are pure gathers/norms, so they run on-device
here (a PIL round-trip per step per image would serialize the TPU).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

IGNORE_LABEL = 255

# The fixed high-contrast palette selected by ``reg_target_palette=
# 'discrete'`` (reference ``mtmadise.py:86-91``) — used ONLY for the
# VAE-decoder color-regression targets; reg_uncertain's distance table
# stays on the train palette (``mtmadise.py:92-94``).
DISCRETE_PALETTE = (
    255, 0, 255, 0, 255, 0, 127, 255, 127, 255, 127, 127, 0, 255, 255,
    255, 255, 0, 0, 0, 255, 255, 0, 0, 127, 0, 127, 255, 255, 255, 0, 0, 0,
)


def reg_target_table(train_palette, reg_target_palette) -> np.ndarray:
    """[256, 3] color table for the decoder-regression targets.

    ``reg_target_palette``: None -> the train palette; 'discrete' -> the
    fixed ``DISCRETE_PALETTE`` (the only non-None value the reference
    accepts, ``mtmadise.py:83-86``)."""
    if reg_target_palette is None:
        return palette_table(train_palette)
    if reg_target_palette != "discrete":
        raise ValueError(
            f"reg_target_palette must be None or 'discrete', got "
            f"{reg_target_palette!r}"
        )
    return palette_table(DISCRETE_PALETTE)


def palette_table(palette, num_entries: int = 256) -> np.ndarray:
    """flat [r0,g0,b0, r1,...] palette list -> [256, 3] float table in [0,1].

    Entries past the palette (incl. index 255) are zero — exactly PIL's
    zero-padded 'P' palette semantics the reference relies on
    (``mtmadise.py:96-103``)."""
    table = np.zeros((num_entries, 3), np.float32)
    flat = np.asarray(palette, np.float32).reshape(-1, 3) / 255.0
    table[: flat.shape[0]] = flat
    return table


def label_to_rgb(labels: jax.Array, table: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[B, H, W] int labels -> ([B, H, W, 3] in [-1, 1], valid mask [B, H, W, 1]).

    (reference ``convert_label_to_rgb``, ``mtmadise.py:159-175``.)"""
    valid = (labels != IGNORE_LABEL).astype(jnp.float32)[..., None]
    rgb01 = table[labels]  # gather; 255 -> black like PIL zero-pad
    rgb = (rgb01 - 0.5) / 0.5
    return rgb, valid


def palette_distance_pseudo_label(
    decoded01: jax.Array,  # [B, H, W, 3] in [0, 1] (decoder output remapped)
    class_table: jax.Array,  # [C, 3] in [0, 1] (first C palette entries)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Distance-to-palette pseudo-label (reference ``mtmadise.py:327-333``).

    distance[c] = || pixel - palette_c ||_2 ; prob = softmax(1 / (d + 1e-3)).
    Returns (pseudo_prob [B,H,W], pseudo_label [B,H,W] int32, softmax [B,H,W,C]).
    """
    d = jnp.linalg.norm(decoded01[..., None, :] - class_table[None, None, None], axis=-1)
    prob = 1.0 / (d + 1e-3)
    sm = jax.nn.softmax(prob, axis=-1)
    p = sm.max(axis=-1)
    lbl = sm.argmax(axis=-1).astype(jnp.int32)
    return p, lbl, sm


def convert_labels(labels: jax.Array, convert: np.ndarray) -> jax.Array:
    """Apply a label-id conversion table ([[src, dst], ...]) via gather.

    (reference ``cross_modality_dataset.py:417-421`` label_convert.)"""
    lut = np.full((256,), IGNORE_LABEL, np.int32)
    lut[np.arange(256)] = np.arange(256)  # identity default
    for src, dst in np.asarray(convert, np.int64):
        lut[src] = dst
    return jnp.asarray(lut)[labels]
