"""UDA loss functions (reference: ``modeling/criterion.py`` CmdiseCriterion).

Pure jnp; every loss reproduces the reference's exact normalization:

- CE losses are a *plain mean over all pixels* — ignored pixels contribute 0
  to the numerator but still count in the denominator
  (``criterion.py:120-128``: F.cross_entropy(reduction='none', ignore_index)
  then ``weight_reduce_loss(..., 'mean')`` = loss.mean()).
- the VAE-decoder palette-regression loss is sum(elementwise * mask) / numel
  (``criterion.py:237-245``), mask nearest-resized to the latent grid.
- denoise / MIC decoder losses are plain means scaled by a scalar pixel
  weight (``criterion.py:223-235,247-253``).

Logits here are NHWC [B, h, w, C]; labels [B, H, W] int32 with 255 ignore.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

IGNORE_LABEL = 255


def _resize_logits(logits: jax.Array, hw) -> jax.Array:
    b, h, w, c = logits.shape
    if (h, w) == tuple(hw):
        return logits
    return jax.image.resize(
        logits, (b, hw[0], hw[1], c), method="bilinear", antialias=False
    )  # F.interpolate semantics (no antialias)


def cross_entropy(
    logits: jax.Array,  # [B, h, w, C] (upsampled to label size here)
    labels: jax.Array,  # [B, H, W] int32
    pixel_weight: Optional[jax.Array] = None,  # [B, H, W] or scalar
    class_weight: Optional[jax.Array] = None,  # [C]
) -> jax.Array:
    logits = _resize_logits(logits.astype(jnp.float32), labels.shape[1:3])
    num_classes = logits.shape[-1]
    valid = labels != IGNORE_LABEL
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    if class_weight is not None:
        nll = nll * class_weight[safe]
    nll = jnp.where(valid, nll, 0.0)
    if pixel_weight is not None:
        nll = nll * pixel_weight
    # reference semantics: mean over ALL pixels (torch CE 'none' + .mean();
    # with class_weight torch would normalize by sum of weights — the
    # reference never sets class_weight, so plain mean is exact)
    return nll.mean()


def vae_decoder_loss(
    pred_latent: jax.Array,  # [B, h, w, 4] UNet output latent
    gt_latent: jax.Array,  # [B, h, w, 4] palette-image latent
    mask: jax.Array,  # [B, H, W, 1] valid mask at image res
    loss_type: str = "L1",
    loss_weight: float = 1.0,
) -> jax.Array:
    """sum(|pred - gt| * mask) / numel * weight (``criterion.py:237-245``)."""
    diff = (
        jnp.abs(pred_latent - gt_latent)
        if loss_type == "L1"
        else (pred_latent - gt_latent) ** 2
    ).astype(jnp.float32)
    b, h, w, c = pred_latent.shape
    m = jax.image.resize(mask, (b, h, w, 1), method="nearest")
    return (diff * m).sum() / diff.size * loss_weight


def denoise_consistency_loss(
    pred_latent: jax.Array,
    gt_latent: jax.Array,
    pixel_weight: jax.Array,  # scalar (pseudo_val)
    loss_type: str = "L1",
    loss_weight: float = 1.0,
) -> jax.Array:
    """plain mean * scalar weight (``criterion.py:223-235``)."""
    diff = (
        jnp.abs(pred_latent - gt_latent)
        if loss_type == "L1"
        else (pred_latent - gt_latent) ** 2
    ).astype(jnp.float32)
    return diff.mean() * pixel_weight * loss_weight


def label_smooth_cross_entropy(
    logits: jax.Array,  # [B, h, w, C]
    labels: jax.Array,  # [B, H, W]
    lb_smooth: float = 0.1,
    pixel_weight: Optional[jax.Array] = None,
) -> jax.Array:
    """Label-smoothing CE (reference ``criterion.py:8-54``, unused variant):
    smoothed one-hot targets, mean over valid pixels."""
    logits = _resize_logits(logits.astype(jnp.float32), labels.shape[1:3])
    num_classes = logits.shape[-1]
    valid = labels != IGNORE_LABEL
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    pos, neg = 1.0 - lb_smooth, lb_smooth / num_classes
    one_hot = jax.nn.one_hot(safe, num_classes) * (pos - neg) + neg
    loss = -(one_hot * logp).sum(-1)
    loss = jnp.where(valid, loss, 0.0)
    if pixel_weight is not None:
        loss = loss * pixel_weight
    return loss.sum() / jnp.maximum(valid.sum(), 1)


def feature_distance_loss(feats, ori_feats, loss_weight: float = 1.0) -> jax.Array:
    """mean MSE across tapped features (``criterion.py:144-152``)."""
    losses = [jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
              for a, b in zip(feats, ori_feats)]
    return sum(losses) / len(losses) * loss_weight
