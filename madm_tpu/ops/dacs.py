"""DACS class-mix + strong augmentations, on-device (reference: ``utils/dacs_transforms.py``).

The reference runs these on GPU via kornia inside ``torch.no_grad`` blocks
(``mtmadise.py:263-281``); here they are pure jnp functions threaded through
``jax.random`` keys so the whole augmentation pipeline lives inside the jitted
train step (no host round-trip, fuses with the surrounding program).

Notable reference semantics preserved:

- ``get_class_masks`` samples the class set from the *batch-wide* unique
  labels (``dacs_transforms.py:84`` uses ``labels``, not ``label``) and picks
  ceil(n/2) of the present classes per sample.
- color jitter (strength 0.2) applies brightness/contrast/saturation/hue in
  random order with probability 1-p; gaussian blur with probability 0.5,
  sigma ~ U(0.15, 1.15), kornia's kernel-size formula.
- ``BlockMaskGenerator``: 32-px blocks kept with probability 1-mask_ratio;
  masked pixels set to 0.5 for [0,1] images (``dacs_transforms.py:136-167``).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

IGNORE_LABEL = 255


# --------------------------------------------------------------- class mix
def sample_class_masks(
    rng: jax.Array, labels: jax.Array, num_classes: int
) -> jax.Array:
    """Per-sample binary masks selecting ~half of the present classes.

    ``labels``: [B, H, W] int32 (255 = ignore).  Returns [B, H, W] float32
    mask (1 where the pixel's class was selected).
    """
    b = labels.shape[0]
    # batch-wide presence histogram (reference quirk: unique over the batch)
    one_hot = (labels[..., None] == jnp.arange(num_classes)).any(axis=(1, 2))  # [B, C]
    present = one_hot.any(axis=0)  # [C]
    n_present = present.sum()
    n_take = (n_present + n_present % 2) // 2  # ceil(n/2)

    def per_sample(key):
        scores = jnp.where(
            present, jax.random.uniform(key, (num_classes,)), -jnp.inf
        )
        order = jnp.argsort(-scores)
        ranks = jnp.argsort(order)
        return (ranks < n_take) & present  # [C] bool

    keys = jax.random.split(rng, b)
    selected = jax.vmap(per_sample)(keys)  # [B, C]
    safe = jnp.clip(labels, 0, num_classes - 1)
    mask = jnp.take_along_axis(
        selected.astype(jnp.float32), safe.reshape(b, -1), axis=1
    ).reshape(labels.shape)
    return jnp.where(labels == IGNORE_LABEL, 0.0, mask)


def one_mix(mask: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    """mask * a + (1 - mask) * b; mask broadcast over channels.

    For NHWC images pass mask [B, H, W, 1]; for labels [B, H, W]."""
    return mask * a + (1.0 - mask) * b


# ------------------------------------------------------------ color jitter
def _rgb_to_hsv(rgb: jax.Array) -> jax.Array:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-8), 0.0)
    safe_delta = jnp.maximum(delta, 1e-8)
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta == 0, 0.0, (h / 6.0) % 1.0)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv: jax.Array) -> jax.Array:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = (i.astype(jnp.int32) % 6)[..., None]
    rgb = jnp.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
        [
            jnp.stack([v, t, p], -1),
            jnp.stack([q, v, p], -1),
            jnp.stack([p, v, t], -1),
            jnp.stack([p, q, v], -1),
            jnp.stack([t, p, v], -1),
            jnp.stack([v, p, q], -1),
        ],
    )
    return rgb


def color_jitter(
    rng: jax.Array,
    images: jax.Array,  # [B, H, W, 3] in [0, 1]
    strength: float = 0.2,
    probability: float = 0.2,
) -> jax.Array:
    """kornia-style ColorJitter(b=c=s=h=strength) applied with prob 1-p.

    Factors sampled once per call (the reference shares jitter params across
    the batch within a step — ``mtmadise.py:215-223``); the four ops run in a
    random order like kornia."""
    k_apply, k_b, k_c, k_s, k_h, k_order = jax.random.split(rng, 6)
    s = strength

    def brightness(x):
        f = jax.random.uniform(k_b, (), minval=1 - s, maxval=1 + s)
        return jnp.clip(x * f, 0.0, 1.0)

    def contrast(x):
        f = jax.random.uniform(k_c, (), minval=1 - s, maxval=1 + s)
        gray = (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])
        mean = gray.mean(axis=(1, 2), keepdims=True)[..., None]
        return jnp.clip((x - mean) * f + mean, 0.0, 1.0)

    def saturation(x):
        f = jax.random.uniform(k_s, (), minval=1 - s, maxval=1 + s)
        gray = (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])[..., None]
        return jnp.clip(gray + (x - gray) * f, 0.0, 1.0)

    def hue(x):
        f = jax.random.uniform(k_h, (), minval=-s, maxval=s)
        hsv = _rgb_to_hsv(x)
        hsv = hsv.at[..., 0].set((hsv[..., 0] + f) % 1.0)
        return jnp.clip(_hsv_to_rgb(hsv), 0.0, 1.0)

    ops = [brightness, contrast, saturation, hue]
    order = jax.random.permutation(k_order, 4)

    def body(i, x):
        return jax.lax.switch(order[i], ops, x)

    jittered = jax.lax.fori_loop(0, 4, body, images)
    apply = jax.random.uniform(k_apply, ()) > probability
    return jnp.where(apply, jittered, images)


# ----------------------------------------------------------- gaussian blur
def kornia_kernel_size(n: int) -> int:
    """kornia/DACS kernel-size formula (``dacs_transforms.py:65-73``)."""
    c = math.ceil(0.1 * n)
    return int(math.floor(c - 0.5 + c % 2))


def gaussian_blur(
    rng: jax.Array,
    images: jax.Array,  # [B, H, W, C]
    probability: float = 0.5,
) -> jax.Array:
    """Separable gaussian blur, sigma ~ U(0.15, 1.15), applied with prob 0.5."""
    k_apply, k_sigma = jax.random.split(rng)
    _, h, w, c = images.shape
    ky, kx = kornia_kernel_size(h), kornia_kernel_size(w)
    ky, kx = max(ky, 3), max(kx, 3)
    sigma = jax.random.uniform(k_sigma, (), minval=0.15, maxval=1.15)

    def kernel_1d(size):
        xs = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
        k = jnp.exp(-0.5 * (xs / sigma) ** 2)
        return k / k.sum()

    def blur(x):
        k_y = kernel_1d(ky).reshape(1, ky, 1, 1, 1)
        k_x = kernel_1d(kx).reshape(1, 1, kx, 1, 1)
        # depthwise separable via conv_general_dilated with feature groups
        x1 = jax.lax.conv_general_dilated(
            x, jnp.tile(kernel_1d(ky).reshape(ky, 1, 1, 1), (1, 1, 1, c)),
            (1, 1), [(ky // 2, ky // 2), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )
        x2 = jax.lax.conv_general_dilated(
            x1, jnp.tile(kernel_1d(kx).reshape(1, kx, 1, 1), (1, 1, 1, c)),
            (1, 1), [(0, 0), (kx // 2, kx // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )
        return x2

    apply = jax.random.uniform(k_apply, ()) > 0.5
    return jnp.where(apply, blur(images), images)


def strong_transform(
    rng: jax.Array,
    images: jax.Array,
    color_jitter_strength: float = 0.2,
    color_jitter_probability: float = 0.2,
    blur: bool = True,
) -> jax.Array:
    """color jitter + gaussian blur (``dacs_transforms.py:10-24``)."""
    k1, k2 = jax.random.split(rng)
    x = color_jitter(k1, images, color_jitter_strength, color_jitter_probability)
    if blur:
        x = gaussian_blur(k2, x)
    return x


# ------------------------------------------------------------ block masking
def block_mask(
    rng: jax.Array,
    shape: Tuple[int, int, int],  # (B, H, W)
    mask_ratio: float = 0.7,
    block_size: int = 32,
) -> jax.Array:
    """[B, H, W, 1] float mask; 1 = keep (prob 1-mask_ratio per block)."""
    b, h, w = shape
    mh, mw = round(h / block_size), round(w / block_size)
    m = (jax.random.uniform(rng, (b, mh, mw, 1)) > mask_ratio).astype(jnp.float32)
    return jax.image.resize(m, (b, h, w, 1), method="nearest")


def mask_image(rng: jax.Array, images: jax.Array, mask_ratio: float = 0.7,
               block_size: int = 32, fill: float = 0.5) -> jax.Array:
    """MIC block masking for [0,1] images (masked pixels -> 0.5)."""
    m = block_mask(rng, images.shape[:3], mask_ratio, block_size)
    return images * m + fill * (1.0 - m)
