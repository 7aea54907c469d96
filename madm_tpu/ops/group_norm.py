"""TPU-friendly GroupNorm (+ optional fused SiLU).

flax's ``nn.GroupNorm`` reshapes NHWC to [..., G, C/G] and reduces over the
group axis — for SD's C=128..512 with 32 groups that leaves a lane dimension
of C/G = 4..16, which Mosaic tiles catastrophically (profiled: the GN
``convert_reduce_fusion`` ops were ~60% of VAE-decoder time on v5e).

This implementation keeps the lane dimension at C for the big reductions:

1. one pass over NHWC computing per-channel sum and sum-of-squares
   (fp32 accumulation, lanes = C, perfectly tiled; XLA fuses both),
2. group statistics from the tiny [B, C] tensors,
3. one normalize(+affine, + optional SiLU) pass with per-channel
   broadcast coefficients.

Semantically identical to torch/flax GroupNorm (fp32 statistics, eps inside
the sqrt).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def group_norm(
    x: jax.Array,  # [B, H, W, C] (or [B, L, C])
    scale: jax.Array,  # [C]
    bias: jax.Array,  # [C]
    num_groups: int = 32,
    eps: float = 1e-5,
    act: Optional[str] = None,  # None | 'silu' | 'relu'
) -> jax.Array:
    c = x.shape[-1]
    assert c % num_groups == 0, (c, num_groups)
    spatial_axes = tuple(range(1, x.ndim - 1))
    n_per_channel = 1
    for a in spatial_axes:
        n_per_channel *= x.shape[a]
    n = n_per_channel * (c // num_groups)

    xf = x.astype(jnp.float32)
    # channel-wise moments (lanes stay = C)
    s1 = jnp.sum(xf, axis=spatial_axes)  # [B, C]
    s2 = jnp.sum(xf * xf, axis=spatial_axes)  # [B, C]
    # group-wise on the tiny tensor
    b = x.shape[0]
    g1 = s1.reshape(b, num_groups, -1).sum(-1)  # [B, G]
    g2 = s2.reshape(b, num_groups, -1).sum(-1)
    mean = g1 / n
    var = g2 / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)  # [B, G]

    # per-channel coefficients: y = x * a + b
    mean_c = jnp.repeat(mean, c // num_groups, axis=1)  # [B, C]
    inv_c = jnp.repeat(inv, c // num_groups, axis=1)
    a_c = inv_c * scale.astype(jnp.float32)[None]
    b_c = bias.astype(jnp.float32)[None] - mean_c * a_c

    shape = (b,) + (1,) * len(spatial_axes) + (c,)
    y = xf * a_c.reshape(shape) + b_c.reshape(shape)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    elif act == "relu":
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)
