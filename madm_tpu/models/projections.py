"""Per-scale feature projections (reference: GN BottleneckBlock stages).

The reference projects each tapped diffusion feature through one
detectron2-style ``BottleneckBlock`` with GroupNorm
(``modeling/backbone/feature_extractor.py:347-359``): 1x1 -> 3x3 -> 1x1 convs
with GN + ReLU and a 1x1+GN shortcut when channels change.  The trained config
(``config_files/SemSeg/MTMADISE/mtmadise_cityscapes_rgb_to_depth_11.py:50-52``)
uses projections {s0: 3->128, s3: 320->512, s4: 640->512, s5: 1280->512} with
bottleneck width 128.

NHWC Flax modules; the projection params live in their own subtree so the EMA
teacher can keep an independent copy (``cmdise.py:307-325``).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .sd.layers import GroupNorm


class BottleneckBlock(nn.Module):
    """detectron2 ResNet BottleneckBlock with GN norm, stride 1."""

    bottleneck_channels: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_channels = x.shape[-1]
        gn = lambda name, act=None: GroupNorm(num_groups=32, name=name, dtype=self.dtype, act=act)
        h = nn.Conv(self.bottleneck_channels, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = gn("norm1", "relu")(h)
        h = nn.Conv(self.bottleneck_channels, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = gn("norm2", "relu")(h)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(h)
        h = gn("norm3")(h)
        if in_channels != self.out_channels:
            s = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="shortcut")(x)
            s = gn("shortcut_norm")(s)
        else:
            s = x
        return nn.relu(h + s)


class MultiScaleProjection(nn.Module):
    """One BottleneckBlock stage per tapped scale.

    ``__call__`` takes the ordered list of backbone features (one per
    ``out_features`` entry, largest-resolution first) and returns the dict
    {name: projected NHWC feature} consumed by the DAFormer head
    (reference ``feature_extractor.py:367-396``).
    """

    feature_dims: Sequence[int]  # e.g. (3, 320, 640, 1280) — input channels
    projection_dim: Sequence[int]  # e.g. (128, 512, 512, 512)
    out_features: Sequence[str]  # e.g. ('s0', 's3', 's4', 's5')
    bottleneck_channels: int = 128
    num_res_blocks: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jax.Array]) -> Dict[str, jax.Array]:
        assert len(features) == len(self.out_features), (
            f"{len(features)} features for {self.out_features}"
        )
        out = {}
        for idx, name in enumerate(self.out_features):
            x = features[idx]
            assert x.shape[-1] == self.feature_dims[idx], (
                f"{name}: expected C={self.feature_dims[idx]}, got {x.shape}"
            )
            for b in range(self.num_res_blocks):
                x = BottleneckBlock(
                    self.bottleneck_channels,
                    self.projection_dim[idx],
                    dtype=self.dtype,
                    name=f"proj_{idx}_block_{b}",
                )(x)
            out[name] = x
        return out
