"""SegFormer-style all-MLP decode head (reference: ``modeling/sem_seg_head/
segformer_head.py`` — alternative head, unused by shipped configs).

Per-scale Dense embed -> upsample to the largest scale -> concat -> 1x1
fusion conv (BN+ReLU) -> dropout -> conv_seg.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .daformer import ConvModule, resize_bilinear


class SegFormerHead(nn.Module):
    in_keys: Sequence[str]
    num_classes: int
    embed_dims: int = 256
    dropout_ratio: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        features: Dict[str, jax.Array],
        train: bool = False,
        dropout_rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        xs = [features[k] for k in self.in_keys]
        os_size = xs[0].shape[1:3]
        embeds = [
            resize_bilinear(
                nn.Dense(self.embed_dims, dtype=self.dtype, name=f"linear_c{i}")(x),
                os_size,
            )
            for i, x in enumerate(xs)
        ]
        x = jnp.concatenate(embeds, axis=-1)
        x = ConvModule(self.embed_dims, 1, dtype=self.dtype, name="linear_fuse")(x, train)
        if train and self.dropout_ratio > 0 and self.has_rng("dropout"):
            x = nn.Dropout(self.dropout_ratio, broadcast_dims=(1, 2),
                           deterministic=False, name="dropout")(x)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01), name="conv_seg")(x)
