"""Config-facing model builder.

Maps the reference's config surface (the knobs set by
``config_files/common/models/mtmadise_multi_lora.py`` and the experiment
configs) onto ``MADMConfig``/``MADM``.  Config files call this via LazyCall so
the shipped configs read near-verbatim against the TPU rebuild.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from .madm import MADM, MADMConfig


def build_madm(
    *,
    num_classes: int,
    target_modality: str = "Depth",
    lora_configs: Sequence[str] = (),
    feature_dims: Sequence[int] = (3, 320, 640, 1280),
    projection_dim: Sequence[int] = (128, 512, 512, 512),
    out_features: Sequence[str] = ("s0", "s3", "s4", "s5"),
    in_keys: Sequence[str] = ("s0", "s3", "s4", "s5"),
    unet_block_indices: Sequence[int] = (5, 8, 11),
    unet_block_indices_type: str = "after",
    head_channels: int = 256,
    same_cond_params: bool = True,
    vae_decoder_loss: str = "st",
    ema_alpha: float = 0.999,
    pseudo_threshold: float = 0.968,
    train_palette: Sequence[int] = (),
    crop_size: Sequence[int] = (512, 512),
    compute_dtype: str = "bfloat16",
    unet_channels: Optional[Sequence[int]] = None,
    vae_channels: Optional[Sequence[int]] = None,
    remat: bool = False,
    sem_seg_head_sec_modal: bool = False,
    **unused,  # reference knobs without a TPU equivalent (vis etc.)
) -> MADM:
    cfg = MADMConfig(
        num_classes=num_classes,
        target_modality=target_modality,
        lora_configs=tuple(lora_configs),
        feature_dims=tuple(feature_dims),
        projection_dim=tuple(projection_dim),
        out_features=tuple(out_features),
        in_keys=tuple(in_keys),
        unet_block_indices=tuple(unet_block_indices),
        unet_block_indices_type=unet_block_indices_type,
        head_channels=head_channels,
        same_cond_params=same_cond_params,
        vae_decoder_loss=vae_decoder_loss,
        ema_alpha=ema_alpha,
        pseudo_threshold=pseudo_threshold,
        train_palette=tuple(train_palette),
        crop_size=tuple(crop_size),
        compute_dtype=getattr(jnp, compute_dtype)
        if isinstance(compute_dtype, str)
        else compute_dtype,
        unet_channels=tuple(unet_channels) if unet_channels else None,
        vae_channels=tuple(vae_channels) if vae_channels else None,
        remat=remat,
        sem_seg_head_sec_modal=sem_seg_head_sec_modal,
    )
    return MADM(cfg)
