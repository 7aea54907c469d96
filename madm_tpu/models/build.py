"""Config-facing model builder.

Maps the reference's config surface (the knobs set by
``config_files/common/models/mtmadise_multi_lora.py`` and the experiment
configs) onto ``MADMConfig``/``MADM``.  Config files call this via LazyCall so
the shipped configs read near-verbatim against the TPU rebuild.

UDA knobs live on the model node, exactly like the reference's
``MTMADISE``/``CMDISE`` ctor args (``mtmadise.py:28-48``, ``cmdise.py:118-149``)
— so reference-style dot-overrides (``model.rev_noise_sup=True``) port.
Unknown keys raise instead of silently no-oping, except for an explicit
allowlist of reference knobs that have no TPU-side behavior.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax.numpy as jnp

from .madm import MADM, MADMConfig

# Reference model-node keys that are accepted and deliberately ignored:
# panoptic/instance plumbing MADM never uses (mtmadise_multi_lora.py:70-87),
# d2 metadata, and knobs that collapsed into the TPU design.
_IGNORED_REFERENCE_KEYS = frozenset({
    "num_queries", "object_mask_threshold", "overlap_threshold", "metadata",
    "size_divisibility", "sem_seg_postprocess_before_inference",
    "pixel_mean", "pixel_std", "semantic_on", "instance_on", "panoptic_on",
    "test_topk_per_image", "class_names", "max_iter",
    # torch-DDP workarounds with no JAX analog (mtmadise.py:40,149-157)
    "add_zero_grad", "wo_lora", "w_rgb_lora", "ema_w_unet",
})

_UDA_KEYS = (
    "ema_alpha", "pseudo_threshold", "blur", "color_jitter_strength",
    "color_jitter_probability", "enable_mixup", "pl_crop",
    "psweight_ignore_top", "mic", "mask_ratio", "mic_reg",
    "mic_reg_wo_pl_val", "fd", "denoise_supervise", "denoise_timestep_range",
    "rev_noise_sup", "rev_noise_end_iter", "rev_noise_gradually", "noise_reg",
    "vae_decoder_loss_type", "vae_decoder_loss_weight", "reg_uncertain",
    "pseudo_weight_scope", "eval_with_noise", "mask_prompt_ratio",
    "detach_mask_prompt", "prompt_perturbation", "prompt_confidence",
    "rand_prompt_scale", "without_prompt", "without_prompt_alpha",
    "prompt_seq_len", "init_uncond_prompt", "denoise_interval",
    "merge_with_pl_data", "pl_merge_val", "fd_attention",
    "target_attention_loss", "reg_target_palette",
)

_FIELD_NAMES = {f.name for f in dataclasses.fields(MADMConfig)}


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
    head_fusion: str = "aspp",
    final_fuse_vae_decoder_feat: bool = False,
    concat_attention_to_conv_seg: bool = False,
    same_cond_params: bool = True,
    clip_state: str = "no",
    vae_decoder_loss: str = "st",
    train_palette: Sequence[int] = (),
    crop_size: Sequence[int] = (512, 512),
    compute_dtype: str = "bfloat16",
    unet_channels: Optional[Sequence[int]] = None,
    vae_channels: Optional[Sequence[int]] = None,
    remat: bool = False,
    sem_seg_head_sec_modal: bool = False,
    finetune_unet: str = "all",
    slide_training: bool = False,
    input_channel_plus: int = 0,
    mask_diff: Optional[str] = None,
    concat_pixel_shuffle: bool = False,
    add_latent_noise: float = -1.0,
    norm_latent_noise: bool = False,
    multi_layer_prompt: bool = False,
    attention_features_res: Sequence[int] = (),
    attention_features_location: Sequence[str] = (),
    attention_select_index: Optional[Sequence[int]] = None,
    **extra,
) -> MADM:
    uda = {}
    for key in list(extra):
        if key in _UDA_KEYS:
            v = extra.pop(key)
            if v is None:
                continue
            if key == "mic_reg_wo_pl_val" and "MIC_reg_wo_pl_val" in extra:
                continue
            uda[key] = v
        elif key == "MIC_reg_wo_pl_val":  # reference spelling, mtmadise.py:44
            v = extra.pop(key)
            if v is not None:
                uda["mic_reg_wo_pl_val"] = v
    unknown = set(extra) - _IGNORED_REFERENCE_KEYS
    if unknown:
        raise ValueError(
            f"build_madm: unknown config keys {sorted(unknown)} "
            f"(valid UDA knobs: {sorted(_UDA_KEYS)})"
        )
    for key in ("denoise_timestep_range", "vae_decoder_loss_weight"):
        if key in uda:
            uda[key] = tuple(uda[key])
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
        head_fusion=head_fusion,
        final_fuse_vae_decoder_feat=final_fuse_vae_decoder_feat,
        concat_attention_to_conv_seg=concat_attention_to_conv_seg,
        same_cond_params=same_cond_params,
        clip_state=clip_state,
        vae_decoder_loss=vae_decoder_loss,
        train_palette=tuple(train_palette),
        crop_size=tuple(crop_size),
        compute_dtype=getattr(jnp, compute_dtype)
        if isinstance(compute_dtype, str)
        else compute_dtype,
        unet_channels=tuple(unet_channels) if unet_channels else None,
        vae_channels=tuple(vae_channels) if vae_channels else None,
        remat=remat,
        sem_seg_head_sec_modal=sem_seg_head_sec_modal,
        finetune_unet=finetune_unet,
        slide_training=slide_training,
        input_channel_plus=input_channel_plus,
        mask_diff=mask_diff,
        concat_pixel_shuffle=concat_pixel_shuffle,
        multi_layer_prompt=multi_layer_prompt,
        attention_features_res=tuple(attention_features_res or ()),
        attention_features_location=tuple(attention_features_location or ()),
        attention_select_index=(
            tuple(attention_select_index)
            if attention_select_index is not None else None
        ),
        add_latent_noise=add_latent_noise,
        norm_latent_noise=norm_latent_noise,
        **uda,
    )
    return MADM(cfg)
