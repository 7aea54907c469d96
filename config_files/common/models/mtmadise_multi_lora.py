# MADM model graph (TPU rebuild of the reference
# config_files/common/models/mtmadise_multi_lora.py).  Same public knobs;
# experiment configs mutate them exactly like the reference does.

from madm_tpu.config import ConfigDict, LazyCall as L
from madm_tpu.models.build import build_madm

model = L(build_madm)(
    num_classes=19,
    target_modality="???",
    lora_configs=[],
    # backbone taps / projections (reference defaults before the
    # experiment-config s0 overrides)
    feature_dims=[3, 320, 640, 1280],
    projection_dim=[128, 512, 512, 512],
    out_features=["s0", "s3", "s4", "s5"],
    in_keys=["s0", "s3", "s4", "s5"],
    unet_block_indices=[5, 8, 11],
    unet_block_indices_type="after",  # 'in' or 'after'
    head_channels=256,
    same_cond_params=True,
    vae_decoder_loss="st",
    ema_alpha=0.999,
    pseudo_threshold=0.968,
    train_palette="???",
    crop_size=[512, 512],
    compute_dtype="bfloat16",
    # UNet gradient checkpointing for training (use_checkpoint equivalent)
    remat=True,
)

# UDA training knobs consumed by madm_tpu.train.TrainConfig (the reference
# keeps them on the model object; we group them here under `uda`)
uda = ConfigDict(
    blur=True,
    color_jitter_strength=0.2,
    color_jitter_probability=0.2,
    enable_mixup=True,
    rev_noise_sup=False,
    rev_noise_end_iter=None,
    rev_noise_gradually=False,
    denoise_timestep_range=None,
    vae_decoder_loss="st",
    vae_decoder_loss_type="L1",
    vae_decoder_loss_weight=[1.0, 1.0],
    reg_uncertain=False,
    pseudo_threshold=0.968,
)
