"""Flag->cfg mutations for the feature-graph ablation flags.

These are the last reference CLI flags (reference main.py:751-812) that were
previously documented as dot-override-only; each is a pure config
reconfiguration, so the test asserts the cfg mutation without building the
(full-SD-sized) model.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from main import apply_cli_mutations, build_parser
from madm_tpu.config import LazyConfig

CFG = "config_files/SemSeg/MTMADISE/mtmadise_cityscapes_rgb_to_depth_11.py"


def mutate(*flags):
    args = build_parser().parse_args(["--config-file", CFG, *flags])
    cfg = LazyConfig.load(CFG)
    apply_cli_mutations(cfg, args)
    return cfg


def test_without_vae_encoder_feat_drops_scale0():
    for flag in ("--without_vae_encoder_feat", "--baseline_wo_encoder_feat"):
        cfg = mutate(flag)
        assert list(cfg.model.out_features) == ["s3", "s4", "s5"]
        assert list(cfg.model.in_keys) == ["s3", "s4", "s5"]
        assert list(cfg.model.feature_dims) == [320, 640, 1280]
        assert list(cfg.model.projection_dim) == [512, 512, 512]


def test_single_scale_decoder():
    cfg = mutate("--single_scale_decoder")
    assert list(cfg.model.out_features) == ["s3"]
    assert list(cfg.model.in_keys) == ["s3"]
    assert list(cfg.model.feature_dims) == [320]
    assert list(cfg.model.projection_dim) == [512]
    assert list(cfg.model.unet_block_indices) == [11]


def test_fda_fusion_val_sets_both_loaders():
    cfg = mutate("--fda_fusion_val", "0.01", "0.05")
    assert list(cfg.dataloader.train.dataset.fda_fusion_val) == [0.01, 0.05]
    assert list(cfg.dataloader.test.dataset.fda_fusion_val) == [0.01, 0.05]


def test_latent_noise_flags():
    cfg = mutate("--add_latent_noise", "0.1", "--norm_latent_noise")
    assert cfg.model.add_latent_noise == 0.1
    assert cfg.model.norm_latent_noise is True
    # -1 sentinel leaves the config untouched (reference main.py:594)
    cfg = mutate()
    assert "add_latent_noise" not in cfg.model


def test_mask_diff_channel_plus():
    cfg = mutate("--mask_diff", "rgb=0_Depth=1")
    assert cfg.model.mask_diff == "rgb=0_Depth=1"
    assert cfg.model.input_channel_plus == 1
    cfg = mutate("--mask_diff", "circle")
    assert cfg.model.input_channel_plus == 2


def test_concat_pixel_shuffle():
    cfg = mutate("--concat_pixel_shuffle")
    assert cfg.model.concat_pixel_shuffle is True


def test_ema_w_unet_flag():
    cfg = mutate("--ema_w_unet")
    assert cfg.model.ema_w_unet is True


def test_warmup_lr_swaps_schedule():
    cfg = mutate("--warmup_lr")
    assert cfg.optimizer["schedule"] == "linear"
    assert cfg.optimizer["weight_decay"] == 0.01

    # linear schedule numerics: warmup_factor*s(0) at 0, exactly base_lr
    # when the rescaled warmup ends at f=0.0375, then linear to 0 at f=1
    # (reference main.py:528-540 WarmupParamScheduler semantics)
    from madm_tpu.train.optimizer import linear_lr_schedule

    base, n = 5e-6, 10000
    sched = linear_lr_schedule(base, n)
    assert float(sched(0)) < 1e-9
    assert abs(float(sched(375)) - base) < 1e-10
    mid = float(sched(int(n * 0.51875)))  # (1-f)/(1-l) = 0.5
    assert abs(mid - 0.5 * base) < 1e-9
    assert float(sched(n)) == 0.0
