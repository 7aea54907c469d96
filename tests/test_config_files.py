"""The shipped experiment configs load and carry the reference's exact values.

UDA knobs live on the model node like the reference (CMDISE/MTMADISE ctor
args), so reference-style dot-overrides (``model.rev_noise_sup=True``) port.
"""

import pytest

from madm_tpu.config import LazyConfig, instantiate

CONFIGS = {
    "depth_11": dict(modality="Depth", classes=11, rev_end=5000,
                     t_range=[60, 61], vdl="st", vdl_w=[1.0, 1.0]),
    "infrared_9": dict(modality="Infrared", classes=9, rev_end=8000,
                       t_range=[50, 51], vdl="st", vdl_w=[1.0, 1.0]),
    "event_11": dict(modality="Event", classes=11, rev_end=8000,
                     t_range=[50, 51], vdl="s", vdl_w=[20.0]),
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_experiment_config(name):
    exp = CONFIGS[name]
    cfg = LazyConfig.load(
        f"config_files/SemSeg/MTMADISE/mtmadise_cityscapes_rgb_to_{name}.py"
    )
    assert cfg.model.target_modality == exp["modality"]
    assert cfg.model.num_classes == exp["classes"]
    assert cfg.model.lora_configs == []
    assert cfg.model.out_features[0] == "s0"
    assert cfg.model.projection_dim == [128, 512, 512, 512]
    assert cfg.model.rev_noise_sup is True
    assert cfg.model.rev_noise_end_iter == exp["rev_end"]
    assert cfg.model.denoise_timestep_range == exp["t_range"]
    assert cfg.model.vae_decoder_loss == exp["vdl"]
    assert cfg.model.vae_decoder_loss_weight == exp["vdl_w"]
    assert cfg.model.reg_uncertain is True
    assert cfg.train.max_iter == 10000
    assert cfg.train.grad_clip == 0.01
    assert cfg.optimizer["lr"] == 5e-6
    assert cfg.optimizer["weight_decay"] == 0.05
    assert cfg.dataloader.train.dataset.rare_class_sample is True
    # evaluator instantiates with the palette/class lists
    ev = instantiate(cfg.dataloader.evaluator)[0]
    assert len(ev.stuff_classes) == exp["classes"]
    assert len(ev.palette) == 3 * exp["classes"]
    # palette flows into the model config
    assert list(cfg.model.train_palette) == list(ev.palette)


def test_dot_override_applies():
    cfg = LazyConfig.load(
        "config_files/SemSeg/MTMADISE/mtmadise_cityscapes_rgb_to_depth_11.py"
    )
    LazyConfig.apply_overrides(cfg, ["train.max_iter=123", "optimizer.lr=0.5"])
    assert cfg.train.max_iter == 123 and cfg.optimizer["lr"] == 0.5


def _tiny_model_overrides(cfg):
    cfg.model.unet_channels = [8, 8, 16, 16]
    cfg.model.vae_channels = [8, 8, 16, 16]
    cfg.model.feature_dims = [3, 8, 8, 16]
    cfg.model.projection_dim = [8, 8, 8, 8]
    cfg.model.crop_size = [64, 64]
    cfg.model.remat = False


def test_reference_style_uda_overrides_reach_train_config():
    """`model.mic=True`-style dot-overrides (the reference's surface) flow
    through build_madm into the TrainConfig consumed by the train step."""
    from madm_tpu.train import build_train_config

    cfg = LazyConfig.load(
        "config_files/SemSeg/MTMADISE/mtmadise_cityscapes_rgb_to_depth_11.py"
    )
    _tiny_model_overrides(cfg)
    LazyConfig.apply_overrides(
        cfg,
        ["model.mic=True", "model.mask_ratio=0.5", "model.fd=0.25",
         "model.denoise_supervise=2.0", "model.pl_crop=True",
         "model.noise_reg=0.5", "model.MIC_reg_wo_pl_val=True",
         "model.pseudo_weight_scope=batch"],
    )
    model = instantiate(cfg.model)
    tc = build_train_config(cfg, model.cfg)
    assert tc.mic is True and tc.mask_ratio == 0.5
    assert tc.fd == 0.25 and tc.denoise_supervise == 2.0
    assert tc.pl_crop is True and tc.noise_reg == 0.5
    assert tc.mic_reg_wo_pl_val is True
    assert tc.pseudo_weight_scope == "batch"
    # shipped values still present
    assert tc.rev_noise_sup is True and tc.rev_noise_end_iter == 5000
    assert tc.denoise_timestep_range == (60, 61)
    assert tc.vae_decoder_loss == "st" and tc.reg_uncertain is True
    assert tc.max_iter == 10000


def test_uda_namespace_overrides_model_node():
    from madm_tpu.train import build_train_config

    cfg = LazyConfig.load(
        "config_files/SemSeg/MTMADISE/mtmadise_cityscapes_rgb_to_depth_11.py"
    )
    _tiny_model_overrides(cfg)
    cfg.uda["rev_noise_end_iter"] = 1234
    model = instantiate(cfg.model)
    tc = build_train_config(cfg, model.cfg)
    assert tc.rev_noise_end_iter == 1234


def test_unknown_model_key_raises():
    """A typo'd knob raises instead of silently no-oping."""
    cfg = LazyConfig.load(
        "config_files/SemSeg/MTMADISE/mtmadise_cityscapes_rgb_to_depth_11.py"
    )
    _tiny_model_overrides(cfg)
    LazyConfig.apply_overrides(cfg, ["model.rev_noise_supp=True"])  # typo
    with pytest.raises(ValueError, match="rev_noise_supp"):
        instantiate(cfg.model)


def test_ignored_reference_keys_accepted():
    """Reference panoptic/DDP knobs are accepted and ignored."""
    cfg = LazyConfig.load(
        "config_files/SemSeg/MTMADISE/mtmadise_cityscapes_rgb_to_depth_11.py"
    )
    _tiny_model_overrides(cfg)
    LazyConfig.apply_overrides(
        cfg, ["model.num_queries=100", "model.add_zero_grad=True"]
    )
    instantiate(cfg.model)  # does not raise
