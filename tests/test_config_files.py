"""The shipped experiment configs load and carry the reference's exact values."""

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
    assert cfg.uda["rev_noise_sup"] is True
    assert cfg.uda["rev_noise_end_iter"] == exp["rev_end"]
    assert cfg.uda["denoise_timestep_range"] == exp["t_range"]
    assert cfg.uda["vae_decoder_loss"] == exp["vdl"]
    assert cfg.uda["vae_decoder_loss_weight"] == exp["vdl_w"]
    assert cfg.uda["reg_uncertain"] is True
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
