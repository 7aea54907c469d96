"""Attention-feature producer + multi_layer_prompt (tiny model).

The reference STORES attention_features_res/location and READS
target_attention_loss / attention_select_index / FD_attention, but its
producer is broken dead code: ``attention_features`` is set to ``{}`` and
never filled (``feature_extractor.py:369``) and the consuming
``atte_controller`` is never defined anywhere (``cmdise.py:484-485``,
``mtmadise.py:259``).  These tests cover the WORKING implementation:
cross-attn probability taps at configurable res/location, the
``attention_features``/``up_cross``/``cross_attention_feat`` outputs, the
``fd_attention`` and ``target_attention_loss`` train losses, the head's
``concat_attention_to_conv_seg`` slot end-to-end, and the per-UNet-layer
prompts (``multi_layer_prompt``, ``ldm_base.py:635-660,927-934``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madm_tpu.models import prompt as prompt_lib
from madm_tpu.models.madm import MADM, MADMConfig
from madm_tpu.train import (
    TrainConfig,
    make_optimizer,
    make_train_state,
    make_train_step,
    split_trainable,
)
from madm_tpu.train.train_step import add_feature_distance_baseline

PALETTE = (70, 130, 180, 70, 70, 70, 190, 153, 153, 220, 20, 60, 153, 153, 153,
           128, 64, 128, 244, 35, 232, 107, 142, 35, 0, 0, 142, 102, 102, 156,
           250, 170, 30)

TINY = dict(
    num_classes=11, crop_size=(64, 64),
    unet_channels=(32, 64, 128, 128), vae_channels=(32, 32, 64, 64),
    feature_dims=(3, 32, 64, 128), projection_dim=(32, 32, 32, 32),
    lora_configs=("Depth_r16_a16",), compute_dtype=jnp.float32,
    train_palette=PALETTE,
)


def _batch(b=2):
    return {
        "source_rgb": jax.random.uniform(jax.random.PRNGKey(1), (b, 64, 64, 3)),
        "source_label": jax.random.randint(jax.random.PRNGKey(2), (b, 64, 64), 0, 11),
        "target_second_modality": jax.random.uniform(
            jax.random.PRNGKey(3), (b, 64, 64, 3)
        ),
    }


def _run_step(cfg: MADMConfig, tc: TrainConfig):
    model = MADM(cfg)
    variables = model.init_params(jax.random.PRNGKey(0))
    trainable, _ = split_trainable(variables)
    tx = make_optimizer(trainable, max_iter=10)
    state = make_train_state(model, variables, tx)
    if tc.fd or tc.fd_attention:
        state = add_feature_distance_baseline(state)
    step_fn = jax.jit(make_train_step(model, tc, tx))
    new_state, metrics = step_fn(state, _batch(), jax.random.PRNGKey(42))
    return model, new_state, metrics


# ------------------------------------------------------------ producer


def test_capture_shapes_and_normalization():
    """attention_features: {res: [B,h,w,77]}, rows softmax-normalized;
    up_cross ordered; cross_attention_feat = selected tokens at max res."""
    cfg = MADMConfig(
        **TINY,
        attention_features_res=(16, 32),
        attention_features_location=("up",),
        attention_select_index=tuple(range(11)),
    )
    model = MADM(cfg)
    variables = model.init_params(jax.random.PRNGKey(0))
    images = jax.random.uniform(jax.random.PRNGKey(7), (2, 64, 64, 3))
    out = model.backbone_forward(variables, images, capture_attention=True)
    feats = out["attention_features"]
    # crop 64 -> latent 8; 'res 16' = stride 32 = 2x2, 'res 32' = stride 16 = 4x4
    assert set(feats) == {16, 32}
    assert feats[16].shape == (2, 2, 2, 77)
    assert feats[32].shape == (2, 4, 4, 77)
    for p in feats.values():  # head-averaged softmax rows sum to 1
        np.testing.assert_allclose(
            np.asarray(p.sum(-1)), np.ones(p.shape[:-1]), atol=1e-4
        )
    # up blocks 1 (res 16) and 2 (res 32) have 3 cross-attn layers each
    assert len(out["up_cross"]) == 6
    assert out["cross_attention_feat"].shape == (2, 4, 4, 11)


def test_capture_locations_down_mid():
    cfg = MADMConfig(
        **TINY,
        attention_features_res=(8, 64),
        attention_features_location=("down", "mid"),
    )
    model = MADM(cfg)
    variables = model.init_params(jax.random.PRNGKey(0))
    images = jax.random.uniform(jax.random.PRNGKey(7), (1, 64, 64, 3))
    out = model.backbone_forward(variables, images, capture_attention=True)
    feats = out["attention_features"]
    # 'res 64' = stride 8 = down block 0 at latent 8x8; 'res 8' = mid at 1x1
    assert set(feats) == {8, 64}
    assert feats[64].shape == (1, 8, 8, 77)
    assert feats[8].shape == (1, 1, 1, 77)
    assert out["up_cross"] == []


def test_no_capture_by_default():
    cfg = MADMConfig(**TINY)
    model = MADM(cfg)
    variables = model.init_params(jax.random.PRNGKey(0))
    images = jax.random.uniform(jax.random.PRNGKey(7), (1, 64, 64, 3))
    out = model.backbone_forward(variables, images)
    assert "attention_features" not in out


# ------------------------------------------------------------ train losses


def test_fd_attention_loss():
    """FD_attention: MSE between student and frozen-init up-block cross-attn
    maps (reference main.py:545-548 + mtmadise.py:533-546)."""
    cfg = MADMConfig(
        **TINY,
        attention_features_res=(16, 32),
        attention_features_location=("up",),
    )
    tc = TrainConfig(max_iter=10, rev_noise_end_iter=5, fd_attention=0.5)
    _, _, metrics = _run_step(cfg, tc)
    assert "feature_distance_loss" in metrics
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} = {v}"
    # at step 0 the student IS the init snapshot except for LoRA-free RGB
    # pass == ori pass -> the distance should be ~0
    assert float(metrics["feature_distance_loss"]) < 1e-6


def test_target_attention_loss():
    cfg = MADMConfig(
        **TINY,
        attention_features_res=(16, 32),
        attention_features_location=("up",),
        target_attention_loss=True,
    )
    tc = TrainConfig(max_iter=10, rev_noise_end_iter=5, target_attention_loss=True)
    _, _, metrics = _run_step(cfg, tc)
    assert "target_attention_loss" in metrics
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} = {v}"


def test_concat_attention_head_end_to_end():
    """concat_attention_to_conv_seg: conv_seg consumes channels+num_classes
    (daformer_head.py:575,677-688) through train step AND eval."""
    cfg = MADMConfig(
        **TINY,
        attention_features_res=(32,),
        attention_features_location=("up",),
        attention_select_index=tuple(range(11)),
        concat_attention_to_conv_seg=True,
    )
    tc = TrainConfig(max_iter=10, rev_noise_end_iter=5)
    model, state, metrics = _run_step(cfg, tc)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} = {v}"
    # conv_seg kernel carries the concat slot
    k = state.params["head"]["conv_seg"]["kernel"]
    assert k.shape[-2] == model.head.channels + cfg.num_classes
    # eval path
    variables = {"params": state.params, "ema": state.ema,
                 "state": state.state, "consts": state.consts}
    logits = model.eval_forward(
        variables, jax.random.uniform(jax.random.PRNGKey(9), (1, 64, 64, 3)),
        lora_name="Depth",
    )
    assert logits.shape == (1, 64, 64, 11)
    assert np.isfinite(np.asarray(logits)).all()


# ------------------------------------------------------------ multi-layer prompt


def test_multi_layer_prompt_shapes():
    p = prompt_lib.init_clip_feature_project(0, multi_layer_prompt=True)
    assert p["prompt_embed"].shape == (16, 1, 77, 768)
    assert p["alpha_cond_prompt"].shape == (16, 1, 77, 768)
    uncond = jnp.zeros((1, 77, 768))
    cp = prompt_lib.cond_prompt(p, uncond)
    assert cp.shape == (16, 1, 77, 768)
    # mask_prompt handles the per-layer form (ldm_base.py:927-938)
    masked = prompt_lib.mask_prompt(jax.random.PRNGKey(0), cp, 0.5)
    assert masked.shape == cp.shape


def test_multi_layer_prompt_forward_and_step():
    """Per-layer context: identical rows reproduce the shared-prompt pass;
    a full train step runs finite."""
    cfg = MADMConfig(**TINY, multi_layer_prompt=True)
    model = MADM(cfg)
    variables = model.init_params(jax.random.PRNGKey(0))
    p = variables["params"]["prompt"]["clip_project_rgb"]
    assert p["prompt_embed"].shape[0] == 16

    # tie all 16 layers to row 0 -> must equal the 3-d shared-context pass
    tied = jax.tree.map(lambda x: x, variables)
    tp = dict(p)
    for k in ("prompt_embed", "alpha_cond_prompt", "alpha_uncond_prompt"):
        tp[k] = jnp.broadcast_to(tp[k][:1], tp[k].shape)
    tied["params"] = {**variables["params"],
                      "prompt": {"clip_project_rgb": tp}}
    images = jax.random.uniform(jax.random.PRNGKey(7), (1, 64, 64, 3))
    out_ml = model.backbone_forward(tied, images)

    shared_cfg = MADMConfig(**TINY)
    shared_model = MADM(shared_cfg)
    sp = {k: v[0] for k, v in tp.items()}
    shared_vars = {**variables,
                   "params": {**variables["params"],
                              "prompt": {"clip_project_rgb": sp}}}
    out_sh = shared_model.backbone_forward(shared_vars, images)
    np.testing.assert_allclose(
        np.asarray(out_ml["unet_taps"][0]), np.asarray(out_sh["unet_taps"][0]),
        atol=1e-5,
    )

    tc = TrainConfig(max_iter=10, rev_noise_end_iter=5)
    _, _, metrics = _run_step(cfg, tc)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} = {v}"
