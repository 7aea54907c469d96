"""Unit tests: DACS ops, palette ops, criterion, EMA, optimizer masks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madm_tpu.ops import dacs, palette
from madm_tpu.train import criterion
from madm_tpu.train.ema import ema_alpha, update_ema
from madm_tpu.train.optimizer import lr_schedule, wd_mask

PALETTE_11 = [70, 130, 180, 70, 70, 70, 190, 153, 153, 220, 20, 60, 153, 153, 153,
              128, 64, 128, 244, 35, 232, 107, 142, 35, 0, 0, 142, 102, 102, 156,
              250, 170, 30]


# ------------------------------------------------------------------- DACS
def test_class_mask_selects_half_of_present_classes():
    rng = jax.random.PRNGKey(0)
    labels = jnp.array([[[0, 1], [2, 3]]], dtype=jnp.int32)  # 4 classes present
    mask = jax.jit(lambda r, l: dacs.sample_class_masks(r, l, 11))(rng, labels)
    assert mask.shape == (1, 2, 2)
    assert int(mask.sum()) == 2  # exactly half the pixels (each class 1 px)


def test_class_mask_ignores_255():
    rng = jax.random.PRNGKey(1)
    labels = jnp.full((1, 4, 4), 255, dtype=jnp.int32)
    mask = jax.jit(lambda r, l: dacs.sample_class_masks(r, l, 11))(rng, labels)
    assert float(mask.sum()) == 0.0


def test_one_mix():
    m = jnp.array([[[1.0, 0.0]]])[..., None]  # [1,1,2,1]
    a = jnp.ones((1, 1, 2, 3))
    b = jnp.zeros((1, 1, 2, 3))
    out = dacs.one_mix(m, a, b)
    np.testing.assert_array_equal(np.asarray(out[0, 0, :, 0]), [1.0, 0.0])


def test_color_jitter_stays_in_range_and_can_change():
    rng = jax.random.PRNGKey(3)
    img = jax.random.uniform(jax.random.PRNGKey(4), (2, 8, 8, 3))
    out = jax.jit(lambda r, x: dacs.color_jitter(r, x, 0.5, 0.0))(rng, img)
    assert out.shape == img.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_gaussian_blur_preserves_mean_roughly():
    rng = jax.random.PRNGKey(5)
    img = jax.random.uniform(jax.random.PRNGKey(6), (1, 32, 32, 3))
    out = jax.jit(dacs.gaussian_blur)(rng, img)
    assert out.shape == img.shape
    # blur (or identity) keeps the global mean approximately
    assert abs(float(out.mean()) - float(img.mean())) < 0.05


def test_block_mask_ratio():
    rng = jax.random.PRNGKey(7)
    m = jax.jit(lambda r: dacs.block_mask(r, (4, 64, 64), mask_ratio=0.7, block_size=32))(rng)
    assert m.shape == (4, 64, 64, 1)
    keep = float(m.mean())
    assert 0.0 <= keep <= 0.8  # E[keep] = 0.3


def test_mask_image_fills_half():
    rng = jax.random.PRNGKey(8)
    img = jnp.ones((1, 64, 64, 3))
    out = jax.jit(dacs.mask_image)(rng, img)
    vals = np.unique(np.asarray(out))
    assert set(vals).issubset({0.5, 1.0})


# ----------------------------------------------------------------- palette
def test_label_to_rgb_matches_pil_palette():
    from PIL import Image

    table = jnp.asarray(palette.palette_table(list(PALETTE_11)))
    labels = np.array([[0, 5, 10, 255]], dtype=np.int32)[None]  # [1,1,4]
    rgb, valid = jax.jit(lambda l: palette.label_to_rgb(l, table))(jnp.asarray(labels))
    # PIL reference
    pil_palette = list(PALETTE_11) + [0] * (768 - len(PALETTE_11))
    img = Image.fromarray(labels[0].astype(np.uint8), mode="P")
    img.putpalette(pil_palette)
    ref = np.array(img.convert("RGB")).astype(np.float32) / 255.0
    ref = (ref - 0.5) / 0.5
    np.testing.assert_allclose(np.asarray(rgb[0]), ref, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(valid[0, :, :, 0]), [[1, 1, 1, 0]])


def test_palette_distance_pseudo_label_recovers_exact_colors():
    table_full = palette.palette_table(list(PALETTE_11))
    class_table = jnp.asarray(table_full[:11])
    # pixels exactly at palette colors 3 and 7
    img = jnp.stack([class_table[3], class_table[7]])[None, None]  # [1,1,2,3]
    prob, lbl, sm = jax.jit(
        lambda x: palette.palette_distance_pseudo_label(x, class_table)
    )(img)
    np.testing.assert_array_equal(np.asarray(lbl[0, 0]), [3, 7])


def test_convert_labels_lut():
    labels = jnp.array([[0, 1, 2, 255]], dtype=jnp.int32)
    out = palette.convert_labels(labels, np.array([[0, 5], [1, 6]]))
    np.testing.assert_array_equal(np.asarray(out[0]), [5, 6, 2, 255])


def test_reg_target_table_selects_discrete_palette():
    """reg_target_palette: None -> train palette; 'discrete' -> the fixed
    high-contrast palette (mtmadise.py:83-103); anything else rejected."""
    train = list(PALETTE_11)
    np.testing.assert_array_equal(
        palette.reg_target_table(train, None), palette.palette_table(train)
    )
    disc = palette.reg_target_table(train, "discrete")
    np.testing.assert_array_equal(
        disc, palette.palette_table(palette.DISCRETE_PALETTE)
    )
    assert not np.array_equal(disc, palette.palette_table(train))
    with pytest.raises(ValueError):
        palette.reg_target_table(train, "neon")
    # config plumb: accepted as a model knob through build_madm
    from madm_tpu.models.build import build_madm

    model = build_madm(
        num_classes=11, train_palette=train, reg_target_palette="discrete",
        lora_configs=("Depth_r16_a16",),
        feature_dims=(3, 32, 64, 128), projection_dim=(32, 32, 32, 32),
        crop_size=(64, 64), unet_channels=(32, 64, 128, 128),
        vae_channels=(32, 32, 64, 64),
    )
    assert model.cfg.reg_target_palette == "discrete"


# --------------------------------------------------------------- criterion
def test_cross_entropy_matches_torch_semantics():
    import torch
    import torch.nn.functional as tF

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 4, 4, 5)).astype(np.float32)
    labels = rng.integers(0, 5, (2, 8, 8)).astype(np.int64)
    labels[0, 0, :] = 255
    pw = rng.uniform(size=(2, 8, 8)).astype(np.float32)

    ours = criterion.cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), pixel_weight=jnp.asarray(pw)
    )
    # torch: upsample logits NCHW, CE 'none' with ignore, * pw, .mean()
    tl = torch.from_numpy(logits).permute(0, 3, 1, 2)
    tl = tF.interpolate(tl, size=(8, 8), mode="bilinear", align_corners=False)
    loss = tF.cross_entropy(tl, torch.from_numpy(labels), reduction="none",
                            ignore_index=255)
    ref = (loss * torch.from_numpy(pw)).mean().item()
    np.testing.assert_allclose(float(ours), ref, rtol=2e-3)


def test_vae_decoder_loss_mask_and_normalization():
    pred = jnp.ones((1, 4, 4, 4))
    gt = jnp.zeros((1, 4, 4, 4))
    mask = jnp.ones((1, 32, 32, 1)).at[:, :16].set(0.0)  # half masked out
    loss = criterion.vae_decoder_loss(pred, gt, mask, "L1", 2.0)
    # |1-0| * mask summed = half the elements; / numel * 2.0 = 1.0
    np.testing.assert_allclose(float(loss), 1.0, rtol=1e-6)


# --------------------------------------------------------------------- EMA
def test_ema_alpha_schedule():
    assert float(ema_alpha(jnp.asarray(0.0))) == 0.0
    assert float(ema_alpha(jnp.asarray(1.0))) == 0.5
    np.testing.assert_allclose(float(ema_alpha(jnp.asarray(1e6))), 0.999, rtol=1e-6)


def test_update_ema():
    ema = {"w": jnp.zeros((2,))}
    student = {"w": jnp.ones((2,))}
    out = update_ema(ema, student, jnp.asarray(0.9))
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, rtol=1e-6)


# --------------------------------------------------------------- optimizer
def test_wd_mask_excludes_bias_and_scale():
    params = {
        "dense": {"kernel": 1, "bias": 2},
        "norm": {"scale": 3, "bias": 4},
        "embed": {"prompt_embed": 5},
    }
    m = wd_mask(params)
    assert m["dense"]["kernel"] is True
    assert m["dense"]["bias"] is False
    assert m["norm"]["scale"] is False
    assert m["embed"]["prompt_embed"] is True


def test_lr_schedule_warmup_and_steps():
    sched = lr_schedule(1.0, 10000)
    assert float(sched(jnp.asarray(0))) < 0.1  # warmup start ~0.067
    assert abs(float(sched(jnp.asarray(100))) - 1.0) < 1e-6  # past warmup
    assert abs(float(sched(jnp.asarray(9000))) - 0.1) < 1e-6  # first step
    assert abs(float(sched(jnp.asarray(9700))) - 0.01) < 1e-6  # second step


def test_adafactor_option_finite_updates_and_factored_state():
    """The opt-in single-chip-memory optimizer: factored second moment
    (no full-size ``v`` buffer for matrix params), bf16 momentum, same
    global-norm clip / WD-mask plumbing as the adamw path."""
    from madm_tpu.train.optimizer import make_optimizer

    params = {
        "dense": {"kernel": jnp.ones((256, 256)), "bias": jnp.zeros((256,))},
        "norm": {"scale": jnp.ones((256,))},
    }
    tx = make_optimizer(params, base_lr=1e-3, weight_decay=0.05,
                        max_iter=100, grad_clip=0.01, name="adafactor")
    state = tx.init(params)
    grads = jax.tree.map(lambda p: jnp.full_like(p, 0.5), params)
    updates, state = jax.jit(tx.update)(grads, state, params)
    for leaf in jax.tree.leaves(updates):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    # factored second moment: state holds row/col stats, never a full
    # [256,256] fp32 v for the kernel; momentum buffers are bf16
    dtypes_and_shapes = [(l.dtype, l.shape) for l in jax.tree.leaves(state)
                         if hasattr(l, "shape")]
    assert any(d == jnp.bfloat16 and s == (256, 256)
               for d, s in dtypes_and_shapes), "bf16 momentum missing"
    full_f32 = [s for d, s in dtypes_and_shapes
                if d == jnp.float32 and s == (256, 256)]
    assert not full_f32, f"unfactored fp32 second moment present: {full_f32}"
    # a second step moves the params the right way (descent on +grads)
    new_params = jax.tree.map(lambda p, u: p + u, params, updates)
    assert float(new_params["dense"]["kernel"][0, 0]) < 1.0


# -------------------------------------------------------------- evaluator
def test_evaluator_miou():
    from madm_tpu.evaluation import DSECSemSegEvaluator

    ev = DSECSemSegEvaluator(stuff_classes=["a", "b", "c"])
    gt = np.array([[0, 0, 1], [1, 2, 255]], dtype=np.int32)
    pred = np.array([[0, 1, 1], [1, 2, 0]], dtype=np.int32)
    ev.process({"target_label": gt}, pred)
    res = ev.evaluate(sum_across_processes=False)["sem_seg"]
    # class a: tp=1 gt=2 pred=1(+1 on ignore, excluded col) -> iou 1/2
    # class b: tp=2 gt=2 pred=2 -> wait pred b appears twice, gt b twice, tp=2? pred[0,1]=1,gt=0
    # verified numerically: conf[:-1,:-1] excludes ignore column
    iou_a = res["IoU-a"]
    assert 0 < iou_a < 100
    ev.reset()
    # perfect prediction (255 pixels never appear in preds — argmax output)
    perfect = np.where(gt == 255, 0, gt)
    ev.process({"target_label": gt}, perfect)
    assert ev.evaluate(sum_across_processes=False)["sem_seg"]["mIoU"] == 100.0


# ------------------------------------------------------------ argmax helper
def test_argmax_classes_matches_jnp_argmax():
    """max+min-of-iota argmax (the eval hot path's simple-reduce form) must
    be bit-identical to jnp.argmax — including ties (first index) and bf16
    inputs (casting changes no ordering)."""
    import jax.numpy as jnp

    from madm_tpu.models.daformer import argmax_classes

    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 7, 11).astype(np.float32)
    # force ties: duplicate the max into an earlier channel for some pixels
    x[0, :, :, 3] = x[0].max(-1)
    for arr in (jnp.asarray(x), jnp.asarray(x, jnp.bfloat16)):
        got = argmax_classes(arr)
        want = jnp.argmax(arr, axis=-1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
