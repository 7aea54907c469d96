"""Sliding-window inference: batched crops == reference accumulate semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madm_tpu.evaluation.inference import make_slide_eval_fn, pad_to_divisible
from madm_tpu.models.madm import MADM, MADMConfig

TINY = dict(
    num_classes=5,
    crop_size=(64, 64),
    unet_channels=(32, 64, 128, 128),
    vae_channels=(32, 32, 64, 64),
    feature_dims=(3, 32, 64, 128),
    projection_dim=(32, 32, 32, 32),
    compute_dtype=jnp.float32,
)

# 64-wide crops over a 64x128 image, 32-px overlap (the 512x1024 pattern
# scaled down: reference feature_extractor.py:75)
WINDOWS = ((0, 64, 0, 64), (0, 64, 32, 96), (0, 64, 64, 128))


@pytest.fixture(scope="module")
def model_vars():
    model = MADM(MADMConfig(**TINY))
    return model, model.init_params(jax.random.PRNGKey(0))


def test_slide_matches_manual_accumulate(model_vars):
    model, variables = model_vars
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 128, 3))

    slide_fn = make_slide_eval_fn(model, windows=WINDOWS)
    pred = slide_fn(variables, img)
    assert pred.shape == (1, 64, 128)

    # manual reference: per-crop features accumulated + count-normalized,
    # head once on the stitched maps (feature_extractor.py:199-278)
    feats_fn = jax.jit(
        lambda v, x: model.backbone_forward(v, x, input_modal="others")[
            "output_features"
        ]
    )
    strides = model._strides()
    canvases = {}
    counts = {}
    for (y1, y2, x1, x2) in WINDOWS:
        crop_feats = feats_fn(variables, img[:, y1:y2, x1:x2])
        for name, s in zip(model.cfg.out_features, strides):
            f = np.asarray(crop_feats[name], np.float32)
            if name not in canvases:
                c = np.zeros((1, 64 // s, 128 // s, f.shape[-1]), np.float32)
                canvases[name] = c
                counts[name] = np.zeros(c.shape[:3] + (1,), np.float32)
            canvases[name][:, y1 // s : y2 // s, x1 // s : x2 // s] += f
            counts[name][:, y1 // s : y2 // s, x1 // s : x2 // s] += 1
    stitched = {k: jnp.asarray(v / counts[k]) for k, v in canvases.items()}
    logits = jax.jit(lambda v, f: model.head_forward(v, f, use_sec_modal=True))(
        variables, stitched
    )
    from madm_tpu.models.daformer import resize_bilinear

    logits = resize_bilinear(logits.astype(jnp.float32), (64, 128))
    manual = np.asarray(jnp.argmax(logits, axis=-1))

    agree = (np.asarray(pred) == manual).mean()
    assert agree > 0.999, f"agreement {agree}"


def test_pad_to_divisible():
    img = jnp.zeros((1, 60, 100, 3))
    padded, (h, w) = pad_to_divisible(img, 64)
    assert padded.shape == (1, 64, 128, 3)
    assert (h, w) == (60, 100)
