"""conv_in surgery ablations (reference ldm_diffusers.py:60-99,165-178):
input_channel_plus + mask_diff, concat_pixel_shuffle, add/norm latent noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madm_tpu.checkpoint import expand_conv_in
from madm_tpu.models.madm import MADM, MADMConfig

TINY = dict(
    num_classes=5, crop_size=(64, 64),
    unet_channels=(32, 64, 128, 128), vae_channels=(32, 32, 64, 64),
    feature_dims=(3, 32, 64, 128), projection_dim=(32, 32, 32, 32),
    compute_dtype=jnp.float32, target_modality="Depth",
    train_palette=tuple(range(15)),
)


def test_expand_conv_in_input_channel_plus():
    k = np.random.default_rng(0).normal(size=(3, 3, 4, 8)).astype(np.float32)
    out = expand_conv_in(k, input_channel_plus=1)
    assert out.shape == (3, 3, 5, 8)
    # the reference's literal scale is (4./4 + N) == 1 + N
    np.testing.assert_allclose(out[:, :, :4], k * 2.0, rtol=1e-6)
    np.testing.assert_allclose(out[:, :, 4], k[:, :, 3] * 2.0, rtol=1e-6)


def test_expand_conv_in_pixel_shuffle():
    k = np.random.default_rng(1).normal(size=(3, 3, 4, 8)).astype(np.float32)
    out = expand_conv_in(k, concat_pixel_shuffle=True)
    assert out.shape == (3, 3, 68, 8)
    for i in range(0, 68, 4):
        np.testing.assert_allclose(out[:, :, i : i + 4], k / 17.0, rtol=1e-6)


def test_mask_diff_model_runs():
    model = MADM(MADMConfig(
        **TINY, input_channel_plus=1, mask_diff="rgb=0_Depth=1",
    ))
    assert model.unet_in_channels == 5
    assert model.mask_val == {"rgb": 0.0, "Depth": 1.0}
    variables = model.init_params(jax.random.PRNGKey(0))
    assert variables["params"]["unet"]["conv_in"]["kernel"].shape[2] == 5
    logits = jax.jit(lambda v, x: model.eval_forward(v, x))(
        variables, jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    )
    assert logits.shape == (1, 64, 64, 5)
    assert bool(jnp.isfinite(logits).all())

    # mixed-pass mask: blends rgb/target values by the DACS mask, 8x nearest
    mix = jnp.zeros((1, 64, 64)).at[:, :32].set(1.0)
    m = model.mixed_modality_mask(mix, "Depth")
    assert m.shape == (1, 8, 8, 1)
    np.testing.assert_allclose(np.asarray(m[0, :4, :, 0]), 0.0)
    np.testing.assert_allclose(np.asarray(m[0, 4:, :, 0]), 1.0)


def test_mask_diff_train_step():
    from madm_tpu.train import (
        TrainConfig, make_optimizer, make_train_state, make_train_step,
        split_trainable,
    )

    model = MADM(MADMConfig(
        **TINY, input_channel_plus=1, mask_diff="rgb=0_Depth=1",
        add_latent_noise=0.1, norm_latent_noise=True,
    ))
    variables = model.init_params(jax.random.PRNGKey(0))
    tc = TrainConfig(max_iter=10, rev_noise_sup=False)
    trainable, _ = split_trainable({"params": variables["params"]})
    tx = make_optimizer(trainable, max_iter=10)
    state = make_train_state(model, variables, tx)
    step_fn = jax.jit(make_train_step(model, tc, tx))
    batch = {
        "source_rgb": jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3)),
        "source_label": jax.random.randint(jax.random.PRNGKey(3), (1, 64, 64), 0, 5),
        "target_second_modality": jax.random.uniform(jax.random.PRNGKey(4), (1, 64, 64, 3)),
    }
    _, metrics = step_fn(state, batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(metrics["total_loss"]))


def test_concat_pixel_shuffle_model_runs():
    model = MADM(MADMConfig(**TINY, concat_pixel_shuffle=True))
    assert model.unet_in_channels == 68
    variables = model.init_params(jax.random.PRNGKey(0))
    assert variables["params"]["unet"]["conv_in"]["kernel"].shape[2] == 68
    assert "pixel_unshuffle" in variables["params"]
    logits = jax.jit(lambda v, x: model.eval_forward(v, x))(
        variables, jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    )
    assert logits.shape == (1, 64, 64, 5)
    assert bool(jnp.isfinite(logits).all())
