"""finetune_unet trainability masks (reference ldm_diffusers.py:101-141).

Modes: 'no' | 'all' | 'attention' | 'without cross-attention'; in every mode
conv_norm_out/conv_out stay frozen ('all' included) — they are strictly
downstream of the last feature tap, which the reference's probe backward
(`exclude_unused_params`) leaves with grad None.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madm_tpu.models.madm import MADM, MADMConfig
from madm_tpu.train.optimizer import (
    merge_trainable,
    split_trainable,
    unet_trainable_mask,
)

TINY = dict(
    num_classes=11, crop_size=(64, 64),
    unet_channels=(32, 64, 128, 128), vae_channels=(32, 32, 64, 64),
    feature_dims=(3, 32, 64, 128), projection_dim=(32, 32, 32, 32),
    compute_dtype=jnp.float32,
    train_palette=tuple(range(33)),
)


@pytest.fixture(scope="module")
def variables():
    model = MADM(MADMConfig(**TINY))
    return model.init_params(jax.random.PRNGKey(0))


def leaf_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from leaf_paths(v, prefix + (k,))
    else:
        yield prefix


def test_mode_no_freezes_whole_unet(variables):
    trainable, frozen = split_trainable(variables, "no")
    assert "unet" not in trainable
    assert "unet" in frozen
    # prompt/projections/head still train
    assert {"prompt", "projections", "head"} <= set(trainable)


def test_mode_all_freezes_only_tail(variables):
    trainable, frozen = split_trainable(variables, "all")
    assert set(frozen["unet"]) == {"conv_norm_out", "conv_out"}
    assert "conv_out" not in trainable["unet"]
    assert "conv_in" in trainable["unet"]


def test_mode_attention_trains_only_attention(variables):
    trainable, frozen = split_trainable(variables, "attention")
    for path in leaf_paths(trainable["unet"]):
        assert any("attentions" in p for p in path), path
    # resnets exist in the frozen side
    assert any(
        any("resnets" in p for p in path) for path in leaf_paths(frozen["unet"])
    )


def test_mode_without_cross_attention_excludes_attn2(variables):
    trainable, frozen = split_trainable(variables, "without cross-attention")
    for path in leaf_paths(trainable["unet"]):
        assert "attn2" not in path, path
    assert any("attn2" in path for path in leaf_paths(frozen["unet"]))
    # self-attention still trains
    assert any("attn1" in path for path in leaf_paths(trainable["unet"]))


@pytest.mark.parametrize(
    "mode", ["no", "all", "attention", "without cross-attention"]
)
def test_merge_round_trips(variables, mode):
    trainable, frozen = split_trainable(variables, mode)
    merged = merge_trainable(trainable, frozen)
    orig_paths = set(leaf_paths(variables["params"]))
    assert set(leaf_paths(merged)) == orig_paths
    for path in orig_paths:
        a = variables["params"]
        b = merged
        for p in path:
            a, b = a[p], b[p]
        assert a is b, path


def test_unknown_mode_raises(variables):
    with pytest.raises(ValueError):
        unet_trainable_mask(variables["params"]["unet"], "everything")


def test_train_step_respects_attention_mode(variables):
    """One step with finetune_unet='attention': attention weights move,
    resnet weights don't."""
    from madm_tpu.train import (
        TrainConfig, make_optimizer, make_train_state, make_train_step,
    )

    model = MADM(MADMConfig(**TINY, finetune_unet="attention"))
    trainable, _ = split_trainable(variables, "attention")
    tx = make_optimizer(trainable, max_iter=10)
    state = make_train_state(model, variables, tx)
    tc = TrainConfig(max_iter=10, rev_noise_sup=False, reg_uncertain=False)
    step_fn = jax.jit(make_train_step(model, tc, tx))
    batch = {
        "source_rgb": jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3)),
        "source_label": jax.random.randint(jax.random.PRNGKey(2), (1, 64, 64), 0, 11),
        "target_second_modality": jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3)),
    }
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(42))
    assert np.isfinite(float(metrics["total_loss"]))
    old_u, new_u = state.params["unet"], new_state.params["unet"]
    # an attention weight moved (up-block: seq > 1 so softmax grads are
    # nonzero; the tiny config's mid-block runs at 1x1 where they vanish)
    blk = "transformer_blocks_0"
    old_q = old_u["up_blocks_3"]["attentions_0"][blk]["attn1"]["to_q"]["kernel"]
    new_q = new_u["up_blocks_3"]["attentions_0"][blk]["attn1"]["to_q"]["kernel"]
    assert not np.array_equal(np.asarray(old_q), np.asarray(new_q))
    # a resnet conv did not
    np.testing.assert_array_equal(
        np.asarray(old_u["mid_block"]["resnets_0"]["conv1"]["kernel"]),
        np.asarray(new_u["mid_block"]["resnets_0"]["conv1"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(old_u["conv_out"]["kernel"]),
        np.asarray(new_u["conv_out"]["kernel"]),
    )
