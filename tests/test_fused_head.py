"""Fused Pallas eval head (ops/aspp.py): numerics vs the Flax head.

Runs the kernels in interpreter mode on CPU; the real-TPU path is exercised
by bench.py / eval on hardware.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madm_tpu.models.daformer import DAFormerHead
from madm_tpu.ops.aspp import dw_branches, fused_head_forward, matmul_argmax


def _jitter(tree, seed=[0]):
    def f(x):
        seed[0] += 1
        r = np.random.default_rng(seed[0])
        return jnp.asarray(r.uniform(0.5, 1.5, x.shape).astype(np.float32))

    return jax.tree.map(f, tree)


def test_dw_branches_matches_dilated_depthwise_conv():
    rng = np.random.default_rng(0)
    B, H, W = 1, 64, 128
    embeds = [jnp.asarray(rng.normal(size=(B, H, W, 256)).astype(np.float32))
              for _ in range(4)]
    x = jnp.concatenate(embeds, -1)
    dil = (6, 12, 18)
    dw_w = jnp.asarray(rng.normal(size=(3, 3, 3, 1024)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(3, 1024)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(3, 1024)).astype(np.float32))
    outs = dw_branches(embeds, dw_w, scale, bias, dil, interpret=True)
    for di, d in enumerate(dil):
        ref = jax.lax.conv_general_dilated(
            x, dw_w[di][:, :, None, :], (1, 1), ((d, d), (d, d)),
            rhs_dilation=(d, d), feature_group_count=1024,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        ref = jnp.maximum(ref * scale[di] + bias[di], 0.0)
        np.testing.assert_allclose(np.asarray(outs[di]), np.asarray(ref),
                                   atol=1e-3)
    # single-concat input path (used by the fused head)
    outs1 = dw_branches([x], dw_w[:1], scale[:1], bias[:1], (6,), interpret=True)
    np.testing.assert_allclose(np.asarray(outs1[0]), np.asarray(outs[0]),
                               atol=1e-3)


def test_matmul_argmax_matches_jnp():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 64, 128, 256)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(256, 11)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(11,)).astype(np.float32))
    ids = matmul_argmax(x, w, b, interpret=True)
    ref = jnp.argmax(x @ w + b, axis=-1).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref))


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_fused_head_matches_flax_head(impl, monkeypatch):
    monkeypatch.setenv("MADM_DW_IMPL", impl)
    rng = np.random.default_rng(1)
    feats = {
        "s0": jnp.asarray(rng.normal(size=(1, 64, 128, 32)).astype(np.float32)),
        "s3": jnp.asarray(rng.normal(size=(1, 8, 16, 48)).astype(np.float32)),
        "s4": jnp.asarray(rng.normal(size=(1, 4, 8, 64)).astype(np.float32)),
        "s5": jnp.asarray(rng.normal(size=(1, 2, 4, 80)).astype(np.float32)),
    }
    head = DAFormerHead(in_keys=("s0", "s3", "s4", "s5"), num_classes=11,
                        dtype=jnp.float32)
    variables = head.init(jax.random.PRNGKey(0), feats)
    params, bn = variables["params"], _jitter(variables["batch_stats"])
    logits = head.apply({"params": params, "batch_stats": bn}, feats, train=False)
    ref_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    ids = fused_head_forward(params, bn, feats, ("s0", "s3", "s4", "s5"), 11,
                             compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))


def test_eval_forward_ids_falls_back_on_cpu():
    """On CPU (MADM_FUSED_HEAD=auto) eval_forward_ids takes the XLA path and
    equals argmax(eval_forward)."""
    from madm_tpu.models.madm import MADM, MADMConfig

    model = MADM(MADMConfig(
        num_classes=5, crop_size=(64, 64),
        unet_channels=(32, 64, 128, 128), vae_channels=(32, 32, 64, 64),
        feature_dims=(3, 32, 64, 128), projection_dim=(32, 32, 32, 32),
        compute_dtype=jnp.float32,
    ))
    variables = model.init_params(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    ids = jax.jit(model.eval_forward_ids)(variables, img)
    ref = jnp.argmax(jax.jit(model.eval_forward)(variables, img), axis=-1)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref).astype(np.int32))


def test_prompt_structure_knobs_and_single_scale_graph():
    """without_prompt / prompt_seq_len build + eval; the single-scale
    feature graph (reference --single_scale_decoder) is expressible with
    plain config overrides."""
    from madm_tpu.models.madm import MADM, MADMConfig

    base = dict(num_classes=5, crop_size=(64, 64),
                unet_channels=(32, 64, 128, 128), vae_channels=(32, 32, 64, 64),
                compute_dtype=jnp.float32)

    m = MADM(MADMConfig(**base, feature_dims=(3, 32, 64, 128),
                        projection_dim=(32, 32, 32, 32), without_prompt=True))
    v = m.init_params(jax.random.PRNGKey(0))
    assert "prompt_embed" not in v["params"]["prompt"]["clip_project_rgb"]
    ids = jax.jit(m.eval_forward_ids)(
        v, jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3)))
    assert ids.shape == (1, 64, 64)

    m2 = MADM(MADMConfig(**base, feature_dims=(3, 32, 64, 128),
                         projection_dim=(32, 32, 32, 32), prompt_seq_len=40))
    v2 = m2.init_params(jax.random.PRNGKey(0))
    assert v2["params"]["prompt"]["clip_project_rgb"]["prompt_embed"].shape[1] == 40
    ids2 = jax.jit(m2.eval_forward_ids)(
        v2, jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3)))
    assert ids2.shape == (1, 64, 64)

    m3 = MADM(MADMConfig(**base, out_features=("s3",), feature_dims=(32,),
                         projection_dim=(32,), in_keys=("s3",),
                         unet_block_indices=(11,), vae_decoder_loss=""))
    v3 = m3.init_params(jax.random.PRNGKey(0))
    ids3 = jax.jit(m3.eval_forward_ids)(
        v3, jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3)))
    assert ids3.shape == (1, 64, 64)


def test_clip_state_prefix_conditioning():
    """clip_state='no_learnable_clip': a frozen CLIP tower feeds
    PositionalLinear prompts (reference --with_clip, ldm_base.py:844-853);
    'learnable_clip' adds the EMA copy for teacher passes."""
    from madm_tpu.models.clip_image import ClipAdapter, CLIPVisionTransformer
    from madm_tpu.models.madm import MADM, MADMConfig
    from madm_tpu.train.optimizer import split_trainable

    base = dict(num_classes=5, crop_size=(64, 64),
                unet_channels=(32, 64, 128, 128), vae_channels=(32, 32, 64, 64),
                feature_dims=(3, 32, 64, 128), projection_dim=(32, 32, 32, 32),
                compute_dtype=jnp.float32)
    m = MADM(MADMConfig(**base, clip_state="no_learnable_clip"))
    m.clip_adapter = ClipAdapter()
    m.clip_adapter.vision = CLIPVisionTransformer(
        image_size=32, patch_size=8, width=64, layers=2, heads=4,
        mlp_dim=128, out_dim=48,
    )
    v = m.init_params(jax.random.PRNGKey(0))
    assert "clip_vision" in v["params"]
    assert "prompt_embed_project" in v["params"]["prompt"]["clip_project_rgb"]
    ids = jax.jit(m.eval_forward_ids)(
        v, jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3)))
    assert ids.shape == (1, 64, 64)
    # frozen tower stays out of the trainable tree
    trainable, frozen = split_trainable(v, learnable_clip=False)
    assert "clip_vision" in frozen and "clip_vision" not in trainable

    m2 = MADM(MADMConfig(**base, clip_state="learnable_clip"))
    m2.clip_adapter = m.clip_adapter
    v2 = m2.init_params(jax.random.PRNGKey(0))
    assert "clip_vision" in v2["ema"]  # teacher copy exists
    trainable2, _ = split_trainable(v2, learnable_clip=True)
    assert "clip_vision" in trainable2


def test_aspp_fused_matches_module_composition():
    """aspp_fused (DW+BN+ReLU+PW+BN+ReLU per branch + aspp_0, one pallas
    pass) vs the same math composed from XLA ops."""
    from madm_tpu.ops.aspp import aspp_fused

    rng = np.random.default_rng(3)
    B, H, W = 1, 64, 128
    dil = (6, 12, 18)
    PC = 256
    embeds = [jnp.asarray(rng.normal(size=(B, H, W, 128)).astype(np.float32))
              for _ in range(2)]
    C = 256
    x = jnp.concatenate(embeds, -1)
    f = lambda *shape: jnp.asarray(rng.normal(size=shape).astype(np.float32))
    dw_w, dw_s, dw_b = f(3, 3, 3, C), f(3, C), f(3, C)
    pw_w, pw_s, pw_b = f(3, C, PC), f(3, PC), f(3, PC)
    a0_w, a0_s, a0_b = f(C, PC), f(PC), f(PC)

    out = aspp_fused(embeds, dw_w, dw_s, dw_b, pw_w, pw_s, pw_b,
                     a0_w, a0_s, a0_b, dil, interpret=True)
    assert out.shape == (B, H, W, (len(dil) + 1) * PC)

    ref0 = jnp.maximum((x @ a0_w) * a0_s + a0_b, 0.0)
    np.testing.assert_allclose(np.asarray(out[..., :PC]), np.asarray(ref0),
                               atol=2e-3)
    for di, d in enumerate(dil):
        dwo = jax.lax.conv_general_dilated(
            x, dw_w[di][:, :, None, :], (1, 1), ((d, d), (d, d)),
            rhs_dilation=(d, d), feature_group_count=C,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        dwo = jnp.maximum(dwo * dw_s[di] + dw_b[di], 0.0)
        ref = jnp.maximum((dwo @ pw_w[di]) * pw_s[di] + pw_b[di], 0.0)
        np.testing.assert_allclose(
            np.asarray(out[..., (di + 1) * PC : (di + 2) * PC]),
            np.asarray(ref), atol=5e-3,
        )


def test_aspp_fused_tiled_matches_untiled():
    """Column-strip tiling (halo 24 >= dilation 18, trimmed) is exact:
    tiled output == the single-pass kernel on the full width."""
    from madm_tpu.ops.aspp import aspp_fused, aspp_fused_tiled

    rng = np.random.default_rng(5)
    B, H, W = 1, 16, 256
    dil = (6, 12, 18)
    C, PC = 256, 256
    embeds = [jnp.asarray(rng.normal(size=(B, H, W, 128)).astype(np.float32))
              for _ in range(2)]
    f = lambda *shape: jnp.asarray(rng.normal(size=shape).astype(np.float32))
    args = (f(3, 3, 3, C), f(3, C), f(3, C), f(3, C, PC), f(3, PC), f(3, PC),
            f(C, PC), f(PC), f(PC))
    ref = aspp_fused(embeds, *args, dil, interpret=True)
    for w_tile in (64, 128):  # edge + interior strips, and a 2-strip split
        out = aspp_fused_tiled(embeds, *args, dil, w_tile=w_tile,
                               interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3)


def test_aspp_head_forward_wide_width_tiles(monkeypatch):
    """The 'aspp' eval head at a slide-path-like width (> the strip size)
    routes through aspp_fused_tiled and still matches the Flax head."""
    from madm_tpu.ops.aspp import aspp_head_forward

    monkeypatch.setenv("MADM_ASPP_WTILE", "64")
    rng = np.random.default_rng(6)
    feats = {
        "s0": jnp.asarray(rng.normal(size=(1, 16, 256, 32)).astype(np.float32)),
        "s3": jnp.asarray(rng.normal(size=(1, 2, 32, 48)).astype(np.float32)),
        "s4": jnp.asarray(rng.normal(size=(1, 2, 32, 64)).astype(np.float32)),
        "s5": jnp.asarray(rng.normal(size=(1, 2, 32, 80)).astype(np.float32)),
    }
    head = DAFormerHead(in_keys=("s0", "s3", "s4", "s5"), num_classes=11,
                        dtype=jnp.float32)
    variables = head.init(jax.random.PRNGKey(0), feats)
    params, bn = variables["params"], _jitter(variables["batch_stats"])
    logits = head.apply({"params": params, "batch_stats": bn}, feats,
                        train=False)
    ref_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    ids = aspp_head_forward(params, bn, feats, ("s0", "s3", "s4", "s5"), 11,
                            compute_dtype=jnp.float32, interpret=True)
    match = float((ids == ref_ids).mean())
    assert match > 0.999, match


def test_chunk_over_batch_exact():
    """Batch-chunked head dispatch (head_ids' stitched-memory bound) concats
    to exactly the unchunked result, including a ragged tail chunk."""
    from madm_tpu.models.madm import _chunk_over_batch
    from madm_tpu.ops.aspp import aspp_head_forward

    rng = np.random.default_rng(7)
    feats = {
        "s0": jnp.asarray(rng.normal(size=(3, 16, 128, 32)).astype(np.float32)),
        "s3": jnp.asarray(rng.normal(size=(3, 2, 16, 48)).astype(np.float32)),
        "s4": jnp.asarray(rng.normal(size=(3, 2, 16, 64)).astype(np.float32)),
        "s5": jnp.asarray(rng.normal(size=(3, 2, 16, 80)).astype(np.float32)),
    }
    head = DAFormerHead(in_keys=("s0", "s3", "s4", "s5"), num_classes=11,
                        dtype=jnp.float32)
    variables = head.init(jax.random.PRNGKey(0), feats)
    params, bn = variables["params"], _jitter(variables["batch_stats"])
    fn = lambda f: aspp_head_forward(
        params, bn, f, ("s0", "s3", "s4", "s5"), 11,
        compute_dtype=jnp.float32, interpret=True,
    )
    full = fn(feats)
    chunked = _chunk_over_batch(fn, feats, 2)  # chunks of 2 + ragged 1
    np.testing.assert_array_equal(np.asarray(chunked), np.asarray(full))


def test_aspp_head_forward_matches_flax_head():
    """'aspp' eval mode: module embeds + aspp_fused + XLA bottleneck/conv_seg
    must reproduce the Flax head's argmax ids."""
    from madm_tpu.ops.aspp import aspp_head_forward

    rng = np.random.default_rng(4)
    feats = {
        "s0": jnp.asarray(rng.normal(size=(1, 64, 128, 32)).astype(np.float32)),
        "s3": jnp.asarray(rng.normal(size=(1, 8, 16, 48)).astype(np.float32)),
        "s4": jnp.asarray(rng.normal(size=(1, 4, 8, 64)).astype(np.float32)),
        "s5": jnp.asarray(rng.normal(size=(1, 2, 4, 80)).astype(np.float32)),
    }
    head = DAFormerHead(in_keys=("s0", "s3", "s4", "s5"), num_classes=11,
                        dtype=jnp.float32)
    variables = head.init(jax.random.PRNGKey(0), feats)
    params, bn = variables["params"], _jitter(variables["batch_stats"])
    logits = head.apply({"params": params, "batch_stats": bn}, feats, train=False)
    ref_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    ids = aspp_head_forward(params, bn, feats, ("s0", "s3", "s4", "s5"), 11,
                            compute_dtype=jnp.float32, interpret=True)
    match = float((ids == ref_ids).mean())
    assert match > 0.999, match
