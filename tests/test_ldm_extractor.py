"""CompVis-legacy LdmExtractor path (reference ldm.py:56-782) + the CompVis
checkpoint key mapping (LdmCheckpointer contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madm_tpu.checkpoint.converter import (
    _compvis_unet_key,
    _compvis_vae_key,
    convert_compvis_state,
)
from madm_tpu.models.ldm_extractor import (
    LatentDiffusion,
    LdmExtractor,
    LdmImplicitCaptionerExtractor,
)

TINY = dict(
    unet_channels=(32, 64, 128, 128),
    vae_channels=(32, 32, 64, 64),
    compute_dtype=jnp.float32,
)


def test_feature_metadata_matches_reference():
    """Full-size dims/strides for the ODISE default tap set
    (ldm.py:229-331: encoder (5,7), unet (2,5,8,11), decoder (2,5))."""
    ex = LdmExtractor()
    assert ex.feature_dims == [512, 512, 2560, 1920, 960, 640, 512, 512]
    assert ex.feature_strides == [4, 8, 64, 32, 16, 8, 8, 4]
    assert ex.num_groups == 8
    # two steps duplicate the unet features, grouped per tap (ldm.py:359-380)
    ex2 = LdmExtractor(steps=(0, 100))
    assert ex2.grouped_indices[2] == [2, 6]
    assert len(ex2.feature_dims) == 2 + 8 + 2


@pytest.fixture(scope="module")
def tiny_extractor():
    ex = LdmExtractor(**TINY)
    variables = ex.init_params(jax.random.PRNGKey(0))
    return ex, variables


def test_extractor_forward_shapes(tiny_extractor):
    ex, variables = tiny_extractor
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 512, 512, 3))
    feats = jax.jit(ex)(variables, img)
    assert len(feats) == len(ex.feature_dims)
    for f, d, s in zip(feats, ex.feature_dims, ex.feature_strides):
        # tiny widths shrink channels but strides are architectural
        assert f.shape[1] == 512 // s, (f.shape, s)
        assert bool(jnp.isfinite(f).all())


def test_extractor_negative_step_uses_clean_latent(tiny_extractor):
    """steps=(-1,) skips q_sample (ldm.py:565-570)."""
    ex, variables = tiny_extractor
    ex_nonoise = LdmExtractor(steps=(-1,), **TINY)
    img = jax.random.uniform(jax.random.PRNGKey(2), (1, 512, 512, 3))
    f0 = jax.jit(ex_nonoise)(variables, img)
    f1 = jax.jit(ex_nonoise)(variables, img)
    np.testing.assert_array_equal(np.asarray(f0[0]), np.asarray(f1[0]))


def test_compvis_unet_key_mapping():
    m = _compvis_unet_key
    assert m("time_embed.0.weight") == "time_embedding.linear_1.weight"
    assert m("input_blocks.0.0.weight") == "conv_in.weight"
    assert m("input_blocks.1.0.in_layers.2.weight") == "down_blocks.0.resnets.0.conv1.weight"
    assert m("input_blocks.2.1.transformer_blocks.0.attn1.to_q.weight") == (
        "down_blocks.0.attentions.1.transformer_blocks.0.attn1.to_q.weight"
    )
    assert m("input_blocks.3.0.op.weight") == "down_blocks.0.downsamplers.0.conv.weight"
    assert m("middle_block.1.proj_out.weight") == "mid_block.attentions.0.proj_out.weight"
    assert m("middle_block.2.emb_layers.1.bias") == "mid_block.resnets.1.time_emb_proj.bias"
    assert m("output_blocks.0.0.skip_connection.weight") == (
        "up_blocks.0.resnets.0.conv_shortcut.weight"
    )
    # up block 0 has no attention: slot 1 conv is the upsampler
    assert m("output_blocks.2.1.conv.weight") == "up_blocks.0.upsamplers.0.conv.weight"
    # attentive up blocks: slot 1 attention, slot 2 upsampler
    assert m("output_blocks.5.1.ff.net.0.proj.weight") == (
        "up_blocks.1.attentions.2.ff.net.0.proj.weight"
    )
    assert m("output_blocks.5.2.conv.weight") == "up_blocks.1.upsamplers.0.conv.weight"
    assert m("out.0.weight") == "conv_norm_out.weight"
    assert m("out.2.bias") == "conv_out.bias"


def test_compvis_vae_key_mapping():
    m = _compvis_vae_key
    assert m("encoder.down.1.block.0.nin_shortcut.weight") == (
        "encoder.down_blocks.1.resnets.0.conv_shortcut.weight"
    )
    assert m("encoder.down.0.downsample.conv.weight") == (
        "encoder.down_blocks.0.downsamplers.0.conv.weight"
    )
    assert m("encoder.mid.attn_1.q.weight") == (
        "encoder.mid_block.attentions.0.to_q.weight"
    )
    assert m("encoder.norm_out.weight") == "encoder.conv_norm_out.weight"
    # decoder levels are reversed: CompVis up.3 is the lowest resolution
    assert m("decoder.up.3.block.0.norm1.weight") == (
        "decoder.up_blocks.0.resnets.0.norm1.weight"
    )
    assert m("decoder.up.1.upsample.conv.weight") == (
        "decoder.up_blocks.2.upsamplers.0.conv.weight"
    )
    assert m("quant_conv.weight") == "quant_conv.weight"


def test_convert_compvis_state_shapes():
    """End-to-end: synthetic CompVis tensors land in the right flax slots
    with 1x1 attention convs squeezed to linear."""
    sd = {
        "model.diffusion_model.time_embed.0.weight": np.zeros((16, 4), np.float32),
        "first_stage_model.encoder.mid.attn_1.q.weight": np.zeros((8, 8, 1, 1), np.float32),
        "first_stage_model.encoder.mid.attn_1.q.bias": np.zeros((8,), np.float32),
        "cond_stage_model.transformer.text_model.final_layer_norm.weight": np.zeros((4,), np.float32),
    }
    out = convert_compvis_state(sd)
    assert out["unet"]["time_embedding"]["linear_1"]["kernel"].shape == (4, 16)
    q = out["vae_encoder"]["mid_block"]["attentions_0"]["to_q"]
    assert q["kernel"].shape == (8, 8)  # squeezed + transposed to flax dense
    assert out["clip_text"]["final_layer_norm"]["scale"].shape == (4,)


def test_implicit_captioner_forward():
    from madm_tpu.models.clip_image import ClipAdapter, CLIPVisionTransformer

    ext = LdmImplicitCaptionerExtractor(
        ldm_extractor=LdmExtractor(**TINY), num_timesteps=1,
    )
    # shrink the CLIP tower for CPU (the full ViT-L is init-only overhead)
    ext.clip = ClipAdapter()
    ext.clip.vision = CLIPVisionTransformer(
        image_size=32, patch_size=8, width=64, layers=2, heads=4,
        mlp_dim=128, out_dim=48,
    )
    variables = ext.init_params(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 512, 512, 3))
    feats = jax.jit(lambda v, x: ext(v, x, input_modal="rgb"))(variables, img)
    assert len(feats) == len(ext.feature_dims)
    assert all(bool(jnp.isfinite(f).all()) for f in feats)


def test_guidance_combine():
    ld = LatentDiffusion(guidance_scale=2.0)
    x = jnp.ones((2, 4, 4, 4))
    model = lambda xx, t, c: xx * jnp.asarray([1.0])  # eps == input
    out = ld.apply_model_with_guidence(model, x, jnp.zeros((2,), jnp.int32), None)
    assert out.shape == x.shape
