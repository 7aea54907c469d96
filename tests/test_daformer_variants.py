"""DAFormer head variants (reference daformer_head.py:35-338,552-605,677-698):
ISA fusion, SelfAttentionBlock, final_fuse_vae_decoder_feat,
concat_attention_to_conv_seg."""

import jax
import jax.numpy as jnp
import numpy as np

from madm_tpu.models.daformer import (
    DAFormerHead,
    ISALayer,
    SelfAttentionBlock,
)

FEATS = {
    "s0": jnp.zeros((1, 64, 64, 16)),
    "s3": jnp.zeros((1, 8, 8, 24)),
    "s4": jnp.zeros((1, 4, 4, 32)),
    "s5": jnp.zeros((1, 2, 2, 40)),
}


def _rand_feats(key=0):
    rng = np.random.default_rng(key)
    return {k: jnp.asarray(rng.normal(size=v.shape).astype(np.float32))
            for k, v in FEATS.items()}


def test_self_attention_block():
    blk = SelfAttentionBlock(channels=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32))
    variables = blk.init(jax.random.PRNGKey(1), x)
    out = blk.apply(variables, x)
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())


def test_isa_layer_pads_non_divisible():
    """down_factor (8,8) on a 12x20 map exercises the centered-pad path
    (daformer_head.py:316-338)."""
    layer = ISALayer(channels=32, isa_channels=16, down_factor=(8, 8))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 12, 20, 24))
    variables = layer.init(jax.random.PRNGKey(1), x)
    out = layer.apply(variables, x)
    assert out.shape == (1, 12, 20, 32)
    assert bool(jnp.isfinite(out).all())


def test_head_isa_fusion():
    head = DAFormerHead(
        in_keys=("s0", "s3", "s4", "s5"), num_classes=7,
        channels=32, embed_dims=16, fusion="isa", isa_channels=16,
    )
    feats = _rand_feats()
    variables = head.init(jax.random.PRNGKey(0), feats)
    logits = head.apply(variables, feats)
    assert logits.shape == (1, 64, 64, 7)
    assert bool(jnp.isfinite(logits).all())


def test_head_conv_and_sep_conv_fusion():
    for fusion in ("conv", "sep_conv"):
        head = DAFormerHead(
            in_keys=("s0", "s3", "s4", "s5"), num_classes=7,
            channels=32, embed_dims=16, fusion=fusion,
        )
        feats = _rand_feats()
        variables = head.init(jax.random.PRNGKey(0), feats)
        logits = head.apply(variables, feats)
        assert logits.shape == (1, 64, 64, 7)


def test_head_final_fuse_vae_decoder_feat():
    """The head fuses at half the s0 resolution, then upsamples and concats
    the GN-bottleneck-projected raw s0 feature before conv_seg
    (daformer_head.py:73-88,688-698)."""
    head = DAFormerHead(
        in_keys=("s0", "s3", "s4", "s5"), num_classes=7,
        channels=32, embed_dims=16, final_fuse_vae_decoder_feat=True,
    )
    feats = _rand_feats()
    variables = head.init(jax.random.PRNGKey(0), feats)
    # the projection stage exists and conv_seg consumes channels + 64
    assert "vae_decoder_feat_proj" in variables["params"]
    assert variables["params"]["conv_seg"]["kernel"].shape[2] == 32 + 64
    logits = head.apply(variables, feats)
    assert logits.shape == (1, 64, 64, 7)  # full s0 resolution
    assert bool(jnp.isfinite(logits).all())


def test_head_concat_attention_to_conv_seg():
    head = DAFormerHead(
        in_keys=("s0", "s3", "s4", "s5"), num_classes=7,
        channels=32, embed_dims=16, concat_attention_to_conv_seg=True,
    )
    feats = _rand_feats()
    att = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 7))
    variables = head.init(jax.random.PRNGKey(0), feats, cross_attention_feat=att)
    assert variables["params"]["conv_seg"]["kernel"].shape[2] == 32 + 7
    logits = head.apply(variables, feats, cross_attention_feat=att)
    assert logits.shape == (1, 64, 64, 7)
