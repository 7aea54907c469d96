"""SD stack unit tests: scheduler math, UNet/VAE structure, LoRA algebra.

Full-size parameter counts are checked via ``jax.eval_shape`` (no 860M init on
the 1-core CPU test host); forward behavior runs on width-shrunk variants.
Weight-level parity against released SD checkpoints is exercised by the
converter tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madm_tpu.models.sd import (
    UNet2DCondition,
    VAEDecoder,
    VAEEncoder,
    add_noise,
    alphas_cumprod,
    init_lora,
    merge_lora,
    shared_noise,
)
from madm_tpu.models.sd.layers import timestep_embedding

TINY_UNET_CH = (32, 64, 128, 128)
TINY_VAE_CH = (32, 32, 64, 64)


def test_alphas_cumprod_matches_ddpm_scaled_linear():
    acp = alphas_cumprod()
    assert acp.shape == (1000,)
    np.testing.assert_allclose(acp[0], 1 - 0.00085, rtol=1e-6)
    assert 0.0 < acp[-1] < 0.01
    assert np.all(np.diff(acp) < 0)


def test_add_noise_t0_keeps_signal():
    lat = jnp.ones((2, 4, 4, 4))
    noise = jnp.full((2, 4, 4, 4), 2.0)
    t = jnp.zeros((2,), jnp.int32)
    out = add_noise(lat, noise, t)
    acp0 = float(alphas_cumprod()[0])
    expected = np.sqrt(acp0) * 1.0 + np.sqrt(1 - acp0) * 2.0
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_shared_noise_matches_torch_seed42():
    torch = pytest.importorskip("torch")
    n = shared_noise(64, 64)
    rng = torch.Generator().manual_seed(42)
    ref = torch.randn(1, 4, 64, 64, generator=rng).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(n, ref.astype(np.float32))


def test_upsample2d_dilated_equals_broadcast_path():
    """The input-dilated collapse (w3 (*) ones(2,2), lhs_dilation=2) must
    bit-follow conv3x3(nearest2x(x)) — same params, fp32."""
    import os

    from madm_tpu.models.sd.layers import Upsample2D

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 8, 8, 16)).astype(np.float32)
    )
    m = Upsample2D(24, dtype=jnp.float32)
    old = os.environ.get("MADM_UPSAMPLE")
    try:
        os.environ["MADM_UPSAMPLE"] = "dilated"
        v = m.init(jax.random.PRNGKey(0), x)
        ya = m.apply(v, x)
        os.environ["MADM_UPSAMPLE"] = "broadcast"
        yb = m.apply(v, x)
    finally:
        if old is None:
            os.environ.pop("MADM_UPSAMPLE", None)
        else:
            os.environ["MADM_UPSAMPLE"] = old
    assert ya.shape == (2, 16, 16, 24)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                               rtol=1e-5, atol=1e-5)
    # identical param tree to nn.Conv (checkpoint compatibility)
    assert set(v["params"]["conv"]) == {"kernel", "bias"}
    assert v["params"]["conv"]["kernel"].shape == (3, 3, 16, 24)


def test_timestep_embedding_flip_sin_to_cos():
    emb = timestep_embedding(jnp.array([0.0]), 320)
    np.testing.assert_allclose(np.asarray(emb[0, :160]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 160:]), 0.0, atol=1e-6)


def test_unet_param_count_matches_sd14():
    unet = UNet2DCondition()
    shapes = jax.eval_shape(
        unet.init,
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 4)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 768)),
    )["params"]
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes))
    assert n == 859_520_964  # SD-v1.4 UNet2DConditionModel


def test_vae_param_count_matches_sd14():
    enc = VAEEncoder()
    dec = VAEDecoder()
    e = jax.eval_shape(enc.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    d = jax.eval_shape(dec.init, jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)))["params"]
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(e)) + sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(d)
    )
    assert n == 83_653_863  # SD-v1.4 AutoencoderKL


@pytest.fixture(scope="module")
def tiny_unet():
    unet = UNet2DCondition(block_out_channels=TINY_UNET_CH)
    sample = jnp.zeros((1, 16, 16, 4))
    ts = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 77, 768))
    # always jit: op-by-op dispatch is ~20x slower on this host
    params = jax.jit(unet.init)(jax.random.PRNGKey(0), sample, ts, ctx)["params"]
    return unet, params


def _apply(unet, params, sample, ts, ctx, rte=None):
    fn = jax.jit(lambda p, s, t, c, r: unet.apply({"params": p}, s, t, c, r))
    return fn(params, sample, ts, ctx, rte)


def test_unet_tap_shapes(tiny_unet):
    unet, params = tiny_unet
    sample = jnp.zeros((2, 16, 16, 4))
    out, taps = _apply(unet, params, sample, jnp.zeros((2,), jnp.int32), jnp.zeros((2, 77, 768)))
    assert out.shape == (2, 16, 16, 4)
    # taps 5 (stride 4 of latent), 8 (stride 2), 11 (stride 1)
    assert [t.shape for t in taps] == [
        (2, 4, 4, TINY_UNET_CH[3]),
        (2, 8, 8, TINY_UNET_CH[1]),
        (2, 16, 16, TINY_UNET_CH[0]),
    ]


def test_unet_tap_type_in_vs_after(tiny_unet):
    unet, params = tiny_unet
    unet_in = UNet2DCondition(
        block_out_channels=TINY_UNET_CH, unet_block_indices_type="in"
    )
    sample = jnp.zeros((1, 16, 16, 4))
    _, taps = _apply(unet_in, params, sample, jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768)))
    # 'in' taps are pre-resnet concatenations: channels = hidden + skip
    assert taps[0].shape[-1] > TINY_UNET_CH[3]


def test_unet_res_time_embedding_changes_output(tiny_unet):
    unet, params = tiny_unet
    sample = jnp.ones((1, 16, 16, 4))
    ts = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 77, 768))
    out1, _ = _apply(unet, params, sample, ts, ctx)
    out2, _ = _apply(unet, params, sample, ts, ctx, jnp.ones((1, TINY_UNET_CH[0] * 4)))
    assert float(jnp.abs(out1 - out2).max()) > 0


def test_vae_roundtrip_shapes():
    enc = VAEEncoder(block_out_channels=TINY_VAE_CH)
    dec = VAEDecoder(block_out_channels=TINY_VAE_CH)
    img = jnp.zeros((1, 32, 32, 3))
    ep = jax.jit(enc.init)(jax.random.PRNGKey(0), img)["params"]
    lat, feats = jax.jit(lambda p, x: enc.apply({"params": p}, x))(ep, img)
    assert lat.shape == (1, 4, 4, 4) and feats == []
    dp = jax.jit(dec.init)(jax.random.PRNGKey(1), lat)["params"]
    rgb, _ = jax.jit(lambda p, x: dec.apply({"params": p}, x))(dp, lat)
    assert rgb.shape == (1, 32, 32, 3)
    none_rgb, feats = jax.jit(lambda p, x: dec.apply({"params": p}, x, output_final=False))(dp, lat)
    assert none_rgb is None


def test_vae_encoder_taps():
    enc = VAEEncoder(encoder_block_indices=(5,), block_out_channels=TINY_VAE_CH)
    img = jnp.zeros((1, 32, 32, 3))
    ep = jax.jit(enc.init)(jax.random.PRNGKey(0), img)["params"]
    lat, feats = jax.jit(lambda p, x: enc.apply({"params": p}, x))(ep, img)
    assert len(feats) == 1
    # 5th resnet: block index 2, after 2 downsamples -> 8x8
    assert feats[0].shape == (1, 8, 8, TINY_VAE_CH[2])


def test_lora_merge_zero_at_init_then_scaled(tiny_unet):
    _, params = tiny_unet
    lora = init_lora(params, rank=4)
    merged = merge_lora(params, lora, scale=2.0)
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), params, merged)
    assert max(jax.tree.leaves(diffs)) == 0.0

    lora2 = jax.tree.map(lambda x: jnp.ones_like(x) * 0.01, lora)
    merged2 = merge_lora(params, lora2, scale=2.0)
    diffs2 = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), params, merged2)
    assert max(jax.tree.leaves(diffs2)) > 0
    # non-attention leaves untouched
    assert merged2["conv_in"]["bias"] is params["conv_in"]["bias"]
    # delta = alpha/rank * A @ B: rank 4, all entries 0.01 -> delta = 2 * 4 * 1e-4
    q = params["mid_block"]["attentions_0"]["transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
    q2 = merged2["mid_block"]["attentions_0"]["transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
    np.testing.assert_allclose(np.asarray(q2 - q), 2 * 4 * 1e-4, rtol=1e-4)


def test_fused_qkv_matches_separate_dense(monkeypatch):
    """MADM_FUSED_QKV=1 computes self-attention q/k/v as one
    [C, 3*inner] matmul over kernels declared at the nn.Dense tree paths —
    same params, same init, identical output to the three-Dense path."""
    from madm_tpu.models.sd.layers import Attention

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 320))
    att = Attention(num_heads=8, head_dim=40)
    monkeypatch.setenv("MADM_FUSED_QKV", "1")
    p = att.init(jax.random.PRNGKey(0), x)
    assert set(p["params"]) == {"to_q", "to_k", "to_v", "to_out_0"}
    y_fused = att.apply(p, x)
    monkeypatch.setenv("MADM_FUSED_QKV", "0")
    p2 = att.init(jax.random.PRNGKey(0), x)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        p, p2,
    )
    y_ref = att.apply(p2, x)
    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_ref), atol=2e-5
    )
    # cross-attention is unaffected by the knob (k/v widths differ)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 768))
    monkeypatch.setenv("MADM_FUSED_QKV", "1")
    p3 = att.init(jax.random.PRNGKey(0), x, ctx)
    assert p3["params"]["to_k"]["kernel"].shape == (768, 320)
