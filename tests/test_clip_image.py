"""CLIP vision tower: tiny-config parity vs transformers CLIPVisionModel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from madm_tpu.checkpoint.converter import convert_clip_vision_state  # noqa: E402
from madm_tpu.models.clip_image import CLIPVisionTransformer, ClipAdapter  # noqa: E402


def test_clip_vision_parity_tiny():
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    cfg = CLIPVisionConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=32,
        patch_size=8,
        projection_dim=48,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    tmodel = CLIPVisionModelWithProjection(cfg).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        ref = tmodel(x).image_embeds.numpy()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_clip_vision_state(sd)

    fmodel = CLIPVisionTransformer(
        image_size=32, patch_size=8, width=64, layers=2, heads=4,
        mlp_dim=128, out_dim=48,
    )
    out = jax.jit(lambda p, a: fmodel.apply({"params": p}, a))(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5)


def test_clip_adapter_preprocess_range():
    adapter = ClipAdapter()
    img = jnp.ones((1, 64, 64, 3)) * 0.5
    pre = adapter.preprocess(img)
    assert pre.shape == (1, 336, 336, 3)
    # 0.5 normalized by CLIP mean/std stays within a small range
    assert float(jnp.abs(pre).max()) < 1.0


def test_spatial_embeddings_shapes():
    fmodel = CLIPVisionTransformer(
        image_size=32, patch_size=8, width=64, layers=2, heads=4,
        mlp_dim=128, out_dim=48,
    )
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = fmodel.init(jax.random.PRNGKey(1), x)["params"]
    emb, enc = jax.jit(
        lambda p, a: fmodel.apply({"params": p}, a, return_spatial=True)
    )(params, x)
    assert emb.shape == (2, 48) and enc.shape == (2, 4, 4, 48)
    # the cls embedding equals the plain forward
    plain = fmodel.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(plain), atol=1e-5)


def test_maskclip_full_mask_equals_image_embed():
    """A fully-visible mask token reproduces the class-token embedding
    exactly: it is a copy of the cls token with the same key/value set
    (reference clip.py:263-341 semantics)."""
    from madm_tpu.models.clip_image import MaskCLIP

    mc = MaskCLIP()
    mc.vision = CLIPVisionTransformer(
        image_size=32, patch_size=8, width=64, layers=2, heads=4,
        mlp_dim=128, out_dim=48,
    )
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = mc.vision.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))["params"]
    masks = jnp.full((2, 3, 32, 32), 20.0)  # sigmoid ~ 1 everywhere
    mask_embed = jax.jit(mc.encode_image_with_mask)(params, x, masks)
    assert mask_embed.shape == (2, 3, 48)
    ref = mc.embed_image(params, x)
    for qi in range(3):
        np.testing.assert_allclose(
            np.asarray(mask_embed[:, qi]), np.asarray(ref), atol=2e-5
        )


def test_maskclip_pred_logits_and_ensemble():
    from madm_tpu.models.clip_image import MaskCLIP, ensemble_logits_with_labels

    logits = jnp.asarray([[[1.0, 3.0, 2.0, 5.0, 4.0]]])
    labels = [["a", "a2"], ["b"], ["c", "c2"]]
    out = ensemble_logits_with_labels(logits, labels)
    np.testing.assert_allclose(np.asarray(out), [[[3.0, 2.0, 5.0]]])
    out_mean = ensemble_logits_with_labels(logits, labels, method="mean")
    np.testing.assert_allclose(np.asarray(out_mean), [[[2.0, 2.0, 4.5]]])

    mc = MaskCLIP()
    me = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8))
    te = jax.random.normal(jax.random.PRNGKey(1), (3, 8))
    scored = mc.pred_logits(me, te, [["x"], ["y"], ["z"]])
    assert scored.shape == (1, 2, 3)
    assert np.abs(np.asarray(scored)).max() <= 100.0 + 1e-3
