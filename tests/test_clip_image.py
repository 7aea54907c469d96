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
