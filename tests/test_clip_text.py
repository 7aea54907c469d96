"""CLIP text encoder parity vs transformers' torch CLIPTextModel.

A tiny-config torch CLIPTextModel is the gold reference: its empty-prompt
last_hidden_state (the only thing MADM consumes — ``ldm_diffusers.py:219-243``)
must match our flax transformer after weight conversion.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from madm_tpu.checkpoint.converter import convert_clip_text_state  # noqa: E402
from madm_tpu.models.clip_text import CLIPTextTransformer, empty_prompt_ids  # noqa: E402
from madm_tpu.models.neti import NeTIMapper  # noqa: E402


def test_empty_prompt_ids_match_clip_tokenizer_convention():
    ids = empty_prompt_ids()
    assert ids.shape == (1, 77)
    assert ids[0, 0] == 49406 and ids[0, 1] == 49407 and ids[0, -1] == 49407


def test_clip_text_parity_tiny():
    from transformers import CLIPTextConfig, CLIPTextModel

    cfg = CLIPTextConfig(
        vocab_size=100,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=16,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    tmodel = CLIPTextModel(cfg).eval()
    ids = torch.randint(0, 100, (2, 16))
    with torch.no_grad():
        ref = tmodel(ids).last_hidden_state.numpy()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_clip_text_state(sd)

    fmodel = CLIPTextTransformer(
        vocab_size=100, width=64, layers=2, heads=4, mlp_dim=128, max_len=16
    )
    out = jax.jit(lambda p, i: fmodel.apply({"params": p}, i))(
        params, jnp.asarray(ids.numpy())
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5)


def test_neti_mapper_shapes():
    mapper = NeTIMapper(output_dim=32, num_w=64)
    params = jax.jit(mapper.init)(
        jax.random.PRNGKey(0), jnp.zeros((2,)), jnp.zeros((2,))
    )["params"]
    out = jax.jit(lambda p, t, l: mapper.apply({"params": p}, t, l))(
        params, jnp.array([10.0, 500.0]), jnp.array([0.0, 15.0])
    )
    # dual output: word half + bypass half (neti_mapper.py:38-40)
    assert out.shape == (2, 64)
    assert bool(jnp.isfinite(out).all())
    no_bypass = NeTIMapper(output_dim=32, num_w=64, output_bypass=False)
    params2 = jax.jit(no_bypass.init)(
        jax.random.PRNGKey(0), jnp.zeros((2,)), jnp.zeros((2,))
    )["params"]
    out2 = no_bypass.apply(
        {"params": params2}, jnp.array([10.0]), jnp.array([0.0])
    )
    assert out2.shape == (1, 32)
