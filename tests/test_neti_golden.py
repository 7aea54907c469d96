"""NeTI mapper + bypass parity vs a hand-built torch reference.

The reference's NeTI machinery (``modeling/neti/``) can't be imported here
(its modules call ``.cuda()`` at construction), so this test hand-builds
torch modules with the exact reference semantics — sin/cos unit-normalized
Fourier encoding of (t, layer) (``positional_encoding.py:20-33``),
anchor-initialized input layer (``:35-42``, ``neti_mapper.py:61-67``),
dual-output mapper (``neti_mapper.py:38-40``), placeholder-token overwrite
(``net_clip_text_embedding.py:58-70``) and the normalized 0.2-scaled bypass
added before the final LayerNorm (``neti_clip_text_encoder.py:133-148``) —
and checks the flax implementation bit-follows them through the converter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from madm_tpu.checkpoint.converter import convert_clip_text_state  # noqa: E402
from madm_tpu.models.clip_text import CLIPTextTransformer  # noqa: E402
from madm_tpu.models.neti import (  # noqa: E402
    NeTICLIPText,
    NeTIMapper,
    convert_neti_mapper_state,
)


class TorchNeTIMapper(torch.nn.Module):
    """Reference-semantics NeTI mapper (``neti_mapper.py:22-99``)."""

    def __init__(
        self,
        output_dim: int = 768,
        num_w: int = 1024,
        sigma_t: float = 0.03,
        sigma_l: float = 2.0,
        num_time_anchors: int = 10,
        num_layers: int = 16,
        output_bypass: bool = True,
    ):
        super().__init__()
        w = torch.randn(num_w, 2)
        w[:, 0] *= sigma_t
        w[:, 1] *= sigma_l
        self.w = torch.nn.Parameter(w)
        input_dim = num_time_anchors * num_layers
        self.input_layer = torch.nn.Linear(num_w * 2, input_dim)
        with torch.no_grad():
            self.input_layer.weight.data = self._init_layer(
                num_time_anchors, num_layers
            )
        self.net = torch.nn.Sequential(
            self.input_layer,
            torch.nn.Linear(input_dim, 128),
            torch.nn.LayerNorm(128),
            torch.nn.LeakyReLU(),
            torch.nn.Linear(128, 128),
            torch.nn.LayerNorm(128),
            torch.nn.LeakyReLU(),
        )
        out_dim = output_dim * 2 if output_bypass else output_dim
        self.output_layer = torch.nn.Sequential(torch.nn.Linear(128, out_dim))

    def _encode_scalar(self, t: int, l: int) -> torch.Tensor:
        x = torch.tensor([t, l]).float()
        v = torch.cat(
            [torch.sin(self.w.detach() @ x), torch.cos(self.w.detach() @ x)]
        )
        return v / v.norm()

    def _init_layer(self, num_time_anchors: int, num_layers: int) -> torch.Tensor:
        return torch.stack(
            [
                self._encode_scalar(t, l)
                for t in range(0, 1000, 1000 // num_time_anchors)
                for l in range(num_layers)
            ]
        )

    def encode(self, t: torch.Tensor, l: torch.Tensor) -> torch.Tensor:
        x = torch.stack([t, l], dim=1).T.float()
        v = torch.cat(
            [torch.sin(self.w.detach() @ x), torch.cos(self.w.detach() @ x)]
        )
        return (v / v.norm(dim=0)).T

    def forward(self, t: torch.Tensor, l: torch.Tensor) -> torch.Tensor:
        return self.output_layer(self.net(self.encode(t, l)))


def _mapper_params(tmapper: TorchNeTIMapper):
    sd = {}
    for k, v in tmapper.state_dict().items():
        sd["encoder.w" if k == "w" else k] = v.numpy()
    return convert_neti_mapper_state(sd)


def test_neti_mapper_golden():
    torch.manual_seed(0)
    tmapper = TorchNeTIMapper(output_dim=768).eval()
    t = torch.tensor([10.0, 500.0, 999.0])
    l = torch.tensor([0.0, 7.0, 15.0])
    with torch.no_grad():
        ref = tmapper(t, l).numpy()
    assert ref.shape == (3, 1536)

    fmapper = NeTIMapper(output_dim=768)
    params = _mapper_params(tmapper)
    out = jax.jit(lambda p, t, l: fmapper.apply({"params": p}, t, l))(
        params, jnp.asarray(t.numpy()), jnp.asarray(l.numpy())
    )
    # fp32 accumulation-order noise through the 2048-wide encoding matmul
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4)


def test_neti_mapper_anchor_init_matches_torch():
    """flax init's anchor-derived input_layer kernel == the torch one when the
    random projection w agrees."""
    torch.manual_seed(1)
    tmapper = TorchNeTIMapper(output_dim=32, num_w=64, num_time_anchors=5,
                              num_layers=4)
    fmapper = NeTIMapper(output_dim=32, num_w=64, num_pe_time_anchors=5,
                         num_unet_layers=4)
    params = jax.jit(fmapper.init)(
        jax.random.PRNGKey(0), jnp.zeros((2,)), jnp.zeros((2,))
    )["params"]
    # graft torch's w into the flax tree and re-derive the anchor kernel
    from madm_tpu.models.neti import anchor_init_matrix

    w = jnp.asarray(tmapper.w.detach().numpy())
    kernel = anchor_init_matrix(w, 5, 4).T
    np.testing.assert_allclose(
        np.asarray(kernel.T),
        tmapper.input_layer.weight.detach().numpy(),
        atol=1e-6,
    )
    # and shapes line up with what init produced
    assert params["input_layer"]["kernel"].shape == kernel.shape


def test_neti_bypass_golden():
    """Full encode_with_neti vs a manual torch drive of the tiny CLIP text
    model with placeholder overwrite + scaled bypass."""
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
    torch.manual_seed(2)
    tmodel = CLIPTextModel(cfg).eval()
    tmapper = TorchNeTIMapper(output_dim=64, num_w=64).eval()

    ph = 50
    b, s = 2, 16
    ids = torch.randint(0, 49, (b, s))
    ids[0, 3] = ph
    ids[1, 7] = ph
    t = torch.tensor([120.0, 640.0])
    layer = torch.tensor([2.0, 11.0])

    tm = tmodel.text_model
    with torch.no_grad():
        mapped = tmapper(t, layer)
        word, byp = mapped[:, :64], mapped[:, 64:]
        idx = (ids == ph).nonzero(as_tuple=True)[1]
        ar = torch.arange(b)
        embeds = tm.embeddings.token_embedding(ids).clone()
        embeds[ar, idx] = word
        hidden = embeds + tm.embeddings.position_embedding(
            torch.arange(s)[None]
        )
        causal = (
            torch.full((s, s), float("-inf")).triu(1).expand(b, 1, s, s)
        )
        h = hidden
        for lyr in tm.encoder.layers:
            h = lyr(h, None, causal)[0]
        ref_plain = tm.final_layer_norm(h).numpy()
        existing = h[ar, idx]
        byp = byp / byp.norm(dim=1, keepdim=True) * existing.norm(
            dim=1, keepdim=True
        )
        h2 = h.clone()
        h2[ar, idx] = existing + 0.2 * byp
        ref_bypass = tm.final_layer_norm(h2).numpy()

    # sanity: torch full forward on the same ids equals the manual drive
    # without the overwrite/bypass (keeps the manual path honest)
    with torch.no_grad():
        full = tmodel(ids).last_hidden_state.numpy()
    assert not np.allclose(full, ref_plain, atol=1e-4)  # overwrite changed it

    ftrans = CLIPTextTransformer(
        vocab_size=100, width=64, layers=2, heads=4, mlp_dim=128, max_len=16
    )
    fmapper = NeTIMapper(output_dim=64, num_w=64)
    neti = NeTICLIPText(transformer=ftrans, mapper=fmapper)
    tparams = convert_clip_text_state(
        {k: v.numpy() for k, v in tmodel.state_dict().items()}
    )
    mparams = _mapper_params(tmapper)

    plain, with_bypass = jax.jit(
        lambda tp, mp, ids, t, l: neti.encode_with_neti(
            tp, mp, ids, t, l, placeholder_id=ph
        )
    )(
        tparams,
        mparams,
        jnp.asarray(ids.numpy()),
        jnp.asarray(t.numpy()),
        jnp.asarray(layer.numpy()),
    )
    # mapper fp32 noise (2048-wide matmul) propagates through the 2 layers
    np.testing.assert_allclose(np.asarray(plain), ref_plain, atol=5e-4)
    np.testing.assert_allclose(np.asarray(with_bypass), ref_bypass, atol=5e-4)
    # the bypass actually did something at the placeholder rows
    assert (
        np.abs(np.asarray(with_bypass) - np.asarray(plain)).max() > 1e-3
    )


def test_neti_nested_dropout_zeroes_suffix():
    fmapper = NeTIMapper(output_dim=8, num_w=16, num_pe_time_anchors=5,
                         num_unet_layers=4, nested_dropout_prob=1.0)
    params = jax.jit(fmapper.init)(
        jax.random.PRNGKey(0), jnp.zeros((2,)), jnp.zeros((2,))
    )["params"]
    t = jnp.array([10.0, 900.0])
    l = jnp.array([1.0, 3.0])
    out_eval = fmapper.apply({"params": params}, t, l)
    out_trunc0 = fmapper.apply({"params": params}, t, l, truncation_idx=0)
    # truncation at 0 zeroes the whole representation -> output is the
    # output_layer bias alone, identical across samples
    np.testing.assert_allclose(
        np.asarray(out_trunc0[0]), np.asarray(out_trunc0[1]), atol=1e-6
    )
    assert not np.allclose(np.asarray(out_eval), np.asarray(out_trunc0))
    # train-time nested dropout with prob 1 differs from eval
    out_train = fmapper.apply(
        {"params": params}, t, l, train=True, dropout_rng=jax.random.PRNGKey(3)
    )
    assert not np.allclose(np.asarray(out_train), np.asarray(out_eval))
