"""Pallas flash-attention vs XLA reference parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madm_tpu.ops.attention import _xla_attention


def _run_pallas_interpret(q, k, v, scale):
    """Run the kernel in interpreter mode (no TPU on the test host)."""
    # note: madm_tpu.ops re-exports the function under the same name as the
    # submodule — import the function directly
    from madm_tpu.ops.flash_attention import flash_attention

    return flash_attention(q, k, v, scale=scale, interpret=True)


@pytest.mark.parametrize(
    "sq,sk,d",
    [
        (64, 64, 40),    # mid-block self-attention
        (256, 77, 80),   # cross-attention (padded kv)
        (128, 128, 160),
    ],
)
def test_flash_attention_matches_xla(sq, sk, d):
    rng = np.random.default_rng(0)
    b, h = 1, 2
    q = jnp.asarray(rng.normal(size=(b, sq, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, sk, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, sk, h, d)).astype(np.float32))
    scale = d**-0.5

    ref = _xla_attention(q, k, v, scale)
    out = _run_pallas_interpret(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_backward_kernel_matches_autodiff():
    """Pallas dq/dk/dv kernel vs jax.vjp of the XLA attention."""
    import numpy as np
    from madm_tpu.ops.attention import _xla_attention
    from madm_tpu.ops.flash_attention import _flash_attention_bwd_impl

    rng = np.random.default_rng(0)
    B, Sq, Sk, H, D = 1, 128, 77, 4, 40
    q = jnp.asarray(rng.normal(size=(B, Sq, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, Sk, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, Sk, H, D)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(B, Sq, H, D)).astype(np.float32))
    scale = D ** -0.5
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_attention(q_, k_, v_, scale), q, k, v)
    refs = vjp(g)
    outs = _flash_attention_bwd_impl(q, k, v, g, scale=scale, interpret=True)
    for a, r in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=2e-4)


def test_flash_attention_grad_through_public_api(monkeypatch):
    """jax.grad through flash_attention uses the pallas backward."""
    import numpy as np

    from madm_tpu.ops.flash_attention import flash_attention

    monkeypatch.setenv("MADM_FLASH_BWD", "pallas")
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 64, 2, 40)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 64, 2, 40)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 64, 2, 40)).astype(np.float32))

    def loss(q_, k_, v_):
        return flash_attention(q_, k_, v_, interpret=True).sum()

    from madm_tpu.ops.attention import _xla_attention
    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = jax.grad(
        lambda a, b, c: _xla_attention(a, b, c, 40 ** -0.5).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), atol=2e-4)


def test_packed_head_forward_matches_xla(monkeypatch):
    """MADM_FLASH_PACK=auto packs G=128//D heads per grid step via
    block-diagonal K'/V'; numerics must match the plain path."""
    from madm_tpu.ops.flash_attention import _flash_attention_fwd_impl, _pack_group

    monkeypatch.setenv("MADM_FLASH_PACK", "auto")
    assert _pack_group(4096, 4096, 40) == 3
    assert _pack_group(4096, 4096, 80) == 1   # 128//80 = 1
    assert _pack_group(4096, 77, 40) == 1     # cross-attention: no packing
    monkeypatch.setenv("MADM_FLASH_PACK", "0")
    assert _pack_group(4096, 4096, 40) == 1

    monkeypatch.setenv("MADM_FLASH_PACK", "auto")
    b, s, h, d = 2, 1024, 8, 40
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, s, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, s, h, d), jnp.float32)
    v = jax.random.normal(kv, (b, s, h, d), jnp.float32)
    got = _flash_attention_fwd_impl(q, k, v, scale=d ** -0.5, interpret=True)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * d ** -0.5
    ref = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(logits, axis=-1), v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_packed_head_backward_matches_xla(monkeypatch):
    """Packed backward: dq/dk/dv parity vs the einsum VJP (interpret mode)."""
    from madm_tpu.ops.flash_attention import _packed_bwd_impl

    b, s, h, d = 1, 1024, 8, 40
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    q, k, v, g = (jax.random.normal(kk, (b, s, h, d), jnp.float32) for kk in keys)
    scale = d ** -0.5

    def xla_attn(q, k, v):
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        p = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    _, vjp = jax.vjp(xla_attn, q, k, v)
    want_dq, want_dk, want_dv = vjp(g)
    got_dq, got_dk, got_dv = _packed_bwd_impl(q, k, v, g, scale, 3, interpret=True)
    np.testing.assert_allclose(np.asarray(got_dq), np.asarray(want_dq), atol=3e-5)
    np.testing.assert_allclose(np.asarray(got_dk), np.asarray(want_dk), atol=3e-5)
    np.testing.assert_allclose(np.asarray(got_dv), np.asarray(want_dv), atol=3e-5)
