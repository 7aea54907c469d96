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
