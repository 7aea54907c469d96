"""Multi-head attention ops for the SD UNet (self + cross).

The reference runs diffusers' torch attention (CUDA matmul/softmax kernels;
its xformers flash path is present but commented out —
``modeling/meta_arch/ldm_diffusers.py:257``).  Here attention is a pure
function over ``[B, S, H, D]`` tensors with two interchangeable backends:

- ``xla``: einsum-based, letting XLA fuse scale+softmax onto the MXU output.
- ``pallas``: a flash-attention TPU kernel (``madm_tpu.ops.flash_attention``)
  that never materializes the ``S×S`` score matrix in HBM.

UNet sequence lengths are 64/256/1024/4096 (latent tokens) and 77 (text).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_DEFAULT_IMPL = None  # resolved lazily: pallas on TPU, xla elsewhere


def set_default_attention_impl(impl: str) -> None:
    global _DEFAULT_IMPL
    assert impl in {"xla", "pallas"}
    _DEFAULT_IMPL = impl


def get_default_attention_impl() -> str:
    global _DEFAULT_IMPL
    if _DEFAULT_IMPL is None:
        # measured on v5e: the flash kernel beats the einsum path ~7% on the
        # full model; CPU/interpret environments use XLA.  (The tunneled TPU
        # registers under platform 'axon', so check the device kind too.)
        d = jax.devices()[0]
        is_tpu = "tpu" in (d.platform + " " + getattr(d, "device_kind", "")).lower()
        _DEFAULT_IMPL = "pallas" if is_tpu else "xla"
    return _DEFAULT_IMPL


def dot_product_attention(
    q: jax.Array,  # [B, Sq, H, D]
    k: jax.Array,  # [B, Sk, H, D]
    v: jax.Array,  # [B, Sk, H, D]
    *,
    scale: float | None = None,
    impl: str | None = None,
) -> jax.Array:
    """Scaled dot-product attention, softmax in fp32.

    Returns [B, Sq, H, D] in q.dtype.
    """
    impl = impl or get_default_attention_impl()
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl == "pallas":
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    return _xla_attention(q, k, v, scale)


@functools.partial(jax.named_call, name="xla_attention")
def _xla_attention(q, k, v, scale):
    dtype = q.dtype
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    return out
