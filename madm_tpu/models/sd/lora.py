"""LoRA adapters as pytrees, merged functionally (no module mutation).

The reference injects peft LoRA adapters into the UNet's attention projections
(``to_q/to_k/to_v/to_out.0``) and switches the active adapter by mutating
module state per forward pass (``modeling/meta_arch/mtmadise.py:115-147``).
That pattern is hostile to XLA: here each adapter is an independent parameter
pytree shaped like the attention-kernel subset of the UNet params, and
"activating" an adapter means merging ``W + (alpha/r) * A @ B`` into the
kernels before the jitted forward — a few tiny matmuls, negligible next to
UNet FLOPs, fully differentiable through both base and LoRA weights.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

LORA_TARGETS = ("to_q", "to_k", "to_v", "to_out_0")


def _walk_attention_kernels(params: Dict[str, Any], path=()):
    """Yield (path, kernel) for every attention projection Dense in params."""
    for k, v in params.items():
        if k in LORA_TARGETS and isinstance(v, dict) and "kernel" in v:
            yield path + (k,), v["kernel"]
        elif isinstance(v, dict):
            yield from _walk_attention_kernels(v, path + (k,))


def init_lora(
    unet_params: Dict[str, Any],
    rank: int,
    alpha: int = 0,
    rng: jax.Array | int = 0,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    """Create a zero-effect LoRA pytree for every attention projection.

    peft ``init_lora_weights='gaussian'`` semantics: A ~ N(0, 1/r), B = 0, so
    the initial delta is exactly zero (``mtmadise.py:118-124``).  The
    alpha/rank scale is *static config* (``parse_lora_configs``), kept out of
    the pytree so the whole tree is differentiable.
    """
    if isinstance(rng, int):
        rng = jax.random.PRNGKey(rng)
    tree: Dict[str, Any] = {}
    for path, kernel in _walk_attention_kernels(unet_params):
        d_in, d_out = kernel.shape
        rng, sub = jax.random.split(rng)
        a = (jax.random.normal(sub, (d_in, rank), dtype=jnp.float32) / rank).astype(dtype)
        b = jnp.zeros((rank, d_out), dtype=dtype)
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = {"lora_a": a, "lora_b": b}
    return tree


def merge_lora(
    unet_params: Dict[str, Any],
    lora: Optional[Dict[str, Any]],
    scale: float = 1.0,
) -> Dict[str, Any]:
    """Return params with ``kernel += scale * (A @ B)`` at every adapted site.

    ``scale`` is peft's ``alpha / rank`` (static, from ``parse_lora_configs``).
    ``lora=None`` is identity (adapter disabled)."""
    if lora is None:
        return unet_params

    def _merge(p_node, l_node):
        out = {}
        for k, v in p_node.items():
            lv = l_node.get(k) if isinstance(l_node, dict) else None
            if (
                k in LORA_TARGETS
                and isinstance(v, dict)
                and "kernel" in v
                and isinstance(lv, dict)
                and "lora_a" in lv
            ):
                delta = (lv["lora_a"] @ lv["lora_b"]) * scale
                out[k] = {**v, "kernel": v["kernel"] + delta.astype(v["kernel"].dtype)}
            elif isinstance(v, dict):
                out[k] = _merge(v, lv if isinstance(lv, dict) else {})
            else:
                out[k] = v
        return out

    return _merge(unet_params, lora)


def parse_lora_configs(lora_configs) -> Dict[str, Dict[str, int]]:
    """Parse reference-style ``['Infrared_r16_a16', ...]`` strings.

    (reference: ``mtmadise.py:48-54``)."""
    out = {}
    for s in lora_configs or []:
        name, rank, alpha = s.split("_")
        assert name in {"default", "Infrared", "Depth", "Event"}
        out[name] = {"rank": int(rank[1:]), "alpha": int(alpha[1:])}
    return out
