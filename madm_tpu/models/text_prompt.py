"""Engineered-text-prompt conditioning (reference: ``ldm_text_prompt.py``).

The legacy alternative to the learnable prompt embeddings: per-domain
engineered prompts ("a photo of {classes}" style) are embedded once through
the CLIP text encoder, then refined by a tiny residual ``TextAdapter`` MLP
(reference ``ldm.py:762-782``: ``text + gamma * MLP(text)``, gamma init 1e-4)
with one adapter per domain.  Unused by shipped MADM configs but part of the
framework surface.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from .clip_text import CLIPTextTransformer, MAX_LEN, WIDTH

DEFAULT_SOURCE_TEXT = "a high-resolution photo of {}"
DEFAULT_TARGET_TEXT = "a depth map of {}"
DEFAULT_MIXUP_TEXT = "a mixed photo and depth map of {}"


def format_prompt(template: str, class_names: Sequence[str]) -> str:
    """',' joined class list with a trailing 'and' (``ldm_text_prompt.py:31-40``)."""
    if not class_names:
        return template.format("")
    parts = list(class_names)
    joined = ", ".join(parts[:-1])
    joined = f"{joined}, and {parts[-1]}" if len(parts) > 1 else parts[-1]
    return template.format(joined.lower())


def init_text_adapter(rng: jax.Array, text_dim: int = WIDTH,
                      hidden_dim: Optional[int] = None,
                      gamma_init_value: float = 1e-4) -> Dict[str, Any]:
    hidden = hidden_dim or text_dim
    k1, k2 = jax.random.split(rng)
    s1 = (1.0 / text_dim) ** 0.5
    s2 = (1.0 / hidden) ** 0.5
    return {
        "fc1": {"kernel": jax.random.uniform(k1, (text_dim, hidden), minval=-s1, maxval=s1),
                "bias": jnp.zeros((hidden,))},
        "fc2": {"kernel": jax.random.uniform(k2, (hidden, text_dim), minval=-s2, maxval=s2),
                "bias": jnp.zeros((text_dim,))},
        "gamma": jnp.full((text_dim,), gamma_init_value),
    }


def text_adapter(params: Dict[str, Any], texts: jax.Array) -> jax.Array:
    """texts [B, 77, 768] -> refined prompts (residual, gamma-scaled)."""
    h = texts @ params["fc1"]["kernel"] + params["fc1"]["bias"]
    h = jax.nn.gelu(h, approximate=False)
    h = h @ params["fc2"]["kernel"] + params["fc2"]["bias"]
    return texts + params["gamma"] * h


def embed_prompts(
    clip_text_params: Dict[str, Any],
    token_ids: jax.Array,  # [N, 77] int32 (tokenized prompts)
    dtype=jnp.float32,
) -> jax.Array:
    """Embed tokenized engineered prompts through the CLIP text encoder."""
    model = CLIPTextTransformer(dtype=dtype)
    return jax.jit(lambda p, ids: model.apply({"params": p}, ids))(
        clip_text_params, token_ids
    )
