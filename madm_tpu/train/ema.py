"""EMA teacher update as a pytree map (reference: ``cmdise.py:337-349``).

teacher <- alpha * teacher + (1 - alpha) * student,
alpha = min(1 - 1/(iter + 1), ema_alpha).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def ema_alpha(step: jax.Array, base_alpha: float = 0.999) -> jax.Array:
    return jnp.minimum(1.0 - 1.0 / (step + 1.0), base_alpha)


def update_ema(ema_tree: Any, student_tree: Any, alpha: jax.Array) -> Any:
    return jax.tree.map(
        lambda e, s: alpha * e + (1.0 - alpha) * s.astype(e.dtype),
        ema_tree,
        student_tree,
    )


def student_subtree(params: Dict[str, Any], same_cond_params: bool,
                    learnable_clip: bool = False,
                    ema_w_unet: bool = False) -> Dict[str, Any]:
    """The student subset matching the EMA tree layout
    (projections / head / clip_project_others, plus the CLIP tower when it
    trains and the UNet+LoRA under --ema_w_unet — ``cmdise.py:307-325``,
    ``ldm_base.py:846-848``)."""
    others_key = "clip_project_rgb" if same_cond_params else "clip_project_others"
    tree = {
        "projections": params["projections"],
        "head": params["head"],
        "clip_project_others": params["prompt"][others_key],
    }
    if learnable_clip and "clip_vision" in params:
        tree["clip_vision"] = params["clip_vision"]
    if ema_w_unet:
        tree["unet"] = params["unet"]
        tree["lora"] = params["lora"]
    return tree
