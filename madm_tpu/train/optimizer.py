"""Optimizer: AdamW with MADM's param-group rules as optax masks.

Reference (``utils/parameter_count.py:129-219`` +
``config_files/common/optim.py``): AdamW, weight_decay 0.05 but 0 for
normalization params and biases, optional separate lr for UNet modules
(``unet_lr``), global grad-norm clip 0.01
(``…depth_11.py:18`` / ``engine/train_loop.py:288-302``), and the
warmup + multi-step lr schedule of ``…depth_11.py:22-34``.

The torch version builds per-parameter groups by module-walking; here the same
policy is two pytree masks (no-WD mask by leaf name, unet-lr mask by subtree).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import optax


def wd_mask(params: Dict[str, Any]) -> Dict[str, Any]:
    """True where weight decay applies: everything except biases and norm
    scales (Dense/Conv kernels are named 'kernel', so leaf name in
    {'bias', 'scale'} identifies exactly the torch norm/bias set)."""

    def walk(node, name=""):
        if isinstance(node, dict):
            return {k: walk(v, k) for k, v in node.items()}
        return name not in ("bias", "scale")

    return walk(params)


def lr_schedule(
    base_lr: float,
    max_iter: int,
    milestones=(0.88888, 0.96296),
    values=(1.0, 0.1, 0.01),
    warmup_factor: float = 0.067,
    warmup_length: float = 500 / 184375,
) -> optax.Schedule:
    """WarmupParamScheduler(MultiStepParamScheduler) as an optax schedule.

    The reference evaluates the multiplier at f = iter / max_iter with
    num_updates = 2 * max_iter - 1 and milestones int(m * num_updates)
    (``…depth_11.py:22-34``): steps land at ~0.889 and ~0.963 of training;
    linear warmup from ``warmup_factor`` over ``warmup_length`` of training.
    """
    num_updates = 2 * max_iter - 1
    step_iters = [int(m * num_updates) / num_updates * max_iter for m in milestones]
    warmup_iters = warmup_length * max_iter

    def schedule(count):
        import jax.numpy as jnp

        f = count.astype(jnp.float32)
        mult = jnp.full_like(f, values[0], dtype=jnp.float32)
        for it, v in zip(step_iters, values[1:]):
            mult = jnp.where(f >= it, v, mult)
        w = jnp.where(
            f < warmup_iters,
            warmup_factor + (1 - warmup_factor) * (f / jnp.maximum(warmup_iters, 1e-8)),
            1.0,
        )
        return base_lr * mult * w

    return schedule


def make_optimizer(
    params: Dict[str, Any],
    base_lr: float = 5e-6,
    weight_decay: float = 0.05,
    max_iter: int = 10000,
    grad_clip: float = 0.01,
    unet_lr: Optional[float] = None,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype: Optional[str] = None,
) -> optax.GradientTransformation:
    """AdamW over the *trainable* tree (vae excluded by the caller).

    ``mu_dtype='bfloat16'`` halves the first-moment memory — useful on 16GB
    v5e where fp32 params + Adam states + grads leave little headroom."""
    sched = lr_schedule(base_lr, max_iter)
    adamw = optax.adamw(
        sched, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay, mask=wd_mask,
        mu_dtype=mu_dtype,
    )
    if unet_lr is not None:
        ratio = unet_lr / base_lr

        def unet_mask(p):
            return {k: jax.tree.map(lambda _: k in ("unet", "lora"), v)
                    for k, v in p.items()}

        adamw = optax.chain(
            adamw,
            optax.masked(optax.scale(ratio), unet_mask),
        )
    return optax.chain(optax.clip_by_global_norm(grad_clip), adamw)


def split_trainable(variables: Dict[str, Any]):
    """(trainable, frozen) split of the params tree.

    Trainable = unet + lora + prompt + projections + head (finetune_unet='all'
    with taps at {5,8,11} + decoder output leaves the whole UNet reachable —
    the static equivalent of the reference's ``exclude_unused_params`` probe,
    ``ldm_diffusers.py:123-141``).  Frozen = VAE encoder/decoder."""
    p = variables["params"]
    frozen_keys = ("vae_encoder", "vae_decoder")
    trainable = {k: v for k, v in p.items() if k not in frozen_keys}
    frozen = {k: p[k] for k in frozen_keys}
    return trainable, frozen


def merge_trainable(trainable: Dict[str, Any], frozen: Dict[str, Any]) -> Dict[str, Any]:
    return {**frozen, **trainable}
