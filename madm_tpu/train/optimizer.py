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

        f = jnp.asarray(count, jnp.float32)
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


def linear_lr_schedule(
    base_lr: float,
    max_iter: int,
    warmup_length: float = 0.0375,
    warmup_factor: float = 1e-6,
) -> optax.Schedule:
    """The reference's ``--warmup_lr`` alternative schedule: WarmupParam-
    Scheduler over ``LinearParamScheduler(start=1/(1-0.0375), end=0)``
    (reference ``main.py:528-540``) — s(f) = (1-f)/(1-λ) hits exactly 1.0
    when the rescaled warmup ends at f=λ, then decays linearly to 0."""

    def schedule(count):
        import jax.numpy as jnp

        f = jnp.asarray(count, jnp.float32) / max_iter
        lin = jnp.maximum((1.0 - f) / (1.0 - warmup_length), 0.0)
        w0 = warmup_factor / (1.0 - warmup_length)  # warmup_factor * s(0)
        warm = w0 + (1.0 - w0) * (f / warmup_length)
        return base_lr * jnp.where(f < warmup_length, warm, lin)

    return schedule


def get_lr_schedule(base_lr: float, max_iter: int,
                    schedule: str = "multistep") -> optax.Schedule:
    if schedule == "linear":
        return linear_lr_schedule(base_lr, max_iter)
    assert schedule == "multistep", schedule
    return lr_schedule(base_lr, max_iter)


def make_optimizer(
    params: Dict[str, Any],
    base_lr: float = 5e-6,
    weight_decay: float = 0.05,
    max_iter: int = 10000,
    grad_clip: float = 0.01,
    unet_lr: Optional[float] = None,
    b1: Optional[float] = 0.9,  # None (adafactor only): momentumless
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype: Optional[str] = None,
    schedule: str = "multistep",
    name: str = "adamw",
) -> optax.GradientTransformation:
    """Optimizer over the *trainable* tree (vae excluded by the caller).

    ``name='adamw'`` (default) is the reference's optimizer
    (``config_files/common/optim.py``).  Single-chip 16GB v5e memory
    (measured r4, bs1 512^2 with remat + MADM_ASPP_SCAN=1): AdamW with
    ``mu_dtype='bfloat16'`` FITS (1252 ms/step); the opt-in reducers
    below widen the margin:

    - ``mu_dtype='bfloat16'`` halves the first-moment memory (-1.7GB on
      the flagship).
    - ``name='adafactor'`` replaces the per-param second moment with
      Adafactor's factored row/column statistics (-3.4GB) and keeps a
      momentum buffer at ``mu_dtype`` (bf16 by default here).  Same lr
      schedule, global-norm clip, weight-decay mask and unet_lr group;
      ``multiply_by_parameter_scale=False`` so the reference's absolute
      lr (5e-6) applies unchanged.  NOT the reference optimizer — a
      documented deviation for single-chip training.
    """
    if b1 is None and name != "adafactor":
        raise ValueError(
            "optimizer.no_momentum (b1=None) only applies to "
            "name='adafactor'; adamw requires a first-moment beta "
            f"(got name={name!r})"
        )
    sched = get_lr_schedule(base_lr, max_iter, schedule)
    if name == "adafactor":
        adamw = optax.adafactor(
            sched,
            decay_rate=0.8,
            multiply_by_parameter_scale=False,
            clipping_threshold=None,  # global-norm clip applied below
            # b1=None -> classic momentumless Adafactor (no first-moment
            # buffer at all: another -1.7GB on the flagship)
            momentum=b1,
            dtype_momentum=mu_dtype or "bfloat16",
            weight_decay_rate=weight_decay,
            weight_decay_mask=wd_mask,
            factored=True,
        )
    else:
        assert name == "adamw", name
        adamw = optax.adamw(
            sched, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay,
            mask=wd_mask, mu_dtype=mu_dtype,
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


def unet_trainable_mask(unet_params: Dict[str, Any], mode: str) -> Dict[str, Any]:
    """Bool pytree: which UNet params train under ``finetune_unet`` mode.

    Static equivalent of the reference's ``_freeze`` +
    ``exclude_unused_params`` probe backward (``ldm_diffusers.py:101-141``):

    - 'no':   whole UNet frozen
    - 'all':  everything except {conv_norm_out, conv_out} — the only params
      strictly downstream of the last tap (index 11 = after up_blocks_3's
      final resnet+attention), which the probe leaves with ``grad is None``
    - 'attention': only the Transformer2D subtrees (names containing
      'attentions'), minus the downstream set
    - 'without cross-attention': everything except cross-attention ('attn2')
      subtrees, minus the downstream set
    """
    if mode not in ("no", "all", "attention", "without cross-attention"):
        raise ValueError(f"finetune_unet mode {mode!r}")

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if mode == "no":
            return False
        if path[0] in ("conv_norm_out", "conv_out"):
            return False  # downstream of tap 11: probe-frozen
        in_attn = any("attentions" in p for p in path)
        if mode == "attention":
            return in_attn
        if mode == "without cross-attention":
            return not (in_attn and "attn2" in path)
        return True  # 'all'

    return walk(unet_params, ())


def _partition(tree, mask):
    """Split ``tree`` into (true_part, false_part) by a same-shape bool tree;
    empty dicts are pruned."""
    if isinstance(tree, dict):
        t_out, f_out = {}, {}
        for k, v in tree.items():
            t, f = _partition(v, mask[k])
            if t is not None:
                t_out[k] = t
            if f is not None:
                f_out[k] = f
        return (t_out or None), (f_out or None)
    return (tree, None) if mask else (None, tree)


def _deep_merge(a, b):
    if isinstance(a, dict) and isinstance(b, dict):
        out = dict(a)
        for k, v in b.items():
            out[k] = _deep_merge(a[k], v) if k in a else v
        return out
    return b


def split_trainable(variables: Dict[str, Any], finetune_unet: str = "all",
                    learnable_clip: bool = False):
    """(trainable, frozen) split of the params tree.

    Trainable = unet-per-``finetune_unet``-mask + lora + prompt + projections
    + head.  Frozen = VAE encoder/decoder + the masked-out UNet leaves.  The
    reference derives the same split with requires_grad flags + a probe
    backward (``ldm_diffusers.py:101-141``); here it is a static pytree
    partition so jit'd grads are simply never computed for frozen leaves."""
    p = variables["params"]
    frozen_keys = ["vae_encoder", "vae_decoder"]
    if "clip_vision" in p and not learnable_clip:
        # clip_state='no_learnable_clip': frozen CLIP tower (clip.py:96-106)
        frozen_keys.append("clip_vision")
    trainable = {k: v for k, v in p.items() if k not in frozen_keys}
    frozen = {k: p[k] for k in frozen_keys}
    if "unet" in trainable:
        mask = unet_trainable_mask(trainable["unet"], finetune_unet)
        t_unet, f_unet = _partition(trainable["unet"], mask)
        if t_unet is None:
            del trainable["unet"]
        else:
            trainable["unet"] = t_unet
        if f_unet is not None:
            frozen["unet"] = f_unet
    return trainable, frozen


def merge_trainable(trainable: Dict[str, Any], frozen: Dict[str, Any]) -> Dict[str, Any]:
    return _deep_merge(frozen, trainable)
