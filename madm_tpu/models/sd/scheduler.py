"""DDPM noise schedule + ``add_noise`` (reference: diffusers DDPMScheduler).

The reference only uses the scheduler's forward-noising operator
``add_noise(latents, noise, t)`` with SD-v1.4's scaled-linear betas
(``modeling/meta_arch/ldm_diffusers.py:262-266,349-360``), plus a *fixed*
shared noise tensor generated once with torch seed 42
(``ldm_diffusers.py:73-75``).  Here the schedule is a precomputed constant
table and ``add_noise`` a pure jnp function; the shared-noise buffer is
reproduced bit-for-torch via ``torch.Generator`` on host at startup.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NUM_TRAIN_TIMESTEPS = 1000
BETA_START = 0.00085
BETA_END = 0.012


@functools.lru_cache(maxsize=None)
def alphas_cumprod(num_timesteps: int = NUM_TRAIN_TIMESTEPS) -> np.ndarray:
    """scaled_linear schedule: betas linear in sqrt space (fp32 table)."""
    betas = (
        np.linspace(BETA_START ** 0.5, BETA_END ** 0.5, num_timesteps, dtype=np.float64) ** 2
    )
    return np.cumprod(1.0 - betas).astype(np.float32)


def add_noise(latents: jax.Array, noise: jax.Array, timesteps: jax.Array) -> jax.Array:
    """noisy = sqrt(acp[t]) * latents + sqrt(1 - acp[t]) * noise.

    ``timesteps``: [B] int32.  Broadcast over NHWC latents.
    """
    acp = jnp.asarray(alphas_cumprod())[timesteps]
    sqrt_acp = jnp.sqrt(acp).astype(latents.dtype)[:, None, None, None]
    sqrt_one_minus = jnp.sqrt(1.0 - acp).astype(latents.dtype)[:, None, None, None]
    return sqrt_acp * latents + sqrt_one_minus * noise


@functools.lru_cache(maxsize=None)
def shared_noise(height: int = 64, width: int = 64, channels: int = 4) -> np.ndarray:
    """The fixed seed-42 shared noise buffer, identical to the reference's.

    Reference registers ``torch.randn(1, 4, 64, 64, generator=manual_seed(42))``
    (``ldm_diffusers.py:73-75``).  We reproduce the exact values through torch
    CPU RNG (bitwise-identical normal stream) and return NHWC.
    """
    try:
        import torch

        rng = torch.Generator().manual_seed(42)
        n = torch.randn(1, channels, height, width, generator=rng).numpy()
    except ImportError:  # torch unavailable: any fixed noise works functionally
        n = np.random.default_rng(42).standard_normal((1, channels, height, width))
    return np.ascontiguousarray(np.transpose(n, (0, 2, 3, 1))).astype(np.float32)
