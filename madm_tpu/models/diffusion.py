"""Gaussian diffusion math library (reference: ``modeling/diffusion/``).

jnp re-implementation of the OpenAI guided-diffusion toolbox the reference
carries for its legacy CompVis path (``gaussian_diffusion.py``,
``respace.py``, ``resample.py``, ``diffusion_builder.py``).  The active MADM
path only uses ``add_noise`` (see ``madm_tpu.models.sd.scheduler``), but the
full library is part of the framework surface:

- beta schedules: ``linear``, ``cosine``, ``ldm_linear`` (scaled-linear in
  sqrt space — ``gaussian_diffusion.py:88-121``),
- forward ``q_sample`` / posterior moments / eps<->x0 conversions,
- ancestral (DDPM) and DDIM sampling as ``lax.scan`` loops (TPU: one compiled
  program, no Python-loop dispatch),
- timestep respacing (``space_timesteps`` ddim/ldm_ddim striding,
  ``respace.py:7-70``) via gather tables instead of a wrapper class,
- Uniform / loss-second-moment importance samplers (``resample.py:60-149``)
  with the cross-rank loss sync expressed as a host-side update.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------- schedules
def get_named_beta_schedule(name: str, num_steps: int) -> np.ndarray:
    if name == "linear":
        scale = 1000 / num_steps
        return np.linspace(scale * 1e-4, scale * 2e-2, num_steps, dtype=np.float64)
    if name in ("ldm_linear", "scaled_linear"):
        return (
            np.linspace(0.00085**0.5, 0.012**0.5, num_steps, dtype=np.float64) ** 2
        )
    if name == "cosine":
        def acp(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        betas = [
            min(1 - acp((i + 1) / num_steps) / acp(i / num_steps), 0.999)
            for i in range(num_steps)
        ]
        return np.asarray(betas, np.float64)
    raise NotImplementedError(name)


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """Precomputed schedule tables; all methods are pure jnp functions.

    ``timestep_map`` implements respacing: model-facing timesteps index into
    the original schedule (replaces the reference's ``SpacedDiffusion``
    subclass/wrapped-model pattern — ``respace.py:73-134``)."""

    betas: np.ndarray
    timestep_map: Optional[np.ndarray] = None

    @classmethod
    def create(
        cls,
        steps: int = 1000,
        schedule: str = "ldm_linear",
        timestep_respacing: Optional[str] = None,
    ) -> "GaussianDiffusion":
        betas = get_named_beta_schedule(schedule, steps)
        if not timestep_respacing:
            return cls(betas=betas)
        use = sorted(space_timesteps(steps, timestep_respacing))
        # respaced betas: 1 - acp[t]/acp[prev]
        acp = np.cumprod(1 - betas)
        last = 1.0
        new_betas = []
        for t in use:
            new_betas.append(1 - acp[t] / last)
            last = acp[t]
        return cls(betas=np.asarray(new_betas), timestep_map=np.asarray(use))

    @property
    def num_timesteps(self) -> int:
        return len(self.betas)

    # -- tables (computed lazily as jnp constants inside traced fns) --------
    def _tables(self):
        betas = jnp.asarray(self.betas, jnp.float64).astype(jnp.float32)
        alphas = 1.0 - jnp.asarray(self.betas)
        acp = jnp.cumprod(alphas).astype(jnp.float32)
        acp_prev = jnp.concatenate([jnp.ones((1,)), acp[:-1]])
        return betas, acp, acp_prev

    @staticmethod
    def _extract(table, t, ndim):
        return table[t].reshape(t.shape + (1,) * (ndim - 1))

    # ------------------------------------------------------------ forward
    def q_sample(self, x0: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
        _, acp, _ = self._tables()
        return (
            self._extract(jnp.sqrt(acp), t, x0.ndim) * x0
            + self._extract(jnp.sqrt(1 - acp), t, x0.ndim) * noise
        )

    def q_posterior_mean_variance(self, x0, xt, t):
        betas, acp, acp_prev = self._tables()
        var = betas * (1 - acp_prev) / (1 - acp)
        coef1 = betas * jnp.sqrt(acp_prev) / (1 - acp)
        coef2 = (1 - acp_prev) * jnp.sqrt(1 - betas) / (1 - acp)
        mean = self._extract(coef1, t, x0.ndim) * x0 + self._extract(coef2, t, x0.ndim) * xt
        return mean, self._extract(var, t, x0.ndim)

    def predict_x0_from_eps(self, xt, t, eps):
        _, acp, _ = self._tables()
        return (
            self._extract(jnp.sqrt(1.0 / acp), t, xt.ndim) * xt
            - self._extract(jnp.sqrt(1.0 / acp - 1), t, xt.ndim) * eps
        )

    def _model_t(self, t):
        if self.timestep_map is None:
            return t
        return jnp.asarray(self.timestep_map)[t]

    # ----------------------------------------------------------- sampling
    def p_sample_loop(
        self,
        model_fn: Callable[[jax.Array, jax.Array], jax.Array],  # (x, t) -> eps
        shape: Tuple[int, ...],
        rng: jax.Array,
        clip_denoised: bool = True,
    ) -> jax.Array:
        """Ancestral DDPM sampling as one ``lax.scan``."""
        rng, k0 = jax.random.split(rng)
        x = jax.random.normal(k0, shape)

        def body(carry, t):
            x, rng = carry
            rng, k = jax.random.split(rng)
            tb = jnp.full((shape[0],), t, jnp.int32)
            eps = model_fn(x, self._model_t(tb))
            x0 = self.predict_x0_from_eps(x, tb, eps)
            if clip_denoised:
                x0 = jnp.clip(x0, -1.0, 1.0)
            mean, var = self.q_posterior_mean_variance(x0, x, tb)
            noise = jax.random.normal(k, shape)
            x = mean + jnp.where(t > 0, jnp.sqrt(var), 0.0) * noise
            return (x, rng), None

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        (x, _), _ = jax.lax.scan(body, (x, rng), ts)
        return x

    def ddim_sample_loop(
        self,
        model_fn: Callable[[jax.Array, jax.Array], jax.Array],
        shape: Tuple[int, ...],
        rng: jax.Array,
        eta: float = 0.0,
        clip_denoised: bool = True,
    ) -> jax.Array:
        """DDIM sampling (``gaussian_diffusion.py:673-841``) as a scan."""
        _, acp, acp_prev = self._tables()
        x = jax.random.normal(rng, shape)

        def body(carry, t):
            x, rng = carry
            rng, k = jax.random.split(rng)
            tb = jnp.full((shape[0],), t, jnp.int32)
            eps = model_fn(x, self._model_t(tb))
            x0 = self.predict_x0_from_eps(x, tb, eps)
            if clip_denoised:
                x0 = jnp.clip(x0, -1.0, 1.0)
            a_t = self._extract(acp, tb, x.ndim)
            a_prev = self._extract(acp_prev, tb, x.ndim)
            sigma = (
                eta
                * jnp.sqrt((1 - a_prev) / (1 - a_t))
                * jnp.sqrt(1 - a_t / a_prev)
            )
            eps_hat = (x - jnp.sqrt(a_t) * x0) / jnp.sqrt(1 - a_t)
            mean = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev - sigma**2) * eps_hat
            noise = jax.random.normal(k, shape)
            x = mean + jnp.where(t > 0, sigma, 0.0) * noise
            return (x, rng), None

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        (x, _), _ = jax.lax.scan(body, (x, rng), ts)
        return x


def space_timesteps(num_timesteps: int, section_counts) -> set:
    """Respacing spec -> set of original timesteps (``respace.py:7-70``).

    'ddimN': N steps with fixed stride landing on the DDIM grid;
    'ldm_ddimN': the LDM variant (stride offset +1); 'N' or [n1,n2,...]:
    per-section even striding."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ldm_ddim"):
            # LDM-style grid: offset +1 (respace.py:24-37)
            count = int(section_counts[len("ldm_ddim"):])
            stride = num_timesteps // count
            return set(np.arange(1, num_timesteps + 1, stride)[:count].tolist())
        if section_counts.startswith("ddim"):
            count = int(section_counts[len("ddim"):])
            for stride in range(1, num_timesteps):
                if len(range(0, num_timesteps, stride)) == count:
                    return set(range(0, num_timesteps, stride))
            raise ValueError(f"cannot create exactly {count} ddim steps")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start = 0
    out = set()
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if count > size:
            raise ValueError(f"cannot divide section of {size} steps into {count}")
        stride = 1 if count <= 1 else (size - 1) / (count - 1)
        cur = 0.0
        for _ in range(count):
            out.add(start + round(cur))
            cur += stride
        start += size
    return out


# ---------------------------------------------------------------- samplers
class UniformSampler:
    """Uniform timestep sampler (``resample.py:60-74``)."""

    def __init__(self, num_timesteps: int):
        self.num_timesteps = num_timesteps

    def sample(self, rng: jax.Array, batch: int):
        t = jax.random.randint(rng, (batch,), 0, self.num_timesteps)
        weights = jnp.ones((batch,))
        return t, weights


class LossSecondMomentResampler:
    """Importance-sample timesteps by per-t loss second moments
    (``resample.py:101-149``).  The reference syncs per-rank losses with
    ``dist.all_gather``; under GSPMD the train step computes global metrics
    already, so ``update_with_all_losses`` is a plain host-side update."""

    def __init__(self, num_timesteps: int, history_per_term: int = 10,
                 uniform_prob: float = 0.001):
        self.num_timesteps = num_timesteps
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob
        self._history = np.zeros((num_timesteps, history_per_term), np.float64)
        self._counts = np.zeros((num_timesteps,), np.int64)

    def _warmed_up(self) -> bool:
        return bool((self._counts == self.history_per_term).all())

    def weights(self) -> np.ndarray:
        if not self._warmed_up():
            return np.ones((self.num_timesteps,), np.float64)
        w = np.sqrt(np.mean(self._history**2, axis=-1))
        w = w / w.sum()
        w = w * (1 - self.uniform_prob) + self.uniform_prob / len(w)
        return w

    def sample(self, rng: jax.Array, batch: int):
        p = self.weights()
        p = p / p.sum()
        t = jax.random.choice(rng, self.num_timesteps, (batch,), p=jnp.asarray(p))
        weights = 1.0 / (self.num_timesteps * jnp.asarray(p)[t])
        return t, weights

    def update_with_all_losses(self, ts, losses) -> None:
        for t, loss in zip(np.asarray(ts), np.asarray(losses)):
            if self._counts[t] == self.history_per_term:
                self._history[t, :-1] = self._history[t, 1:]
                self._history[t, -1] = loss
            else:
                self._history[t, self._counts[t]] = loss
                self._counts[t] += 1
