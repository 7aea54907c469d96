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

    # ------------------------------------------ variational-bound losses
    # (reference ``gaussian_diffusion.py:842-1021`` + guided-diffusion
    # ``losses.py`` helpers; units are bits like the original)
    def q_mean_variance(self, x0, t):
        _, acp, _ = self._tables()
        mean = self._extract(jnp.sqrt(acp), t, x0.ndim) * x0
        var = self._extract(1.0 - acp, t, x0.ndim)
        return mean, var, jnp.log(var)

    def _posterior_log_variance_clipped(self, t, ndim):
        betas, acp, acp_prev = self._tables()
        var = betas * (1 - acp_prev) / (1 - acp)
        # log-var clipped at t=0 (var[0] == 0)
        logv = jnp.log(jnp.concatenate([var[1:2], var[1:]]))
        return self._extract(logv, t, ndim)

    def p_mean_variance(
        self,
        model_fn: Callable,  # (x, t) -> eps  (or [eps, var_values] if learned)
        x: jax.Array,
        t: jax.Array,
        clip_denoised: bool = True,
        model_var_type: str = "fixed_small",
    ):
        """Model posterior p(x_{t-1} | x_t) moments for an eps-predicting
        model (``gaussian_diffusion.py:450-560``).  Returns dict with
        mean/variance/log_variance/pred_xstart."""
        betas, acp, acp_prev = self._tables()
        out = model_fn(x, self._model_t(t))
        if model_var_type == "learned_range":
            eps, v = jnp.split(out, 2, axis=-1)
            min_log = self._posterior_log_variance_clipped(t, x.ndim)
            max_log = self._extract(jnp.log(betas), t, x.ndim)
            frac = (v + 1) / 2
            log_variance = frac * max_log + (1 - frac) * min_log
            variance = jnp.exp(log_variance)
        else:
            eps = out
            if model_var_type == "fixed_large":
                var_l = jnp.concatenate([betas[1:2] * (1 - acp_prev[1:2]) / (1 - acp[1:2]), betas[1:]])
                variance = self._extract(var_l, t, x.ndim)
                log_variance = jnp.log(variance)
            else:  # fixed_small: the true posterior variance
                assert model_var_type == "fixed_small", model_var_type
                var = betas * (1 - acp_prev) / (1 - acp)
                variance = self._extract(var, t, x.ndim)
                log_variance = self._posterior_log_variance_clipped(t, x.ndim)
        x0 = self.predict_x0_from_eps(x, t, eps)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        mean, _ = self.q_posterior_mean_variance(x0, x, t)
        return {
            "mean": mean, "variance": variance,
            "log_variance": log_variance, "pred_xstart": x0,
        }

    def _vb_terms_bpd(self, model_fn, x0, xt, t, clip_denoised=True,
                      model_var_type: str = "fixed_small"):
        """KL(q(x_{t-1}|x_t,x_0) || p(x_{t-1}|x_t)) per batch element in
        bits, decoder NLL at t=0 (``gaussian_diffusion.py:842-872``)."""
        true_mean, _ = self.q_posterior_mean_variance(x0, xt, t)
        true_logv = self._posterior_log_variance_clipped(t, x0.ndim)
        out = self.p_mean_variance(model_fn, xt, t, clip_denoised, model_var_type)
        kl = normal_kl(true_mean, true_logv, out["mean"], out["log_variance"])
        kl = _mean_flat(kl) / math.log(2.0)
        nll = -discretized_gaussian_log_likelihood(
            x0, means=out["mean"], log_scales=0.5 * out["log_variance"]
        )
        nll = _mean_flat(nll) / math.log(2.0)
        output = jnp.where(t == 0, nll, kl)
        return {"output": output, "pred_xstart": out["pred_xstart"]}

    def training_losses(
        self,
        model_fn,
        x0: jax.Array,
        t: jax.Array,
        noise: Optional[jax.Array] = None,
        rng: Optional[jax.Array] = None,
        loss_type: str = "mse",
        model_mean_type: str = "epsilon",
        model_var_type: str = "fixed_small",
    ):
        """Per-timestep diffusion training losses
        (``gaussian_diffusion.py:873-947``).  loss_type in
        {'mse','rescaled_mse','kl','rescaled_kl'}; an eps-model with
        'learned_range' variance returns 2C channels and gains a 'vb' term
        computed with a frozen mean like the original."""
        if noise is None:
            assert rng is not None, "training_losses needs noise or rng"
            noise = jax.random.normal(rng, x0.shape, x0.dtype)
        xt = self.q_sample(x0, t, noise)
        terms = {}
        if loss_type in ("kl", "rescaled_kl"):
            terms["loss"] = self._vb_terms_bpd(
                model_fn, x0, xt, t, clip_denoised=False,
                model_var_type=model_var_type,
            )["output"]
            if loss_type == "rescaled_kl":
                terms["loss"] = terms["loss"] * self.num_timesteps
            return terms
        assert loss_type in ("mse", "rescaled_mse"), loss_type
        model_output = model_fn(xt, self._model_t(t))
        if model_var_type in ("learned", "learned_range"):
            eps, var_values = jnp.split(model_output, 2, axis=-1)
            # variance learns through the VB term; mean is frozen there
            frozen = jnp.concatenate(
                [jax.lax.stop_gradient(eps), var_values], axis=-1
            )
            terms["vb"] = self._vb_terms_bpd(
                lambda *_a: frozen, x0, xt, t, clip_denoised=False,
                model_var_type="learned_range",
            )["output"]
            if loss_type == "rescaled_mse":
                terms["vb"] = terms["vb"] * (self.num_timesteps / 1000.0)
            model_output = eps
        target = {
            "xprev": lambda: self.q_posterior_mean_variance(x0, xt, t)[0],
            "xstart": lambda: x0,
            "epsilon": lambda: noise,
        }[model_mean_type]()
        terms["mse"] = _mean_flat((target - model_output) ** 2)
        terms["loss"] = terms["mse"] + terms["vb"] if "vb" in terms else terms["mse"]
        return terms

    def _prior_bpd(self, x0):
        """Prior KL vs N(0,1) in bits/dim (``gaussian_diffusion.py:949-964``)."""
        t = jnp.full((x0.shape[0],), self.num_timesteps - 1, jnp.int32)
        mean, _, logv = self.q_mean_variance(x0, t)
        return _mean_flat(normal_kl(mean, logv, 0.0, 0.0)) / math.log(2.0)

    def calc_bpd_loop(self, model_fn, x0, rng, clip_denoised=True,
                      model_var_type: str = "fixed_small"):
        """Full variational bound, per timestep, as one ``lax.scan``
        (``gaussian_diffusion.py:966-1021`` — there a Python loop)."""
        b = x0.shape[0]
        _, acp, _ = self._tables()

        def body(rng, t):
            rng, k = jax.random.split(rng)
            tb = jnp.full((b,), t, jnp.int32)
            noise = jax.random.normal(k, x0.shape, x0.dtype)
            xt = self.q_sample(x0, tb, noise)
            out = self._vb_terms_bpd(
                model_fn, x0, xt, tb, clip_denoised, model_var_type
            )
            xstart_mse = _mean_flat((out["pred_xstart"] - x0) ** 2)
            # eps implied by the model's x0 prediction
            eps = (
                self._extract(jnp.sqrt(1.0 / acp), tb, x0.ndim) * xt
                - out["pred_xstart"]
            ) / self._extract(jnp.sqrt(1.0 / acp - 1), tb, x0.ndim)
            mse = _mean_flat((eps - noise) ** 2)
            return rng, (out["output"], xstart_mse, mse)

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        _, (vb, xstart_mse, mse) = jax.lax.scan(body, rng, ts)
        vb, xstart_mse, mse = (jnp.swapaxes(a, 0, 1)[:, ::-1] for a in (vb, xstart_mse, mse))
        prior_bpd = self._prior_bpd(x0)
        return {
            "total_bpd": vb.sum(axis=1) + prior_bpd,
            "prior_bpd": prior_bpd,
            "vb": vb,
            "xstart_mse": xstart_mse,
            "mse": mse,
        }


def _mean_flat(x: jax.Array) -> jax.Array:
    return x.mean(axis=tuple(range(1, x.ndim)))


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL between two diagonal gaussians (guided-diffusion ``losses.py``)."""
    logvar1, logvar2 = jnp.asarray(logvar1), jnp.asarray(logvar2)
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (
        1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * x**3))
    )


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a gaussian discretized to 1/255 bins — the t=0
    decoder NLL of images scaled to [-1, 1] (guided-diffusion ``losses.py``)."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, 1e-12, None))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, 1e-12, None))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(
            x > 0.999,
            log_one_minus_cdf_min,
            jnp.log(jnp.clip(cdf_delta, 1e-12, None)),
        ),
    )


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
