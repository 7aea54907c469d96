"""Learnable prompt / time conditioning (reference: ``BasePromptTimeGenerator``).

The trained MADM configs condition the UNet not on CLIP text but on *learned*
constants (``modeling/meta_arch/ldm_base.py:632-717,720-968``):

- ``prompt_embed``: a learnable [1, 77, 768] prompt tensor replacing the text
  encoder output (``learnable_cond_prompt=True``, ``without_prompt_alpha`` as
  configured; the shipped configs use the alpha-blended form
  ``tanh(alpha_uncond) * uncond + tanh(alpha_cond) * prompt_embed``).
- ``time_embed``: a learnable [1, 1, 1280] residual added to the UNet time
  embedding, scaled by ``tanh(alpha_cond_time)``.

There is one such parameter set per domain (``clip_project_rgb`` /
``clip_project_others``); the shipped configs set ``same_cond_params=True``
(``...depth_11.py:41``), sharing a single set.  The CLIP-image-prefix path
(``clip_state != 'no'``) is intentionally deferred: trained configs use
``clip_state='no'`` so no CLIP image encoder participates.

TPU design: a plain parameter pytree + pure functions.  Domain selection is a
pytree choice in the caller, never module state.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

PROMPT_SEQ_LEN = 77
PROMPT_DIM = 768
TIME_EMBED_DIM = 1280


def _trunc_normal(rng, shape, std=0.02):
    # matches timm trunc_normal_: truncated at +-2 std
    return std * jax.random.truncated_normal(rng, -2.0, 2.0, shape, jnp.float32)


def init_clip_feature_project(
    rng: jax.Array | int = 0,
    learnable_cond_prompt: bool = True,
    learnable_cond_time: bool = True,
    without_prompt_alpha: bool = False,
    num_timesteps: int = 1,
    time_embed_dim: int = TIME_EMBED_DIM,
    seq_len: int = PROMPT_SEQ_LEN,
    input_prefix: bool = False,
    in_features: int = 768,
    multi_layer_prompt: bool = False,
    num_unet_layers: int = 16,
) -> Dict[str, Any]:
    """Initialize one ``ClipFeatureProject`` parameter set.

    (reference init: ``ldm_base.py:645-673`` — prompt/time embeds
    trunc-normal(0.02), alphas: cond/uncond prompt ~ U[0,1), time zeros.
    ``multi_layer_prompt`` gives each of the UNet's 16 cross-attention
    layers its own prompt row, ``ldm_base.py:649-651,658-662`` — shape
    [16, 1, seq, 768]; likewise the alphas.)"""
    if isinstance(rng, int):
        rng = jax.random.PRNGKey(rng)
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    lead = (num_unet_layers,) if multi_layer_prompt else ()
    p: Dict[str, Any] = {}
    if learnable_cond_prompt:
        if input_prefix:
            # CLIP image prefix -> PositionalLinear prompt
            # (ldm_base.py:657,844-853, input_prefix=True); the reference
            # only builds the per-layer prompt in the non-prefix branch
            assert not multi_layer_prompt, (
                "multi_layer_prompt is incompatible with clip_state prefixes "
                "(ldm_base.py:644-657)"
            )
            p["prompt_embed_project"] = init_positional_linear(
                r1, in_features, PROMPT_DIM, seq_len
            )
        else:
            p["prompt_embed"] = _trunc_normal(r1, lead + (1, seq_len, PROMPT_DIM))
        if not without_prompt_alpha:
            p["alpha_cond_prompt"] = jax.random.uniform(
                r3, lead + (1, seq_len, PROMPT_DIM)
            )
            p["alpha_uncond_prompt"] = jax.random.uniform(
                r4, lead + (1, seq_len, PROMPT_DIM)
            )
    if learnable_cond_time:
        if input_prefix:
            p["time_embed_project"] = init_positional_linear(
                r2, in_features, time_embed_dim, num_timesteps
            )
        else:
            p["time_embed"] = _trunc_normal(r2, (1, num_timesteps, time_embed_dim))
        p["alpha_cond_time"] = jnp.zeros((time_embed_dim,), jnp.float32)
    return p


def cond_prompt(
    params: Dict[str, Any],
    uncond_prompt: jax.Array,
    prefix: Optional[jax.Array] = None,
) -> jax.Array:
    """Conditioning prompt (reference ``ldm_base.py:675-691``); with a CLIP
    ``prefix`` [B, D] the learnable prompt comes from PositionalLinear."""
    if "prompt_embed_project" in params:
        assert prefix is not None, "clip_state prompt needs a prefix"
        lifted = positional_linear(params["prompt_embed_project"], prefix)
        if "alpha_cond_prompt" in params:
            return (
                jnp.tanh(params["alpha_uncond_prompt"]) * uncond_prompt
                + jnp.tanh(params["alpha_cond_prompt"]) * lifted
            )
        return lifted
    if "prompt_embed" not in params:
        return uncond_prompt
    if "alpha_cond_prompt" in params:
        alpha = params["alpha_cond_prompt"]  # [1,S,D] or [L,1,S,D] (multi-layer)
        if uncond_prompt.shape[-2] != alpha.shape[-2]:
            # prompt_seq_len != 77: bilinear-resize the uncond embedding
            # (reference get_cond_prompt, ldm_base.py:678-680)
            uncond_prompt = jax.image.resize(
                uncond_prompt,
                (uncond_prompt.shape[0],) + alpha.shape[-2:],
                method="bilinear", antialias=False,  # F.interpolate semantics
            )
        return (
            jnp.tanh(params["alpha_uncond_prompt"]) * uncond_prompt
            + jnp.tanh(alpha) * params["prompt_embed"]
        )
    return params["prompt_embed"]


def cond_time(
    params: Dict[str, Any], prefix: Optional[jax.Array] = None
) -> Optional[jax.Array]:
    """[1, 1, 1280] residual time embedding (reference ``ldm_base.py:703-712``);
    the prefix variant detaches the CLIP embedding like the reference."""
    if "time_embed_project" in params:
        assert prefix is not None
        return jnp.tanh(params["alpha_cond_time"]) * positional_linear(
            params["time_embed_project"], jax.lax.stop_gradient(prefix)
        )
    if "time_embed" not in params:
        return None
    return jnp.tanh(params["alpha_cond_time"]) * params["time_embed"]


def select_domain_params(prompt_params: Dict[str, Any], input_modal: str, same_cond_params: bool):
    """Pick rgb vs others parameter set (reference ``ldm_base.py:877-887``)."""
    if same_cond_params:
        return prompt_params["clip_project_rgb"]
    key = "clip_project_rgb" if input_modal == "rgb" else "clip_project_others"
    return prompt_params[key]


def init_prompt_generator(
    rng: jax.Array | int = 0,
    same_cond_params: bool = False,
    **kwargs,
) -> Dict[str, Any]:
    """Full prompt-generator pytree: rgb + others (shared when configured)."""
    if isinstance(rng, int):
        rng = jax.random.PRNGKey(rng)
    r1, r2 = jax.random.split(rng)
    tree = {"clip_project_rgb": init_clip_feature_project(r1, **kwargs)}
    if not same_cond_params:
        tree["clip_project_others"] = init_clip_feature_project(r2, **kwargs)
    return tree


# ---------------------------------------------------------------------------
# CLIP-image-prefix variant + prompt ablation ops.  Not exercised by the
# trained configs (clip_state='no'), kept for the full reference surface.
# ---------------------------------------------------------------------------


def init_positional_linear(
    rng: jax.Array,
    in_features: int,
    out_features: int,
    seq_len: int = PROMPT_SEQ_LEN,
) -> Dict[str, Any]:
    """PositionalLinear params (reference ``ldm_base.py:619-629``): a Dense
    lifting the CLIP image embedding plus a learnable positional table."""
    r1, r2 = jax.random.split(rng)
    scale = (1.0 / in_features) ** 0.5
    return {
        "kernel": jax.random.uniform(r1, (in_features, out_features),
                                     minval=-scale, maxval=scale),
        "bias": jnp.zeros((out_features,)),
        "positional_embedding": _trunc_normal(r2, (1, seq_len, out_features)),
    }


def positional_linear(params: Dict[str, Any], prefix: jax.Array) -> jax.Array:
    """[B, in] -> [B, seq, out] (reference ``ldm_base.py:626-629``)."""
    x = prefix @ params["kernel"] + params["bias"]
    return x[:, None, :] + params["positional_embedding"]


def mask_prompt(rng: jax.Array, prompt: jax.Array, mask_ratio: float) -> jax.Array:
    """Random token-row dropout on the prompt (reference ``ldm_base.py:926-938``)."""
    keep = (
        jax.random.uniform(rng, prompt.shape[:-1] + (1,)) > mask_ratio
    ).astype(prompt.dtype)
    return prompt * keep


def perturb_prompt(rng: jax.Array, prompt: jax.Array, scale: float) -> jax.Array:
    """Additive gaussian prompt perturbation (reference ``ldm_base.py:898-901``)."""
    return prompt + jax.random.normal(rng, prompt.shape, prompt.dtype) * scale


def rand_prompt(rng: jax.Array, prompt: jax.Array, scale: float) -> jax.Array:
    """Uniform random prompt replacement (reference ``ldm_base.py:902-903``)."""
    return jax.random.uniform(rng, prompt.shape, prompt.dtype) * scale


def mix_source_target_prompt(p_rgb: Dict[str, Any], p_others: Dict[str, Any],
                             uncond_prompt: jax.Array):
    """Average the two domains' conditioning (reference ``ldm_base.py:880-884``)."""
    cp = 0.5 * (cond_prompt(p_rgb, uncond_prompt) + cond_prompt(p_others, uncond_prompt))
    t_rgb, t_oth = cond_time(p_rgb), cond_time(p_others)
    ct = None if t_rgb is None else 0.5 * (t_rgb + t_oth)
    return cp, ct
