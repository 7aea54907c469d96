"""CompVis-lineage LDM feature extractors (the legacy ODISE path).

Reference: ``modeling/meta_arch/ldm.py:56-782`` — ``LatentDiffusion`` (a
wrapper over the CompVis ``ldm`` package), ``LdmExtractor`` (encoder/UNet/
decoder feature taps with DDPM q_sample noising at configurable ``steps``),
``LdmImplicitCaptionerExtractor`` (CLIP-image-embedding-driven prompts), and
``TextAdapter`` (in ``madm_tpu.models.text_prompt``).

The TPU rebuild composes the same behavior from this repo's Flax SD modules
(taps are first-class there) + the ``GaussianDiffusion`` math lib, instead of
wrapping a separate CompVis codebase; CompVis ``.ckpt`` weights load through
``madm_tpu.checkpoint.load_compvis_checkpoint`` (the ``LdmCheckpointer``
naming contract, ``checkpoint/odise_checkpointer.py:114-124``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import prompt as prompt_lib
from .clip_image import ClipAdapter
from .diffusion import GaussianDiffusion
from .sd import UNet2DCondition, VAEDecoder, VAEEncoder, shared_noise
from .sd import unet as unet_lib
from .sd import vae as vae_lib


@dataclasses.dataclass(frozen=True)
class LatentDiffusion:
    """SD model metadata + schedule (reference ``ldm.py:56-225``).

    Holds the ldm_linear 1000-step ``GaussianDiffusion`` and the image/latent
    geometry per checkpoint family; the actual modules live on
    ``LdmExtractor`` (pure-pytree design)."""

    LDM_CONFIGS = {
        "sd://v1-3": ((512, 512), (64, 64)),
        "sd://v1-4": ((512, 512), (64, 64)),
        "sd://v1-5": ((512, 512), (64, 64)),
        "sd://v2-0-base": ((512, 512), (64, 64)),
        "sd://v2-1-base": ((512, 512), (64, 64)),
    }

    init_checkpoint: str = "sd://v1-4"
    guidance_scale: float = 7.5
    pixel_mean: Tuple[float, ...] = (0.5, 0.5, 0.5)
    pixel_std: Tuple[float, ...] = (0.5, 0.5, 0.5)

    @property
    def image_size(self) -> Tuple[int, int]:
        return self.LDM_CONFIGS[self.init_checkpoint][0]

    @property
    def latent_image_size(self) -> Tuple[int, int]:
        return self.LDM_CONFIGS[self.init_checkpoint][1]

    @property
    def latent_dim(self) -> int:
        return 4

    @property
    def diffusion(self) -> GaussianDiffusion:
        return GaussianDiffusion.create(steps=1000, schedule="ldm_linear")

    def apply_model_with_guidence(self, model_fn, x_noisy, t, cond):
        """Classifier-free guidance combine (``ldm.py:133-142``): the batch
        carries [cond | uncond] duplicated halves."""
        half = x_noisy[: len(x_noisy) // 2]
        combined = jnp.concatenate([half, half], axis=0)
        eps = model_fn(combined, t, cond)
        cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
        half_eps = uncond_eps + self.guidance_scale * (cond_eps - uncond_eps)
        return jnp.concatenate([half_eps, half_eps], axis=0)


class LdmExtractor:
    """Feature extractor with encoder/UNet/decoder taps
    (reference ``ldm.py:228-616``).

    ``__call__(variables, image, cond_inputs, cond_emb)`` returns the flat
    feature list ``[*encoder, *unet x len(steps), *decoder]`` in NHWC —
    encoder taps are resnet inputs, UNet taps are up-block inputs after the
    skip concat ('in' type), decoder taps are resnet inputs, matching the
    reference's hook placement exactly (``ldm.py:419-524``)."""

    def __init__(
        self,
        ldm: Optional[LatentDiffusion] = None,
        encoder_block_indices: Tuple[int, ...] = (5, 7),
        unet_block_indices: Tuple[int, ...] = (2, 5, 8, 11),
        decoder_block_indices: Tuple[int, ...] = (2, 5),
        steps: Tuple[int, ...] = (0,),
        share_noise: bool = True,
        compute_dtype=jnp.float32,
        unet_channels: Optional[Sequence[int]] = None,
        vae_channels: Optional[Sequence[int]] = None,
        **kwargs,
    ):
        self.ldm = ldm or LatentDiffusion(**kwargs)
        self.encoder_block_indices = tuple(encoder_block_indices)
        self.unet_block_indices = tuple(unet_block_indices)
        self.decoder_block_indices = tuple(decoder_block_indices)
        self.steps = tuple(steps)
        self.share_noise = share_noise

        self.vae_ch = tuple(vae_channels or vae_lib.BLOCK_OUT_CHANNELS)
        self.unet_ch = tuple(unet_channels or unet_lib.BLOCK_OUT_CHANNELS)
        self.vae_encoder = VAEEncoder(
            block_out_channels=self.vae_ch,
            encoder_block_indices=self.encoder_block_indices,
            tap_type="in",  # legacy hook placement (ldm.py:419-446)
            dtype=compute_dtype,
        )
        self.vae_decoder = VAEDecoder(
            block_out_channels=self.vae_ch,
            decoder_block_indices=self.decoder_block_indices,
            dtype=compute_dtype,
        )
        self.unet = UNet2DCondition(
            unet_block_indices=self.unet_block_indices,
            unet_block_indices_type="in",
            block_out_channels=self.unet_ch,
            dtype=compute_dtype,
        )

    # -------------------------------------------------- dims / strides
    @property
    def feature_size(self):
        return self.ldm.image_size

    @property
    def feature_dims(self) -> List[int]:
        """Per-feature channel counts (reference ``reset_dim_stride``,
        ``ldm.py:277-338``)."""
        enc, unet, dec = [], [], []
        # encoder: 2 resnets/level; tap dim = resnet input channels
        ch = self.vae_ch
        enc_in = []
        prev = ch[0]
        for level, c in enumerate(ch):
            for b in range(2):
                enc_in.append(prev if b == 0 else c)
            prev = c
        enc = [enc_in[i] for i in self.encoder_block_indices]
        # unet 'in' taps: up-block resnet input channels = prev + skip
        up_ch = tuple(reversed(self.unet_ch))  # (1280,1280,640,320)
        down_skips = []  # skip channels captured by the down path, in order
        down_skips.append(self.unet_ch[0])  # conv_in
        for i, c in enumerate(self.unet_ch):
            down_skips.extend([c, c])
            if i != len(self.unet_ch) - 1:
                down_skips.append(c)  # downsample
        unet_in = []
        h = self.unet_ch[-1]  # mid output
        for i, c in enumerate(up_ch):
            for b in range(3):
                unet_in.append(h + down_skips.pop())
                h = c
        unet = [unet_in[i] for i in self.unet_block_indices]
        # decoder: 3 resnets/level, levels reversed; tap dim = resnet input
        dec_ch = tuple(reversed(self.vae_ch))  # (512,512,256,128)
        dec_in = []
        prev = dec_ch[0]
        for c in dec_ch:
            for b in range(3):
                dec_in.append(prev if b == 0 else c)
            prev = c
        dec = [dec_in[i] for i in self.decoder_block_indices]
        return enc + unet * len(self.steps) + dec

    @property
    def feature_strides(self) -> List[int]:
        """Reference stride formulas (``ldm.py:297-331``)."""
        enc = [2 ** ((i + 2) // 2 - 1) for i in self.encoder_block_indices]
        unet = [64 // (2 ** ((i + 3) // 3 - 1)) for i in self.unet_block_indices]
        dec = [8 // (2 ** ((i + 3) // 3 - 1)) for i in self.decoder_block_indices]
        return enc + unet * len(self.steps) + dec

    @property
    def num_groups(self) -> int:
        return (
            len(self.encoder_block_indices)
            + len(self.unet_block_indices)
            + len(self.decoder_block_indices)
        )

    @property
    def grouped_indices(self) -> List[List[int]]:
        """Feature groups across ``steps`` (``ldm.py:359-380``)."""
        ret = [[i] for i in range(len(self.encoder_block_indices))]
        off = len(self.encoder_block_indices)
        for i in range(len(self.unet_block_indices)):
            ret.append([i + t * len(self.unet_block_indices) + off
                        for t in range(len(self.steps))])
        off += len(self.steps) * len(self.unet_block_indices)
        ret.extend([[i + off] for i in range(len(self.decoder_block_indices))])
        return ret

    # -------------------------------------------------------------- init
    def init_params(self, rng: jax.Array | int = 0) -> Dict[str, Any]:
        if isinstance(rng, int):
            rng = jax.random.PRNGKey(rng)
        k1, k2, k3 = jax.random.split(rng, 3)
        h, w = self.ldm.image_size
        lh, lw = h // 8, w // 8
        img = jnp.zeros((1, h, w, 3), jnp.float32)
        lat = jnp.zeros((1, lh, lw, 4), jnp.float32)
        ctx = jnp.zeros((1, 77, 768), jnp.float32)
        ts = jnp.zeros((1,), jnp.int32)
        params = {
            "vae_encoder": jax.jit(self.vae_encoder.init)(k1, img)["params"],
            "vae_decoder": jax.jit(self.vae_decoder.init)(k2, lat)["params"],
            "unet": jax.jit(self.unet.init)(k3, lat, ts, ctx)["params"],
        }
        consts = {
            "shared_noise": jnp.asarray(shared_noise(lh, lw))
            if self.share_noise else None,
            "uncond_inputs": jnp.zeros((1, 77, 768), jnp.float32),
        }
        return {"params": params, "consts": consts}

    # ----------------------------------------------------------- forward
    def __call__(
        self,
        variables: Dict[str, Any],
        image: jax.Array,  # [B, H, W, 3] in [0, 1]
        cond_inputs: Optional[jax.Array] = None,  # [B, 77, 768]
        cond_emb: Optional[jax.Array] = None,  # [B, len(steps), time_dim]
    ) -> List[jax.Array]:
        params = variables["params"]
        consts = variables["consts"]
        b = image.shape[0]
        mean = jnp.asarray(self.ldm.pixel_mean)
        std = jnp.asarray(self.ldm.pixel_std)
        x = (image - mean) / std  # [0,1] -> [-1,1] with (0.5, 0.5) stats

        latent, enc_feats = self.vae_encoder.apply(
            {"params": params["vae_encoder"]}, x
        )
        if cond_inputs is None:
            cond_inputs = jnp.broadcast_to(
                consts["uncond_inputs"], (b, 77, 768)
            )

        diffusion = self.ldm.diffusion
        unet_feats: List[jax.Array] = []
        for i, t in enumerate(self.steps):
            if t < 0:
                noisy, tb = latent, jnp.zeros((b,), jnp.int32)
            else:
                tb = jnp.full((b,), t, jnp.int32)
                if consts.get("shared_noise") is not None:
                    noise = jnp.broadcast_to(
                        consts["shared_noise"].astype(latent.dtype), latent.shape
                    )
                else:
                    noise = jnp.zeros_like(latent)
                noisy = diffusion.q_sample(latent, tb, noise)
            ce = None if cond_emb is None else cond_emb[:, i]
            _, taps = self.unet.apply(
                {"params": params["unet"]}, noisy, tb, cond_inputs, ce
            )
            unet_feats.extend(taps)

        _, dec_feats = self.vae_decoder.apply(
            {"params": params["vae_decoder"]}, latent, output_final=False
        )
        features = [*enc_feats, *unet_feats, *dec_feats]
        assert len(features) == len(self.feature_dims), (
            len(features), len(self.feature_dims)
        )
        return features


class LdmImplicitCaptionerExtractor:
    """CLIP-image-embedding-driven prompts over an ``LdmExtractor``
    (reference ``ldm.py:659-759``): the image's CLIP embedding is lifted via
    ``PositionalLinear`` to a 77x768 prompt (alpha-blended with the uncond
    embedding) and a time-embedding residual, one parameter set per domain."""

    def __init__(
        self,
        learnable_time_embed: bool = True,
        num_timesteps: int = 1,
        ldm_extractor: Optional[LdmExtractor] = None,
        without_prompt: bool = False,
        **kwargs,
    ):
        self.ldm_extractor = ldm_extractor or LdmExtractor(**kwargs)
        self.learnable_time_embed = learnable_time_embed
        self.num_timesteps = num_timesteps
        self.without_prompt = without_prompt
        self.clip = ClipAdapter(normalize=False)
        self.time_embed_dim = self.ldm_extractor.unet_ch[0] * 4

    # forwarding properties (ldm.py:707-726)
    feature_size = property(lambda self: self.ldm_extractor.feature_size)
    feature_dims = property(lambda self: self.ldm_extractor.feature_dims)
    feature_strides = property(lambda self: self.ldm_extractor.feature_strides)
    num_groups = property(lambda self: self.ldm_extractor.num_groups)
    grouped_indices = property(lambda self: self.ldm_extractor.grouped_indices)

    def init_params(self, rng: jax.Array | int = 0) -> Dict[str, Any]:
        if isinstance(rng, int):
            rng = jax.random.PRNGKey(rng)
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        variables = self.ldm_extractor.init_params(k1)
        dim = self.clip.dim_latent
        project = lambda k: {
            "prompt_embed_project": prompt_lib.init_positional_linear(
                k, dim, prompt_lib.PROMPT_DIM, prompt_lib.PROMPT_SEQ_LEN
            ),
            "time_embed_project": prompt_lib.init_positional_linear(
                jax.random.fold_in(k, 1), dim, self.time_embed_dim,
                self.num_timesteps,
            ),
            "alpha_cond_prompt": jax.random.uniform(
                jax.random.fold_in(k, 2),
                (1, prompt_lib.PROMPT_SEQ_LEN, prompt_lib.PROMPT_DIM),
            ),
            "alpha_uncond_prompt": jax.random.uniform(
                jax.random.fold_in(k, 3),
                (1, prompt_lib.PROMPT_SEQ_LEN, prompt_lib.PROMPT_DIM),
            ),
            "alpha_cond_time": jnp.zeros((self.time_embed_dim,), jnp.float32),
        }
        variables["params"]["clip_project_rgb"] = project(k2)
        variables["params"]["clip_project_others"] = jax.tree.map(
            jnp.copy, variables["params"]["clip_project_rgb"]
        )
        variables["params"]["clip_vision"] = jax.jit(self.clip.vision.init)(
            k4, jnp.zeros((1, self.clip.vision.image_size,
                           self.clip.vision.image_size, 3))
        )["params"]
        return variables

    def _project(self, p, uncond, prefix):
        """ClipFeatureProject with ``input_prefix=True``
        (``ldm_base.py:676-717``): prompt = tanh(a_u)*uncond +
        tanh(a_c)*PositionalLinear(clip_embed); time = tanh(a_t)*PL(detach)."""
        lifted = prompt_lib.positional_linear(p["prompt_embed_project"], prefix)
        if self.without_prompt:
            cp = jnp.broadcast_to(uncond, lifted.shape)
        else:
            cp = (
                jnp.tanh(p["alpha_uncond_prompt"]) * uncond
                + jnp.tanh(p["alpha_cond_prompt"]) * lifted
            )
        ct = None
        if self.learnable_time_embed:
            ct = jnp.tanh(p["alpha_cond_time"]) * prompt_lib.positional_linear(
                p["time_embed_project"], jax.lax.stop_gradient(prefix)
            )
        return cp, ct

    def __call__(
        self,
        variables: Dict[str, Any],
        image: jax.Array,
        input_modal: str = "rgb",
        ema_forward: bool = False,
    ) -> List[jax.Array]:
        params = variables["params"]
        prefix = self.clip.embed_image(params["clip_vision"], image)
        key = "clip_project_rgb" if input_modal == "rgb" else "clip_project_others"
        if ema_forward and f"ema_{key}" in variables.get("ema", {}):
            p = variables["ema"][f"ema_{key}"]
        else:
            p = params[key]
        uncond = variables["consts"]["uncond_inputs"]
        cond_inputs, cond_emb = self._project(p, uncond, prefix)
        if cond_emb is not None and cond_emb.shape[1] != len(self.ldm_extractor.steps):
            cond_emb = jnp.broadcast_to(
                cond_emb[:, :1],
                (cond_emb.shape[0], len(self.ldm_extractor.steps), cond_emb.shape[-1]),
            )
        return self.ldm_extractor(
            variables, image, cond_inputs=cond_inputs, cond_emb=cond_emb
        )
