"""MADM meta-architecture: diffusion feature extractor + DAFormer head.

TPU-native re-composition of the reference's model stack
(``MTMADISE ⊃ AttentionFeatureExtractorBackbone ⊃ BasePromptTimeGenerator ⊃
LdmDiffusers`` — ``modeling/meta_arch/mtmadise.py``, ``ldm_diffusers.py``,
``feature_extractor.py``).  Instead of nested mutable nn.Modules with runtime
adapter switching, the model is:

- a static ``MADMConfig``;
- one parameter pytree (``init_params``) whose subtrees mirror the reference's
  trainable groups (unet, lora adapters, prompt embeddings, projections, head)
  plus frozen VAE weights and constants;
- pure apply functions: ``backbone_forward`` (VAE-encode -> add_noise ->
  UNet-with-taps -> VAE-decode -> per-scale projections) and ``head_forward``.

Branching that the reference does by mutating modules (LoRA adapter choice,
EMA-vs-student, rgb-vs-others prompt) is a *pytree selection in the caller*
here, so every variant is one straight-line XLA program.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from . import prompt as prompt_lib
from .daformer import DAFormerHead, argmax_classes, resize_bilinear
from .projections import MultiScaleProjection
from .sd import (
    UNet2DCondition,
    VAEDecoder,
    VAEEncoder,
    add_noise,
    init_lora,
    merge_lora,
    parse_lora_configs,
    shared_noise,
)


@dataclasses.dataclass(frozen=True)
class MADMConfig:
    """Static model configuration (mirrors the trained MADM configs)."""

    num_classes: int = 11
    target_modality: str = "Depth"
    # backbone taps / projections (…depth_11.py:50-55)
    unet_block_indices: Tuple[int, ...] = (5, 8, 11)
    unet_block_indices_type: str = "after"
    out_features: Tuple[str, ...] = ("s0", "s3", "s4", "s5")
    feature_dims: Tuple[int, ...] = (3, 320, 640, 1280)
    projection_dim: Tuple[int, ...] = (128, 512, 512, 512)
    in_keys: Tuple[str, ...] = ("s0", "s3", "s4", "s5")
    head_channels: int = 256
    # head variants (reference daformer_head.py:52-88,608-643; shipped
    # configs use the plain 'aspp' head)
    head_fusion: str = "aspp"
    final_fuse_vae_decoder_feat: bool = False
    concat_attention_to_conv_seg: bool = False
    # conditioning
    same_cond_params: bool = True
    # per-UNet-cross-attn-layer learnable prompts: [16,1,77,768]
    # (reference --multi_layer_prompt, ldm_base.py:635-660,927-934)
    multi_layer_prompt: bool = False
    # cross-attention probability taps (a WORKING implementation of the
    # reference's attention-features surface — its snapshot stores the
    # config, reads the flags, but never fills ``attention_features``:
    # feature_extractor.py:287-396 sets it to {}, and the consuming
    # ``atte_controller`` is never defined, cmdise.py:484-485).
    # res uses the reference's 512-input naming ({16,32,64}; 8 = mid)
    attention_features_res: Tuple[int, ...] = ()
    attention_features_location: Tuple[str, ...] = ()  # 'down'|'mid'|'up'
    # teacher-student consistency on target attention maps (the reference
    # reads this flag, cmdise.py:178, but never consumes it — here a
    # working loss, see train_step)
    target_attention_loss: bool = False
    # token indices selected out of the 77 prompt rows for the head's
    # conv_seg concat (main.py:510-511; must have num_classes entries when
    # concat_attention_to_conv_seg — daformer_head.py:575 sizes conv_seg
    # as channels + num_classes)
    attention_select_index: Optional[Tuple[int, ...]] = None
    # feature-distance regularization on up-block cross-attention maps vs
    # the frozen init UNet (main.py:545-548, mtmadise.py:258-259,533-546)
    fd_attention: float = 0.0
    # CLIP image prefix conditioning (reference --with_clip,
    # ldm_base.py:740-760,844-853): 'no' (shipped configs) |
    # 'no_learnable_clip' (frozen tower) | 'learnable_clip' (trainable,
    # with an EMA copy for teacher passes)
    clip_state: str = "no"
    # which UNet params train: 'all' | 'no' | 'attention' |
    # 'without cross-attention' (reference ldm_diffusers.py:101-121);
    # consumed by train.optimizer.split_trainable as a trainability mask
    finetune_unet: str = "all"
    # train-time sliding-window crops (feature_extractor.py:199-278)
    slide_training: bool = False
    # conv_in surgery (reference ldm_diffusers.py:60-99) — ablations, off in
    # shipped configs:
    # extra latent input channels fed by a per-modality constant mask;
    # values parsed from mask_diff like 'rgb=0_Depth=1' (mtmadise.py:66-75)
    input_channel_plus: int = 0
    mask_diff: Optional[str] = None
    # grayscale pixel-unshuffle tower concatenated to the latent (68ch conv_in)
    concat_pixel_shuffle: bool = False
    # extra latent noise on the mixed pass / latent normalization
    # (ldm_diffusers.py:165-168)
    add_latent_noise: float = -1.0
    norm_latent_noise: bool = False
    # separate decode head for the target modality (cmdise.py:154-157;
    # False in shipped configs -> one shared head)
    sem_seg_head_sec_modal: bool = False
    # vae decoder regression (vae_decoder_loss 'st')
    vae_decoder_loss: str = "st"
    # lora
    lora_configs: Tuple[str, ...] = ()
    # precision
    compute_dtype: Any = jnp.bfloat16
    # width overrides (full SD-v1.4 by default; shrink for CPU tests)
    unet_channels: Optional[Tuple[int, ...]] = None
    vae_channels: Optional[Tuple[int, ...]] = None
    # gradient rematerialization for the UNet (training memory: 860M params
    # + Adam states leave ~2GB for activations on a 16GB v5e — remat the
    # UNet blocks; replaces torch.utils.checkpoint, ldm_diffusers.py:377-433)
    remat: bool = False
    # uda — the reference keeps every UDA knob on the model object
    # (``cmdise.py:118-149`` / ``mtmadise.py:28-48`` ctor args), so
    # reference-style overrides like ``model.rev_noise_sup=True`` port
    # verbatim; ``madm_tpu.train.build_train_config`` reads them from here
    ema_alpha: float = 0.999
    pseudo_threshold: float = 0.968
    train_palette: Tuple[int, ...] = ()
    # palette for the VAE-decoder color-regression TARGETS only: None ->
    # train_palette; 'discrete' -> the fixed high-contrast palette
    # (``mtmadise.py:83-103``; reg_uncertain's distance table always uses
    # train_palette, matching ``mtmadise.py:92-94``)
    reg_target_palette: Optional[str] = None
    blur: bool = True
    color_jitter_strength: float = 0.2
    color_jitter_probability: float = 0.2
    enable_mixup: bool = True
    pl_crop: bool = False
    psweight_ignore_top: int = 15
    # EMA teacher also tracks the UNet (+LoRA) — reference --ema_w_unet
    # (cmdise.py:318-321: the teacher deepcopies the LoRA-injected unet)
    ema_w_unet: bool = False
    mic: bool = False
    mask_ratio: float = 0.7
    mic_reg: float = 0.0
    mic_reg_wo_pl_val: bool = False
    # masked-consistency pass on the dataset's texture-removed edge map
    # ('target_second_modality_pha') instead of a masked target image —
    # the reference's live remove_texture branch (cmdise.py:573-576)
    remove_texture: bool = False
    fd: float = 0.0
    denoise_supervise: float = 0.0
    denoise_timestep_range: Optional[Tuple[int, int]] = None
    rev_noise_sup: bool = False
    rev_noise_end_iter: Optional[int] = None
    rev_noise_gradually: bool = False
    noise_reg: float = 0.0
    vae_decoder_loss_type: str = "L1"
    vae_decoder_loss_weight: Tuple[float, ...] = (1.0, 1.0)
    reg_uncertain: bool = False
    # per-sample confident fraction ('sample', default — equals the
    # reference's per-rank scalar at its shipped local batch 1,
    # cmdise.py:498-502, independent of device count) vs one global scalar
    # over the whole GSPMD batch ('batch')
    pseudo_weight_scope: str = "sample"
    eval_with_noise: Optional[int] = None
    # prompt ablations (reference ldm_base.py:893-924 / cmdise.py:179-191):
    # extra passes with token-dropout / gaussian-perturbed / random prompts
    mask_prompt_ratio: float = 0.0
    detach_mask_prompt: bool = False
    prompt_perturbation: float = 0.0
    prompt_confidence: Optional[float] = None
    rand_prompt_scale: float = 0.5
    # prompt structure ablations (main.py:466-468,597-598,507-508):
    # without_prompt drops the learnable prompt AND time embed; the others
    # reshape/seed the learnable prompt
    without_prompt: bool = False
    without_prompt_alpha: bool = False
    prompt_seq_len: Optional[int] = None
    init_uncond_prompt: bool = False
    # denoise_supervise student-timestep shift (cmdise.py:584)
    denoise_interval: int = 0
    # two-stage source/pl-data mixing (cmdise.py:198-210,392-408)
    merge_with_pl_data: Optional[str] = None
    pl_merge_val: float = 0.5
    # input size
    crop_size: Tuple[int, int] = (512, 512)

    @property
    def latent_size(self) -> Tuple[int, int]:
        return (self.crop_size[0] // 8, self.crop_size[1] // 8)

    @property
    def use_s0(self) -> bool:
        return "s0" in self.out_features


class PixelUnshuffleTower(nn.Module):
    """PixelUnshuffle(8) + conv/BN/SiLU + conv/BN producing a 64-channel
    latent-resolution map from the grayscale input, concatenated to the
    noisy latent when ``concat_pixel_shuffle`` (reference
    ``ldm_diffusers.py:83-99,170-173``).

    BN normalizes by batch statistics in every mode (no running-stat state:
    the reference creates this tower after ``_freeze`` so its BN runs in
    train mode throughout training; checkpoint-stat parity is not needed —
    no released checkpoint uses the ablation)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, gray: jax.Array) -> jax.Array:  # [B, H, W, 1]
        b, h, w, _ = gray.shape
        # torch PixelUnshuffle channel order: dy*8 + dx
        x = gray.reshape(b, h // 8, 8, w // 8, 8)
        x = x.transpose(0, 1, 3, 2, 4).reshape(b, h // 8, w // 8, 64)

        def bn(x, name):
            mean = x.mean(axis=(0, 1, 2))
            var = x.var(axis=(0, 1, 2))
            scale = self.param(f"{name}_scale", nn.initializers.ones, (x.shape[-1],))
            bias = self.param(f"{name}_bias", nn.initializers.zeros, (x.shape[-1],))
            return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias

        x = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv1")(x)
        x = nn.silu(bn(x, "bn1"))
        x = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv2")(x)
        return bn(x, "bn2")


def _chunk_over_batch(fn, feats: Dict[str, jax.Array], chunk: int) -> jax.Array:
    """Apply a per-image-independent ``fn`` over batch chunks and concat.

    Bounds fn's internal activation footprint (the fused eval head's
    full-res intermediates scale with B*H*W); exact for any fn that maps
    each batch row independently (the head is)."""
    b = next(iter(feats.values())).shape[0]
    if b <= chunk:
        return fn(feats)
    parts = [
        fn({k: v[i : i + chunk] for k, v in feats.items()})
        for i in range(0, b, chunk)
    ]
    return jnp.concatenate(parts, axis=0)


class MADM:
    """Module container + pure apply functions for the MADM model."""

    def __init__(self, config: MADMConfig):
        self.cfg = config
        dt = config.compute_dtype
        from .sd import unet as unet_lib, vae as vae_lib

        vae_ch = config.vae_channels or vae_lib.BLOCK_OUT_CHANNELS
        unet_ch = config.unet_channels or unet_lib.BLOCK_OUT_CHANNELS
        self.vae_encoder = VAEEncoder(block_out_channels=vae_ch, dtype=dt)
        self.vae_decoder = VAEDecoder(block_out_channels=vae_ch, dtype=dt)
        self.unet = UNet2DCondition(
            unet_block_indices=config.unet_block_indices,
            unet_block_indices_type=config.unet_block_indices_type,
            block_out_channels=unet_ch,
            dtype=dt,
            remat=config.remat,
        )
        # capture variant: same params, sows cross-attn probabilities into
        # 'attn_probs'.  A separate module (not a flag on self.unet) so
        # ordinary passes keep the fused/flash attention path
        self.unet_capture = (
            UNet2DCondition(
                unet_block_indices=config.unet_block_indices,
                unet_block_indices_type=config.unet_block_indices_type,
                block_out_channels=unet_ch,
                dtype=dt,
                remat=config.remat,
                attention_features_res=config.attention_features_res,
                attention_features_location=config.attention_features_location,
            )
            if config.attention_features_res
            else None
        )
        if config.concat_attention_to_conv_seg or config.target_attention_loss or config.fd_attention:
            assert self.unet_capture is not None, (
                "attention consumers need attention_features_res/location set "
                "(reference main.py:545-548 sets res={16,32}, location=['up'])"
            )
        if config.concat_attention_to_conv_seg:
            assert config.attention_select_index is not None and len(
                config.attention_select_index
            ) == config.num_classes, (
                "concat_attention_to_conv_seg needs attention_select_index "
                "with num_classes entries (daformer_head.py:575)"
            )
        self.projections = MultiScaleProjection(
            feature_dims=config.feature_dims,
            projection_dim=config.projection_dim,
            out_features=config.out_features,
            dtype=dt,
        )
        self.head = DAFormerHead(
            in_keys=config.in_keys,
            num_classes=config.num_classes,
            channels=config.head_channels,
            dtype=dt,
            remat=config.remat,
            fusion=config.head_fusion,
            final_fuse_vae_decoder_feat=config.final_fuse_vae_decoder_feat,
            concat_attention_to_conv_seg=config.concat_attention_to_conv_seg,
        )
        self.lora_specs = parse_lora_configs(config.lora_configs)

        # mask_diff per-modality constants, 'rgb=0_Depth=1' (mtmadise.py:66-75)
        self.mask_val: Dict[str, float] = {}
        if config.mask_diff and config.mask_diff != "circle":
            for part in config.mask_diff.split("_"):
                name, val = part.split("=")
                self.mask_val[name] = float(val)
        if config.input_channel_plus:
            assert config.mask_diff, "input_channel_plus needs mask_diff values"
        self.pixel_tower = (
            PixelUnshuffleTower(dtype=dt) if config.concat_pixel_shuffle else None
        )
        assert config.clip_state in ("no", "no_learnable_clip", "learnable_clip")
        if config.clip_state != "no":
            from .clip_image import ClipAdapter

            # full ViT-L/14-336 by default; tests swap self.clip_adapter
            # for a shrunk tower before init_params
            self.clip_adapter = ClipAdapter(normalize=False, dtype=dt)
        else:
            self.clip_adapter = None

        # static validation: declared feature_dims must match the UNet's tap
        # channels (taps arrive smallest-res first; feature_dims is ordered
        # largest-res first, after the optional s0 decoder feature)
        tap_dims = [self._tap_channels(unet_ch, i) for i in config.unet_block_indices]
        expected = ([3] if config.use_s0 else []) + list(reversed(tap_dims))
        if list(config.feature_dims) != expected:
            raise ValueError(
                f"feature_dims {tuple(config.feature_dims)} does not match the "
                f"backbone's tap channels {tuple(expected)} "
                f"(unet_block_indices={tuple(config.unet_block_indices)}, "
                f"use_s0={config.use_s0})"
            )

    @staticmethod
    def _tap_channels(unet_ch, tap_index: int) -> int:
        """Output channels of up-block resnet ``tap_index`` ('after' taps)."""
        up_channels = tuple(reversed(unet_ch))
        return up_channels[tap_index // 3]

    # ------------------------------------------------------------------ init
    def init_params(self, rng: jax.Array | int = 0) -> Dict[str, Any]:
        """Build the full parameter pytree (random init; real SD weights come
        from the checkpoint converter)."""
        if isinstance(rng, int):
            rng = jax.random.PRNGKey(rng)
        keys = jax.random.split(rng, 9)
        h, w = self.cfg.crop_size
        lh, lw = self.cfg.latent_size
        img = jnp.zeros((1, h, w, 3), jnp.float32)
        lat = jnp.zeros((1, lh, lw, 4), jnp.float32)
        # conv_in surgery widens the UNet input (ldm_diffusers.py:60-99)
        in_lat = jnp.zeros((1, lh, lw, self.unet_in_channels), jnp.float32)
        ctx = jnp.zeros((1, 77, 768), jnp.float32)
        ts = jnp.zeros((1,), jnp.int32)

        # jit each sub-init separately: smaller XLA compiles, better caching
        vae_enc = jax.jit(self.vae_encoder.init)(keys[0], img)["params"]
        vae_dec = jax.jit(self.vae_decoder.init)(keys[1], lat)["params"]
        unet = jax.jit(self.unet.init)(keys[2], in_lat, ts, ctx)["params"]

        feats = [
            jnp.zeros((1, h // s, w // s, c), jnp.float32)
            for s, c in zip(self._strides(), self.cfg.feature_dims)
        ]
        proj_vars = jax.jit(self.projections.init)(keys[3], feats)
        proj = proj_vars["params"]
        head_in = {
            k: jnp.zeros((1, h // s, w // s, d), jnp.float32)
            for k, s, d in zip(self.cfg.in_keys, self._strides(), self.cfg.projection_dim)
        }
        head_kw = {}
        if self.cfg.concat_attention_to_conv_seg:
            # conv_seg takes channels + num_classes inputs
            # (daformer_head.py:575) — init with the concat slot populated
            s0 = self._strides()[0]
            head_kw["cross_attention_feat"] = jnp.zeros(
                (1, h // s0, w // s0, self.cfg.num_classes), jnp.float32
            )
        head_vars = jax.jit(partial(self.head.init, **head_kw))(keys[4], head_in)
        head, head_bn = head_vars["params"], head_vars.get("batch_stats", {})
        head_sec = jax.tree.map(jnp.copy, head) if self.cfg.sem_seg_head_sec_modal else None
        head_sec_bn = jax.tree.map(jnp.copy, head_bn) if self.cfg.sem_seg_head_sec_modal else None

        prompt = prompt_lib.init_prompt_generator(
            keys[5],
            same_cond_params=self.cfg.same_cond_params,
            time_embed_dim=self.unet.block_out_channels[0] * 4,
            learnable_cond_prompt=not self.cfg.without_prompt,
            learnable_cond_time=not self.cfg.without_prompt,
            without_prompt_alpha=self.cfg.without_prompt_alpha,
            seq_len=self.cfg.prompt_seq_len or prompt_lib.PROMPT_SEQ_LEN,
            input_prefix=self.cfg.clip_state != "no",
            in_features=(
                self.clip_adapter.dim_latent if self.clip_adapter else 768
            ),
            multi_layer_prompt=self.cfg.multi_layer_prompt,
        )
        lora = {
            name: init_lora(unet, spec["rank"], spec["alpha"], rng=keys[6])
            for name, spec in self.lora_specs.items()
        }

        params = {
            "vae_encoder": vae_enc,
            "vae_decoder": vae_dec,
            "unet": unet,
            "lora": lora,
            "prompt": prompt,
            "projections": proj,
            "head": head,
        }
        if self.pixel_tower is not None:
            gray = jnp.zeros((1, h, w, 1), jnp.float32)
            params["pixel_unshuffle"] = jax.jit(self.pixel_tower.init)(
                keys[8], gray
            )["params"]
        if self.clip_adapter is not None:
            s_clip = self.clip_adapter.vision.image_size
            params["clip_vision"] = jax.jit(self.clip_adapter.vision.init)(
                keys[7], jnp.zeros((1, s_clip, s_clip, 3), jnp.float32)
            )["params"]
        state = {"head_bn": head_bn, "ema_head_bn": jax.tree.map(jnp.copy, head_bn)}
        if self.cfg.sem_seg_head_sec_modal:
            params["head_sec"] = head_sec
            state["head_sec_bn"] = head_sec_bn
        ema = self.init_ema(params)
        consts = {
            "uncond_inputs": jnp.zeros((1, 77, 768), jnp.float32),
            "shared_noise": jnp.asarray(shared_noise(lh, lw)),
        }
        return {"params": params, "ema": ema, "state": state, "consts": consts}

    def init_ema(self, params: Dict[str, Any]) -> Dict[str, Any]:
        """Teacher copies of projections / head / prompt-others
        (reference ``cmdise.py:307-325``)."""
        others_key = (
            "clip_project_rgb" if self.cfg.same_cond_params else "clip_project_others"
        )
        tree = {
            "projections": params["projections"],
            "head": params["head"],
            "clip_project_others": params["prompt"][others_key],
        }
        if self.cfg.clip_state == "learnable_clip":
            # teacher passes use an EMA CLIP tower (ldm_base.py:846-848)
            tree["clip_vision"] = params["clip_vision"]
        if self.cfg.ema_w_unet:
            # teacher UNet + LoRA copies (cmdise.py:318-321)
            tree["unet"] = params["unet"]
            tree["lora"] = params["lora"]
        return jax.tree.map(jnp.copy, tree)

    def _strides(self) -> Tuple[int, ...]:
        return tuple(2 ** int(name[1]) for name in self.cfg.out_features)

    @property
    def unet_in_channels(self) -> int:
        """conv_in input channels after surgery (ldm_diffusers.py:60-99)."""
        return (
            4
            + self.cfg.input_channel_plus
            + (64 if self.cfg.concat_pixel_shuffle else 0)
        )

    def modality_mask(self, images: jax.Array, modal_name: str) -> Optional[jax.Array]:
        """Constant per-modality mask at latent resolution, [B,h/8,w/8,1]
        (mtmadise.py:245-247,316-318 — F.interpolate nearest 1/8 of a
        constant map is the constant map)."""
        if not self.cfg.input_channel_plus:
            return None
        b, h, w, _ = images.shape
        val = self.mask_val[modal_name]
        return jnp.full((b, h // 8, w // 8, self.cfg.input_channel_plus),
                        val, jnp.float32)

    def mixed_modality_mask(self, mix_mask: jax.Array, modal_name: str) -> Optional[jax.Array]:
        """Mixed-pass mask: rgb value where the DACS mask pastes source,
        target value elsewhere, nearest-downsampled 8x (mtmadise.py:291-296).
        ``mix_mask``: [B,H,W] 1=source."""
        if not self.cfg.input_channel_plus:
            return None
        m = mix_mask[:, ::8, ::8].astype(jnp.float32)[..., None]
        out = self.mask_val["rgb"] * m + self.mask_val[modal_name] * (1.0 - m)
        return jnp.broadcast_to(
            out, out.shape[:3] + (self.cfg.input_channel_plus,)
        )

    # ------------------------------------------------------- conditioning
    def conditioning(
        self,
        variables: Dict[str, Any],
        input_modal: str,
        ema_forward: bool = False,
        batch_size: int = 1,
        prompt_mode: Optional[str] = None,
        prompt_rng: Optional[jax.Array] = None,
        images: Optional[jax.Array] = None,  # [B,H,W,3] in [0,1] (clip prefix)
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """cond prompt [B,77,768] + residual time embedding [B,1280] | None.

        (reference ``ldm_base.py:832-924``: rgb -> clip_project_rgb, others/
        mixed -> clip_project_others, teacher -> ema_clip_project_others;
        ``prompt_mode`` applies the masked/perturbed/random prompt ablations,
        ``ldm_base.py:893-908``.)"""
        uncond = variables["consts"]["uncond_inputs"]
        if ema_forward:
            p = variables["ema"]["clip_project_others"]
        else:
            p = prompt_lib.select_domain_params(
                variables["params"]["prompt"], input_modal, self.cfg.same_cond_params
            )
        prefix = None
        if self.cfg.clip_state != "no":
            assert images is not None, "clip_state conditioning needs images"
            clip_params = (
                variables["ema"]["clip_vision"]
                if ema_forward and self.cfg.clip_state == "learnable_clip"
                else variables["params"]["clip_vision"]
            )
            prefix = self.clip_adapter.vision.apply(
                {"params": clip_params}, self.clip_adapter.preprocess(images)
            )
            if self.cfg.clip_state == "no_learnable_clip" or ema_forward:
                prefix = jax.lax.stop_gradient(prefix)
        cp = prompt_lib.cond_prompt(p, uncond, prefix)
        ct = prompt_lib.cond_time(p, prefix)
        if prompt_mode is not None:
            assert prompt_rng is not None, "prompt ablations need an rng"
            if prompt_mode == "masked_prompt" and self.cfg.mask_prompt_ratio:
                cp = prompt_lib.mask_prompt(prompt_rng, cp, self.cfg.mask_prompt_ratio)
                if self.cfg.detach_mask_prompt:
                    cp = jax.lax.stop_gradient(cp)
            elif prompt_mode == "prompt_perturbation" and self.cfg.prompt_perturbation:
                cp = jax.lax.stop_gradient(
                    prompt_lib.perturb_prompt(prompt_rng, cp, self.cfg.prompt_perturbation)
                )
            elif prompt_mode == "rand_prompt":
                cp = prompt_lib.rand_prompt(prompt_rng, cp, self.cfg.rand_prompt_scale)
        if cp.ndim == 4:  # multi_layer_prompt: [L, 1, S, D] -> [L, B, S, D]
            cp = jnp.broadcast_to(cp, cp.shape[:1] + (batch_size,) + cp.shape[2:])
        else:
            cp = jnp.broadcast_to(cp, (batch_size,) + cp.shape[1:])
        if ct is not None:
            ct = jnp.broadcast_to(ct, (batch_size,) + ct.shape[1:])
        return cp, ct

    # ------------------------------------------------ attention features
    def _collect_attention(
        self, probs_tree: Dict[str, Any], lh: int, lw: int
    ) -> Dict[str, Any]:
        """Sown cross-attn probabilities -> the attention-features surface.

        Returns:
          ``attention_features``: {res: [B,h,w,S] fp32} — maps averaged over
            every captured layer at that resolution (the working version of
            the reference's always-empty dict, feature_extractor.py:369);
          ``up_cross``: ordered list of up-location maps, the
            ``get_average_attention()['up_cross']`` analog (mtmadise.py:259);
          ``cross_attention_feat``: [B,h,w,num_classes] token-selected map at
            the largest captured resolution, feeding the head's
            ``concat_attention_to_conv_seg`` slot (daformer_head.py:677-688).
        """
        cfg = self.cfg
        nb = len(self.unet.block_out_channels)

        def leaf(block: str, attn_name: str):
            try:
                t = probs_tree[block][attn_name]["transformer_blocks_0"]["attn2"]
                return t["probs"][0]  # sow() stores a 1-tuple
            except KeyError:
                return None

        entries = []  # (location, res, [B,h,w,S])
        for bi in range(nb - 1):
            h, w = lh >> bi, lw >> bi
            for i in range(2):  # LAYERS_PER_BLOCK
                p = leaf(f"down_blocks_{bi}", f"attentions_{i}")
                if p is not None:
                    b, _, s = p.shape
                    entries.append(("down", 64 >> bi, p.reshape(b, h, w, s)))
        p = leaf("mid_block", "attentions_0")
        if p is not None:
            h, w = lh >> (nb - 1), lw >> (nb - 1)
            b, _, s = p.shape
            entries.append(("mid", 8, p.reshape(b, h, w, s)))
        for bi in range(1, nb):
            h, w = lh >> (nb - 1 - bi), lw >> (nb - 1 - bi)
            for i in range(3):  # LAYERS_PER_BLOCK + 1
                p = leaf(f"up_blocks_{bi}", f"attentions_{i}")
                if p is not None:
                    b, _, s = p.shape
                    entries.append(("up", 8 << bi, p.reshape(b, h, w, s)))

        by_res: Dict[int, list] = {}
        for _, res, p in entries:
            by_res.setdefault(res, []).append(p)
        features = {
            res: sum(ps) / len(ps) for res, ps in sorted(by_res.items())
        }
        out: Dict[str, Any] = {
            "attention_features": features,
            "up_cross": [p for loc, _, p in entries if loc == "up"],
        }
        if cfg.attention_select_index is not None and features:
            big = features[max(features)]
            out["cross_attention_feat"] = big[
                ..., jnp.asarray(cfg.attention_select_index)
            ]
        return out

    # ---------------------------------------------------------- backbone
    def backbone_forward(
        self,
        variables: Dict[str, Any],
        images: jax.Array,  # [B, H, W, 3] in [0, 1]
        *,
        input_modal: str = "rgb",
        lora_name: Optional[str] = None,
        ema_forward: bool = False,
        timesteps: Optional[jax.Array] = None,  # [B] int32, defaults to 0
        want_decoder_output: bool = False,
        train: bool = False,
        modality_mask: Optional[jax.Array] = None,  # [B,h/8,w/8,N] mask_diff
        latent_noise_rng: Optional[jax.Array] = None,  # add_latent_noise
        prompt_mode: Optional[str] = None,  # masked/perturbed/random prompt
        prompt_rng: Optional[jax.Array] = None,
        capture_attention: bool = False,  # tap cross-attn probability maps
    ) -> Dict[str, Any]:
        """One diffusion feature pass.

        Returns dict with:
          ``output_features``: {name: NHWC} projected features for the head
          ``before_vae_decoder`` / ``after_vae_decoder`` when requested
          (reference return contract: ``ldm_diffusers.py:191-217`` +
          ``feature_extractor.py:367-396``).
        """
        cfg = self.cfg
        params = variables["params"]
        b = images.shape[0]

        # normalize to [-1, 1] (ldm_diffusers.py:144-147, input_range '-1+1')
        x = images * 2.0 - 1.0

        latents, _ = self.vae_encoder.apply({"params": params["vae_encoder"]}, x)
        latents = jax.lax.stop_gradient(latents)  # VAE frozen + no_grad

        if timesteps is None:
            timesteps = jnp.zeros((b,), jnp.int32)
        noise = jnp.broadcast_to(variables["consts"]["shared_noise"], latents.shape)
        noisy = add_noise(latents, noise.astype(latents.dtype), timesteps)

        # --- conv_in surgery inputs (ldm_diffusers.py:165-178) ---
        if cfg.add_latent_noise != -1.0 and input_modal == "mixed":
            assert latent_noise_rng is not None, "add_latent_noise needs an rng"
            noisy = noisy + (
                jax.random.normal(latent_noise_rng, noisy.shape, noisy.dtype)
                * cfg.add_latent_noise
            )
        if cfg.norm_latent_noise:  # global mean/std like torch.mean/std
            noisy = (noisy - jnp.mean(noisy)) / jnp.std(noisy)
        if self.pixel_tower is not None:
            gray = jnp.mean(x, axis=-1, keepdims=True)
            tower = self.pixel_tower.apply(
                {"params": params["pixel_unshuffle"]}, gray
            )
            noisy = jnp.concatenate([noisy, tower.astype(noisy.dtype)], axis=-1)
        if cfg.input_channel_plus:
            assert modality_mask is not None, "mask_diff needs a modality_mask"
            noisy = jnp.concatenate(
                [noisy, modality_mask.astype(noisy.dtype)], axis=-1
            )

        cond_prompt, cond_time = self.conditioning(
            variables, input_modal, ema_forward, batch_size=b,
            prompt_mode=prompt_mode, prompt_rng=prompt_rng, images=images,
        )

        # --ema_w_unet: teacher passes run the EMA UNet + LoRA (cmdise.py:318-321)
        unet_src = (
            variables["ema"] if (ema_forward and cfg.ema_w_unet) else params
        )
        unet_params = unet_src["unet"]
        if lora_name is not None and lora_name in unet_src["lora"]:
            spec = self.lora_specs[lora_name]
            unet_params = merge_lora(
                unet_params, unet_src["lora"][lora_name],
                scale=spec["alpha"] / spec["rank"],
            )

        if capture_attention:
            assert self.unet_capture is not None, (
                "capture_attention needs attention_features_res/location"
            )
            (eps, taps), mut = self.unet_capture.apply(
                {"params": unet_params}, noisy, timesteps, cond_prompt, cond_time,
                mutable=["attn_probs"],
            )
            attn = self._collect_attention(
                mut["attn_probs"], noisy.shape[1], noisy.shape[2]
            )
        else:
            eps, taps = self.unet.apply(
                {"params": unet_params}, noisy, timesteps, cond_prompt, cond_time
            )
            attn = {}

        out: Dict[str, Any] = {"unet_taps": taps, **attn}
        feats: list = []
        if cfg.use_s0:
            assert cfg.vae_decoder_loss is not None
            dec_rgb, _ = self.vae_decoder.apply({"params": params["vae_decoder"]}, eps)
            out["before_vae_decoder"] = eps
            out["after_vae_decoder"] = jnp.clip(dec_rgb, -1.0, 1.0)
            feats.append(jax.lax.stop_gradient(dec_rgb))  # s0 detached (ldm_diffusers.py:197)

        # taps arrive [idx5@H/32, idx8@H/16, idx11@H/8]; projection order is
        # largest-resolution first -> reverse (feature_extractor.py:371-385)
        feats.extend(reversed(taps))

        proj_params = (
            variables["ema"]["projections"] if ema_forward else params["projections"]
        )
        proj_apply = lambda p, f: self.projections.apply({"params": p}, f)
        if self.cfg.remat and train:
            proj_apply = jax.checkpoint(proj_apply)
        out["output_features"] = proj_apply(proj_params, feats)
        return out

    # -------------------------------------------------- sliding-window pass
    def slide_windows(self, h: int, w: int) -> Tuple[Tuple[int, int, int, int], ...]:
        """(y1,y2,x1,x2) crops covering (h,w) at half-crop stride — for
        512x1024 exactly the reference's fixed list
        ((0,512,0,512),(0,512,256,768),(0,512,512,1024)),
        ``feature_extractor.py:75``."""
        ch, cw = self.cfg.crop_size
        ys = sorted({min(y, h - ch) for y in range(0, max(h - ch, 0) + 1, max(ch // 2, 1))})
        xs = sorted({min(x, w - cw) for x in range(0, max(w - cw, 0) + 1, max(cw // 2, 1))})
        return tuple((y, y + ch, x, x + cw) for y in ys for x in xs)

    def slide_backbone_forward(
        self, variables: Dict[str, Any], images: jax.Array, **kw
    ) -> Dict[str, Any]:
        """Sliding-window backbone: batch the fixed crops through ONE forward
        and stitch per-scale features with count-normalization (reference
        ``slide_forward``, ``feature_extractor.py:199-278`` — there a
        sequential Python loop; here the crops ride the batch axis, so under
        a mesh they also ride the data axis).

        Differentiable, hence usable for ``slide_training``.  Like the
        reference's slide path it exposes only ``output_features`` (no
        decoder outputs — per-crop latents don't stitch)."""
        import os

        assert not self.cfg.input_channel_plus, (
            "slide path does not compose with mask_diff conv_in surgery"
        )
        b, h, w, _ = images.shape
        windows = kw.pop("windows", None) or self.slide_windows(h, w)

        # TPU layout note: XLA's depthwise convs put the batch in the
        # sublanes (8 rows), so backbone throughput peaks at batch
        # multiples of 8 (measured: bs8 22.5 vs bs3 ~10 crops/s).
        # 'batch' major runs ONE backbone call at batch B*n_win (best for
        # small B, and the only mesh-shardable form); 'window' major runs
        # n_win sequential calls at batch B (full sublane fill at B=8,
        # and ~n_win x less peak activation memory).  'auto' follows the
        # measured v5e table (r4, same-session): batch-1 calls are the
        # fastest sub-8 shape (16.99 crops/s vs batch-3's ~10.3), so
        # b==1 goes window-major (slide bs1: 18.18 with the tiled fused
        # head vs 10.30 batch-major pre-tiling);
        # b==2 measured a wash (10.16 vs 10.15); larger b goes
        # window-major (batching the windows would overflow a sublane
        # group — and batch-12 OOMs at compile).
        major = os.environ.get("MADM_SLIDE_MAJOR", "auto")
        if major == "auto":
            major = "window" if (b == 1 or b * len(windows) > 8) else "batch"

        names_strides = tuple(zip(self.cfg.out_features, self._strides()))

        if major == "window":
            # interleaved stitch: each window's features are accumulated
            # into the canvases right after its backbone call, so window
            # k's full-resolution feature maps (s0 is stride 1!) are dead
            # before window k+1's backbone runs — peak feature memory is
            # one window's worth plus the canvases, not n_win windows'
            # (the stash-then-stitch form OOM'd slide image-batch 8)
            def per_win_iter():
                for wi, (y1, y2, x1, x2) in enumerate(windows):
                    kw_w = kw
                    if kw.get("latent_noise_rng") is not None:
                        # each window crop draws independent latent noise,
                        # matching the batch-major path where every crop is
                        # a distinct batch row (advisor r4: reusing one key
                        # gave all windows identical noise)
                        kw_w = dict(kw)
                        kw_w["latent_noise_rng"] = jax.random.fold_in(
                            kw["latent_noise_rng"], wi
                        )
                    yield (y1, y2, x1, x2), self.backbone_forward(
                        variables, images[:, y1:y2, x1:x2], **kw_w
                    )["output_features"]

            per_win_iter = per_win_iter()
        else:
            crops = jnp.concatenate(
                [images[:, y1:y2, x1:x2] for (y1, y2, x1, x2) in windows],
                axis=0,
            )
            if kw.get("timesteps") is not None:
                # per-image timesteps ride along to every window crop
                # (eval_with_noise through the slide path, mtmadise.py:681-682)
                kw["timesteps"] = jnp.tile(kw["timesteps"], len(windows))
            feats = self.backbone_forward(
                variables, crops, **kw
            )["output_features"]
            per_win_iter = (
                (win, {name: f[wi * b:(wi + 1) * b] for name, f in feats.items()})
                for wi, win in enumerate(windows)
            )

        canvases: Dict[str, jax.Array] = {}
        # the overlap-count canvas is data-independent (windows are
        # static) — build it in numpy at trace time and fold the
        # divide into one broadcast multiply by its reciprocal (exact:
        # counts are powers of two for the 1/2-overlap grid; feature
        # values are unconstrained so / vs * rcp is the same rounding)
        counts = {
            name: np.zeros((1, h // stride, w // stride, 1), np.float32)
            for name, stride in names_strides
        }
        for (y1, y2, x1, x2), feats_w in per_win_iter:
            for name, stride in names_strides:
                fy1, fy2 = y1 // stride, y2 // stride
                fx1, fx2 = x1 // stride, x2 // stride
                if name not in canvases:
                    canvases[name] = jnp.zeros(
                        (b, h // stride, w // stride, feats_w[name].shape[-1]),
                        feats_w[name].dtype,
                    )
                canvases[name] = canvases[name].at[:, fy1:fy2, fx1:fx2].add(
                    feats_w[name]
                )
                counts[name][:, fy1:fy2, fx1:fx2] += 1.0
        stitched = {
            name: canvases[name]
            * jnp.asarray(1.0 / counts[name], canvases[name].dtype)
            for name, _ in names_strides
        }
        return {"output_features": stitched}

    # --------------------------------------------------------------- head
    def head_forward(
        self,
        variables: Dict[str, Any],
        features: Dict[str, jax.Array],
        *,
        ema_forward: bool = False,
        train: bool = False,
        dropout_rng: Optional[jax.Array] = None,
        update_bn: bool = False,
        use_sec_modal: bool = False,
        return_pre_seg: bool = False,
        cross_attention_feat: Optional[jax.Array] = None,
    ):
        """DAFormer head; returns logits [B, h, w, C] (+ new BN stats if
        ``update_bn``).  ``use_sec_modal`` routes to the separate target
        head when ``sem_seg_head_sec_modal`` is configured (cmdise.py:154-157);
        ``cross_attention_feat`` feeds the ``concat_attention_to_conv_seg``
        slot (daformer_head.py:677-688)."""
        sec = use_sec_modal and self.cfg.sem_seg_head_sec_modal
        if ema_forward:
            p = variables["ema"]["head"]
            bn = variables["state"]["ema_head_bn"]
        elif sec:
            p = variables["params"]["head_sec"]
            bn = variables["state"]["head_sec_bn"]
        else:
            p = variables["params"]["head"]
            bn = variables["state"]["head_bn"]
        var_in = {"params": p, "batch_stats": bn}
        rngs = {"dropout": dropout_rng} if (train and dropout_rng is not None) else {}
        if update_bn and train:
            def apply_fn(v, f, att):
                logits, mut = self.head.apply(
                    v, f, train=True, rngs=rngs, mutable=["batch_stats"],
                    cross_attention_feat=att,
                )
                return logits, mut["batch_stats"]

            if self.cfg.remat:
                # outer remat drops the embeds/concat from the global
                # backward's saved set; the inner per-branch remat (ASPPWrapper)
                # chunks the recomputed backward's working set
                apply_fn = jax.checkpoint(apply_fn)
            return apply_fn(var_in, features, cross_attention_feat)
        if train:
            # train-mode BN (normalize by batch stats) without persisting the
            # running-stat update — used by teacher/aux passes
            logits, _ = self.head.apply(
                var_in, features, train=True, rngs=rngs, mutable=["batch_stats"],
                cross_attention_feat=cross_attention_feat,
            )
            return logits
        logits = self.head.apply(
            var_in, features, train=train, rngs=rngs,
            return_pre_seg=return_pre_seg,
            cross_attention_feat=cross_attention_feat,
        )
        return logits

    # ----------------------------------------------------------- eval pass
    def eval_forward(
        self,
        variables: Dict[str, Any],
        images: jax.Array,  # [B, H, W, 3] in [0,1], H/W already sized
        lora_name: Optional[str] = None,
        eval_with_noise: Optional[int] = None,
    ) -> jax.Array:
        """Single-pass eval: backbone('others') -> head -> upsample to input.

        (reference ``mtmadise.py:657-691``; ``eval_with_noise`` feeds a fixed
        noise timestep at test time, ``mtmadise.py:681-682``.)
        Returns logits [B, H, W, C]."""
        timesteps = (
            None if eval_with_noise is None
            else jnp.full((images.shape[0],), eval_with_noise, jnp.int32)
        )
        out = self.backbone_forward(
            variables, images, input_modal="others", lora_name=lora_name,
            timesteps=timesteps,
            modality_mask=self.modality_mask(images, self.cfg.target_modality),
            capture_attention=self.cfg.concat_attention_to_conv_seg,
        )
        logits = self.head_forward(
            variables, out["output_features"], use_sec_modal=True,
            cross_attention_feat=out.get("cross_attention_feat"),
        )
        logits = resize_bilinear(logits.astype(jnp.float32), images.shape[1:3])
        return logits

    def _eval_head_mode(self, image_shape) -> str:
        """Static choice of the eval head implementation:

        - 'argmax' (default on TPU): module head up to the bottleneck, then
          the Pallas conv_seg+argmax kernel — keeps XLA's batch-in-sublanes
          depthwise-conv layout (fastest at batch 8) while skipping the
          lane-padded logits tensor and its separate argmax pass.
        - 'full' (``MADM_FUSED_HEAD=full``): the fully fused head
          (``ops.aspp.fused_head_forward``) — reads the concat once per
          branch via the Pallas depthwise kernel; wins at batch 1 where
          XLA's depthwise layout wastes 7/8 sublanes.
        - 'aspp' (default on TPU, ``MADM_FUSED_HEAD=aspp``): module embeds +
          the ``ops.aspp.aspp_fused`` kernel — the whole sep-ASPP fuse layer
          in one Pallas pass (the 1024-ch embed concat, its layout copy and
          the three 4.3 GB depthwise outputs never reach HBM), then the XLA
          bottleneck+conv_seg convolution fusion and ``argmax_classes``.
          Measured r3 on v5e bs 8: 20.4 crops/s vs 17.4 ('none').
        - 'none' (``MADM_FUSED_HEAD=0``): plain argmax(eval_forward) — the
          XLA module head end to end.
        Round-2 measurements (16.9 'none' > 15.9 'argmax' > 15.5/'OOM'
        'full') predate ``aspp_fused``; 'argmax'/'full' remain opt-in
        experiments.
        """
        import os

        knob = os.environ.get("MADM_FUSED_HEAD", "auto")
        if knob == "0" or jax.default_backend() == "cpu":
            return "none"
        cfg = self.cfg
        shapes_ok = (
            self.head.fusion == "aspp"
            and not self.head.final_fuse_vae_decoder_feat
            and not self.head.concat_attention_to_conv_seg
            and len(cfg.in_keys) == 4
            and cfg.in_keys[0] == "s0"
            and image_shape[1] % 16 == 0
            and image_shape[2] % 128 == 0
        )
        if not shapes_ok:
            return "none"
        if knob in ("auto", "aspp"):
            # aspp_fused constraints: 4x256-ch embeds, dilations 1/6/12/18.
            # Widths > 512 (the slide path's stitched features) run the
            # same kernel over overlapping column strips
            # (ops.aspp.aspp_fused_tiled) — the single-pass VMEM footprint
            # scales with width (172MB at W=1024 vs the 128MB budget,
            # measured r4 compile OOM).
            if (
                tuple(self.head.dilations) == (1, 6, 12, 18)
                and self.head.embed_dims == 256
                and cfg.head_channels == 256
                and image_shape[1] % 8 == 0
            ):
                return "aspp"
            return "none"
        # the opt-in 'full'/'argmax' kernels are untiled: full-width rings
        if image_shape[2] > 512:
            return "none"
        if knob in ("1", "full") and (
            tuple(self.head.dilations) == (1, 6, 12, 18)
            and self.head.embed_dims == 256
            and cfg.head_channels == 256
        ):
            return "full"
        return "argmax"

    def eval_forward_ids(
        self,
        variables: Dict[str, Any],
        images: jax.Array,
        lora_name: Optional[str] = None,
        eval_with_noise: Optional[int] = None,
    ) -> jax.Array:
        """Eval argmax ids [B, H, W] — the TPU inference hot path.

        Where applicable this runs the fused Pallas head
        (``ops.aspp.fused_head_forward``): one read of the embeds for all
        three dilated depthwise convs, no 1024-ch concat materialization,
        and conv_seg+argmax fused so the lane-padded logits tensor never
        reaches HBM.  Falls back to ``eval_forward`` + argmax otherwise
        (numerically: same argmax, validated in tests)."""
        timesteps = (
            None if eval_with_noise is None
            else jnp.full((images.shape[0],), eval_with_noise, jnp.int32)
        )
        bb_out = self.backbone_forward(
            variables, images, input_modal="others", lora_name=lora_name,
            timesteps=timesteps,
            modality_mask=self.modality_mask(images, self.cfg.target_modality),
            capture_attention=self.cfg.concat_attention_to_conv_seg,
        )
        return self.head_ids(
            variables, bb_out["output_features"], images.shape,
            cross_attention_feat=bb_out.get("cross_attention_feat"),
        )

    def head_ids(
        self,
        variables: Dict[str, Any],
        feats: Dict[str, jax.Array],
        image_shape,
        cross_attention_feat: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Head -> argmax ids [B, H, W], via the fused Pallas head where the
        static shape/config checks allow (shared by the single-crop and the
        sliding-window eval paths)."""
        import os

        if self.cfg.concat_attention_to_conv_seg:
            # fused-head kernels don't model the concat slot; plain path
            logits = self.head_forward(
                variables, feats, use_sec_modal=True,
                cross_attention_feat=cross_attention_feat,
            )
            return self._ids_from_logits(logits, image_shape[1:3])
        mode = self._eval_head_mode(image_shape)
        sec = self.cfg.sem_seg_head_sec_modal
        if mode != "none":
            from ..ops import aspp

            p = variables["params"]["head_sec" if sec else "head"]
            bn = variables["state"]["head_sec_bn" if sec else "head_bn"]
            if mode == "aspp":
                head_fn = lambda f: aspp.aspp_head_forward(
                    p, bn, f, self.cfg.in_keys, self.cfg.num_classes,
                    compute_dtype=self.cfg.compute_dtype,
                )
                # the head's full-res intermediates (4x256-ch embeds + the
                # 1024-ch fused-branch concat) scale with B*H*W — 8.6 GB
                # each at the slide path's stitched 512x1024 batch 8, the
                # measured r4 stitched-head OOM.  Chunk the batch so each
                # call stays bounded; chunks are per-image independent
                # (argmax ids concat exactly).  Wide (stitched) inputs
                # default to ONE image per head call: alongside the slide
                # path's backbone + canvases, 4-image chunks still failed
                # the bs8 512x1024 compile while 1-image chunks fit and
                # measured 21.3 crops/s (r4, vs 18.2 at image-bs 1).
                pix = int(image_shape[1]) * int(image_shape[2])
                budget_env = os.environ.get("MADM_HEAD_PIX_BUDGET")
                if budget_env is not None:
                    chunk = max(1, int(budget_env) // pix)
                elif int(image_shape[2]) > 512:
                    chunk = 1
                else:
                    chunk = max(1, (8 * 512 * 512) // pix)
                return _chunk_over_batch(head_fn, feats, chunk)
            if mode == "full":
                return aspp.fused_head_forward(
                    p, bn, feats, self.cfg.in_keys, self.cfg.num_classes,
                    compute_dtype=self.cfg.compute_dtype,
                )
            pre = self.head_forward(
                variables, feats, use_sec_modal=True, return_pre_seg=True
            )
            return aspp.matmul_argmax(
                pre.astype(self.cfg.compute_dtype),
                p["conv_seg"]["kernel"][0, 0], p["conv_seg"]["bias"],
            )
        logits = self.head_forward(variables, feats, use_sec_modal=True)
        return self._ids_from_logits(logits, image_shape[1:3])

    @staticmethod
    def _ids_from_logits(logits: jax.Array, hw) -> jax.Array:
        """argmax ids at image resolution.  When the head already runs at
        image resolution (s0 stride-1 configs) the bilinear resize is an
        identity — skip it AND the fp32 cast (a cast permutes no ordering,
        so bf16 argmax is bit-identical to fp32-cast argmax)."""
        if logits.shape[1:3] != tuple(hw):
            logits = resize_bilinear(logits.astype(jnp.float32), hw)
        return argmax_classes(logits)
