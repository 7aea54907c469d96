"""The MADM UDA train step as one jitted program.

Reproduces the reference's training forward (``modeling/meta_arch/
mtmadise.py:177-656`` with the shipped config flags: enable_mixup, DACS
jitter/blur, rev-noise pseudo-label denoising, vae_decoder_loss 'st',
reg_uncertain, pseudo_threshold 0.968) as a single pure function:

    state, metrics = train_step(state, batch, rng)

Design notes (TPU-first):

- All passes (source / mixed / teacher) live in ONE jit so XLA overlaps and
  fuses; the DACS mix, palette rendering and pseudo-labeling run on device.
- EMA update is a tree-map at the top of the step (``cmdise.py:337-349``);
  at step 0 alpha=0 making it a no-op copy, matching the reference's skip.
- The rev-noise schedule (``mtmadise.py:319-325``) is computed with traced
  step arithmetic — no retrace across iterations.
- The reference's ``add_zero_gead_on_unused_lora`` DDP workaround
  (``mtmadise.py:149-157``) is unnecessary: unused adapters get exact zero
  gradients from jax.grad.
- Teacher batch-norm runs in batch-stats mode like torch train() and its
  running stats update the EMA head's copy (persisted; unused at eval, kept
  for checkpoint parity).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models.madm import MADM, MADMConfig
from ..ops import dacs, palette
from . import criterion
from .ema import ema_alpha, student_subtree, update_ema
from .optimizer import merge_trainable, split_trainable


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyper-parameters (…depth_11.py / common/train.py)."""

    max_iter: int = 10000
    ema_alpha: float = 0.999
    pseudo_threshold: float = 0.968
    color_jitter_strength: float = 0.2
    color_jitter_probability: float = 0.2
    blur: bool = True
    enable_mixup: bool = True
    # rev-noise pseudo-label denoising (mtmadise.py:319-325)
    rev_noise_sup: bool = True
    rev_noise_end_iter: int = 5000
    rev_noise_gradually: bool = True
    denoise_timestep_range: Tuple[int, int] = (60, 61)
    # vae decoder palette regression
    vae_decoder_loss: str = "st"
    vae_decoder_loss_type: str = "L1"
    vae_decoder_loss_weight: Tuple[float, float] = (1.0, 1.0)
    reg_uncertain: bool = True
    # pl_crop (off in shipped configs)
    pl_crop: bool = False
    psweight_ignore_top: int = 15
    # pseudo-weight scope: 'sample' (default) = per-sample confident
    # fraction — at the reference's shipped local batch of 1 this equals its
    # per-rank scalar (cmdise.py:498-502) on ANY device count, so it is the
    # parity-preserving default; 'batch' = one global scalar over the whole
    # (GSPMD-global) batch, the documented global-mean variant.
    pseudo_weight_scope: str = "sample"
    # masked-image consistency (MIC) — CE variant (cmdise.py:181-183,
    # mtmadise.py:404-420,471-476); off in shipped configs
    mic: bool = False
    mask_ratio: float = 0.7
    # MIC regression variant: masked decoder latent vs PL palette latent
    # (mtmadise.py:477-488); 0 = off
    mic_reg: float = 0.0
    mic_reg_wo_pl_val: bool = False
    # texture-removed consistency: the MIC loss slot fed by a
    # strong-transformed edge map ('target_second_modality_pha') with no
    # masking — the reference's live remove_texture branch
    # (cmdise.py:573-576,598-603)
    remove_texture: bool = False
    # denoise supervision: student-at-noise-t decoder latent vs PL palette
    # latent (mtmadise.py:425-441,489-499); 0 = off
    denoise_supervise: float = 0.0
    # feature-distance regularization vs the frozen init UNet
    # (mtmadise.py:228-238,533-547); 0 = off; requires
    # ``add_feature_distance_baseline`` having stored the init copies
    fd: float = 0.0
    # feature distance on up-block cross-attention maps instead of taps
    # (reference --FD_attention, main.py:545-548 + mtmadise.py:258-259,
    # 533-546 — its ``atte_controller`` producer is never defined; here the
    # maps come from the working attention-feature taps); 0 = off
    fd_attention: float = 0.0
    # teacher-student consistency on target attention maps.  The reference
    # only *reads* this flag (cmdise.py:178) and never consumes it; here it
    # is a working loss: MSE between the student's and the EMA teacher's
    # res-averaged cross-attention maps on the target image
    target_attention_loss: bool = False
    # noise regularization (mtmadise.py:446-463,522-528): student decoder
    # latent on strong-augmented target vs teacher-at-noise-t PL palette
    # latent.  NOTE: dead code in the reference — its criterion never
    # consumes the 'noise_reg_loss' key (criterion.py:155-254); here it is
    # a working loss.  0 = off (matching the shipped configs AND the
    # reference's effective behavior)
    noise_reg: float = 0.0
    # prompt ablations (cmdise.py:179-191,504-515,555-605): an extra student
    # pass with a token-masked or gaussian-perturbed prompt feeds the same
    # masked-consistency loss slot as MIC (mutually exclusive in the
    # reference); prompt_confidence scales the pseudo-weight by teacher
    # agreement with a random-prompt pass
    mask_prompt_ratio: float = 0.0
    detach_mask_prompt: bool = False
    prompt_perturbation: float = 0.0
    prompt_confidence: Optional[float] = None
    rand_prompt_scale: float = 0.5
    # student-timestep shift for denoise_supervise (cmdise.py:584)
    denoise_interval: int = 0
    # two-stage source mixing with stage-1 generated 'pl data'
    # (cmdise.py:392-408): None | 'only_pl_data' | 'linear_mix' |
    # 'gradual_linear_mix' | 'anti_gradual_linear_mix' | 'random_choice'
    merge_with_pl_data: Optional[str] = None
    pl_merge_val: float = 0.5


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    ema: Any
    state: Any  # {'head_bn', 'ema_head_bn'}
    consts: Any
    opt_state: Any


def add_feature_distance_baseline(state: "TrainState") -> "TrainState":
    """Snapshot the init UNet + prompt as the fd regularization target
    (replaces the reference's ``ori_unet = deepcopy(...)``, cmdise.py:332-335)."""
    consts = dict(state.consts)
    consts["ori_unet"] = jax.tree.map(jnp.copy, state.params["unet"])
    consts["ori_prompt"] = jax.tree.map(jnp.copy, state.params["prompt"])
    return state.replace(consts=consts)


def make_train_state(model: MADM, variables: Dict[str, Any], tx) -> TrainState:
    trainable, _ = split_trainable(
        variables, model.cfg.finetune_unet,
        learnable_clip=model.cfg.clip_state == "learnable_clip",
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        ema=variables["ema"],
        state=variables["state"],
        consts=variables["consts"],
        opt_state=tx.init(trainable),
    )


def rev_noise_timestep(rng: jax.Array, step: jax.Array, tc: TrainConfig) -> jax.Array:
    """Scalar teacher-input timestep for this step (0 past end_iter).

    (reference ``mtmadise.py:319-325``: t ~ randint(range) then scaled by
    (1 - step/end_iter) when decaying gradually.)"""
    if not tc.rev_noise_sup:
        return jnp.zeros((), jnp.int32)
    lo, hi = tc.denoise_timestep_range
    t = jax.random.randint(rng, (), lo, hi + 1)
    if tc.rev_noise_gradually:
        t = (t.astype(jnp.float32) * (1.0 - step / tc.rev_noise_end_iter)).astype(jnp.int32)
    return jnp.where(step <= tc.rev_noise_end_iter, t, 0)


def build_train_config(cfg, mcfg: MADMConfig) -> TrainConfig:
    """TrainConfig from a loaded LazyConfig tree + the model's MADMConfig.

    The UDA knobs live on the model node (reference surface — ``cmdise.py``/
    ``mtmadise.py`` ctor args, so ``model.rev_noise_sup=True`` dot-overrides
    port verbatim); an optional ``cfg.uda`` namespace overrides them
    (back-compat with earlier TPU configs).  Training-loop values come from
    ``cfg.train``.
    """
    uda = dict(cfg.get("uda", {}) or {})

    def knob(name):
        if name in uda and uda[name] is not None:
            return uda[name]
        return getattr(mcfg, name)

    t_range = knob("denoise_timestep_range") or (0, 0)
    vdl_w = tuple(list(knob("vae_decoder_loss_weight")) + [1.0])[:2]
    return TrainConfig(
        max_iter=cfg.train.max_iter,
        ema_alpha=knob("ema_alpha"),
        pseudo_threshold=knob("pseudo_threshold"),
        blur=knob("blur"),
        color_jitter_strength=knob("color_jitter_strength"),
        color_jitter_probability=knob("color_jitter_probability"),
        enable_mixup=knob("enable_mixup"),
        rev_noise_sup=knob("rev_noise_sup"),
        rev_noise_end_iter=knob("rev_noise_end_iter") or cfg.train.max_iter,
        rev_noise_gradually=knob("rev_noise_gradually"),
        denoise_timestep_range=tuple(t_range),
        vae_decoder_loss=(uda.get("vae_decoder_loss")
                          or mcfg.vae_decoder_loss or ""),
        vae_decoder_loss_type=knob("vae_decoder_loss_type"),
        vae_decoder_loss_weight=vdl_w,
        reg_uncertain=knob("reg_uncertain"),
        pl_crop=knob("pl_crop"),
        psweight_ignore_top=knob("psweight_ignore_top"),
        mic=knob("mic"),
        mask_ratio=knob("mask_ratio"),
        mic_reg=float(knob("mic_reg")),
        mic_reg_wo_pl_val=knob("mic_reg_wo_pl_val"),
        remove_texture=knob("remove_texture"),
        denoise_supervise=float(knob("denoise_supervise")),
        fd=float(knob("fd")),
        fd_attention=float(knob("fd_attention") or 0.0),
        target_attention_loss=bool(knob("target_attention_loss")),
        noise_reg=float(knob("noise_reg") or 0.0),
        pseudo_weight_scope=knob("pseudo_weight_scope"),
        mask_prompt_ratio=float(knob("mask_prompt_ratio") or 0.0),
        detach_mask_prompt=knob("detach_mask_prompt"),
        prompt_perturbation=float(knob("prompt_perturbation") or 0.0),
        prompt_confidence=knob("prompt_confidence"),
        rand_prompt_scale=knob("rand_prompt_scale"),
        denoise_interval=int(knob("denoise_interval") or 0),
        merge_with_pl_data=knob("merge_with_pl_data"),
        pl_merge_val=float(knob("pl_merge_val") or 0.5),
    )


def make_train_step(model: MADM, tc: TrainConfig, tx):
    """Build the jit-able train step for ``model``.

    batch: {'source_rgb': [B,H,W,3] 0..1, 'source_label': [B,H,W] int32,
            'target_second_modality': [B,H,W,3] 0..1}
    """
    mcfg = model.cfg
    # the reference allows at most one of {masked_prompt, perturbation, MIC}
    # (cmdise.py:184)
    # (remove_texture shares the same consistency-loss slot, cmdise.py:567-576)
    assert (bool(tc.mask_prompt_ratio) + bool(tc.prompt_perturbation)
            + bool(tc.mic) + bool(tc.remove_texture)) <= 1, (
        "mask_prompt/prompt_perturbation/mic/remove_texture are exclusive")
    if mcfg.concat_attention_to_conv_seg:
        # the concat slot is wired through the source/mixed/teacher passes;
        # the aux-pass ablations never combine with it in the reference
        assert not (tc.mic or tc.mask_prompt_ratio or tc.prompt_perturbation
                    or tc.noise_reg or tc.prompt_confidence is not None), (
            "concat_attention_to_conv_seg does not compose with the aux-pass "
            "ablations (mic/mask_prompt/prompt_perturbation/noise_reg/"
            "prompt_confidence) — their extra head calls are not wired for "
            "the concat slot"
        )
    if mcfg.slide_training and (
        tc.vae_decoder_loss or tc.mic_reg or tc.denoise_supervise
        or tc.noise_reg or tc.reg_uncertain
    ):
        # the slide path exposes no decoder outputs (same limitation as the
        # reference's slide_forward, feature_extractor.py:199-278 — its
        # return dict lacks 'before_vae_decoder' and the decoder losses
        # would KeyError); disable them explicitly for slide_training
        raise ValueError(
            "slide_training is incompatible with decoder-output losses "
            "(vae_decoder_loss/mic_reg/denoise_supervise/noise_reg/"
            "reg_uncertain) — set them off, as the reference requires"
        )

    def backbone(variables, images, **kw):
        # slide_training: any input larger than crop_size goes through the
        # batched sliding-window pass (train-time crops stay single-pass)
        if mcfg.slide_training and images.shape[1:3] != tuple(mcfg.crop_size):
            return model.slide_backbone_forward(variables, images, **kw)
        return model.backbone_forward(variables, images, **kw)

    num_classes = mcfg.num_classes
    # decoder color-regression targets may use the 'discrete' palette
    # (mtmadise.py:253,344,397,462); the reg_uncertain distance table is
    # ALWAYS the train palette (mtmadise.py:92-94)
    table = jnp.asarray(
        palette.reg_target_table(mcfg.train_palette, mcfg.reg_target_palette)
    )
    class_table = jnp.asarray(
        palette.palette_table(mcfg.train_palette)[:num_classes]
    )
    modality = mcfg.target_modality
    lora_names = set(model.lora_specs)
    src_lora = "default" if "default" in lora_names else None
    tgt_lora = modality if modality in lora_names else None

    def encode_palette(variables, labels):
        """labels -> palette RGB [-1,1] -> frozen VAE latent (stop-grad)."""
        rgb, valid = palette.label_to_rgb(labels, table)
        lat, _ = model.vae_encoder.apply(
            {"params": variables["params"]["vae_encoder"]}, rgb
        )
        return jax.lax.stop_gradient(lat), valid

    def step_fn(ts: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        step = ts.step
        (k_mask, k_jitter, k_revt, k_drop1, k_drop2, k_drop3, k_micjit,
         k_micmask, k_micdrop, k_dst, k_nrjit, k_nrt, k_aln,
         k_pm, k_rp) = jax.random.split(rng, 15)

        # ---------------- EMA teacher update (cmdise.py:337-349) ----------
        alpha = ema_alpha(step.astype(jnp.float32), tc.ema_alpha)
        ema = update_ema(
            ts.ema,
            student_subtree(ts.params, mcfg.same_cond_params,
                            learnable_clip=mcfg.clip_state == "learnable_clip",
                            ema_w_unet=mcfg.ema_w_unet),
            alpha,
        )

        source = batch["source_rgb"]
        target = batch["target_second_modality"]
        gt = batch["source_label"]
        b = source.shape[0]

        if tc.merge_with_pl_data is not None:
            # mix the source image with stage-1 generated pl data
            # (cmdise.py:392-408); modes are static, schedules traced
            pl = batch["source_pl_data"]
            mode = tc.merge_with_pl_data
            if mode == "only_pl_data":
                source = pl
            elif mode == "linear_mix":
                source = (1 - tc.pl_merge_val) * source + tc.pl_merge_val * pl
            elif mode == "gradual_linear_mix":
                v = step.astype(jnp.float32) / tc.max_iter
                source = (1 - v) * source + v * pl
            elif mode == "anti_gradual_linear_mix":
                v = jnp.maximum(
                    0.0, 1.0 - step.astype(jnp.float32) / (tc.max_iter * 0.5)
                )
                source = (1 - v) * source + v * pl
            elif mode == "random_choice":
                take = jax.random.uniform(jax.random.fold_in(rng, 99), ()) > (
                    1 - tc.pl_merge_val
                )
                source = jnp.where(take, pl, source)
            else:
                raise NotImplementedError(mode)

        # ---------------- DACS mix inputs (no grad) -----------------------
        mix_mask = dacs.sample_class_masks(k_mask, gt, num_classes)  # [B,H,W]
        mixed_img = dacs.one_mix(mix_mask[..., None], source, target)
        mixed_img = dacs.strong_transform(
            k_jitter, mixed_img, tc.color_jitter_strength,
            tc.color_jitter_probability, tc.blur,
        )
        mixed_img = jax.lax.stop_gradient(mixed_img)

        t_pl = rev_noise_timestep(k_revt, step.astype(jnp.float32), tc)

        _, frozen = split_trainable(
            {"params": ts.params}, mcfg.finetune_unet,
            learnable_clip=mcfg.clip_state == "learnable_clip",
        )
        base_vars = {
            "params": ts.params, "ema": ema, "state": ts.state, "consts": ts.consts,
        }

        # ------------- teacher pseudo-labels (no grad; outside the grad
        # passes so its activations never enter the backward working set) ---
        tch_out = backbone(
            base_vars, target, input_modal="others", lora_name=tgt_lora,
            ema_forward=True,
            timesteps=jnp.broadcast_to(t_pl, (b,)),
            modality_mask=model.modality_mask(target, modality),
            capture_attention=(
                tc.target_attention_loss or mcfg.concat_attention_to_conv_seg
            ),
        )
        # torch quirk kept: the EMA head is in train() mode during
        # pseudo-labeling, so dropout is active in the teacher too
        ema_logits, ema_bn = model.head_forward(
            base_vars, tch_out["output_features"], ema_forward=True,
            train=True, dropout_rng=k_drop3, update_bn=True,
            cross_attention_feat=tch_out.get("cross_attention_feat"),
        )
        ema_logits = criterion._resize_logits(
            ema_logits.astype(jnp.float32), target.shape[1:3]
        )
        ema_sm = jax.nn.softmax(jax.lax.stop_gradient(ema_logits), axis=-1)
        pseudo_prob = ema_sm.max(axis=-1)
        pseudo_label = ema_sm.argmax(axis=-1).astype(jnp.int32)
        pseudo_val = (pseudo_prob >= tc.pseudo_threshold).mean(axis=(1, 2))
        if tc.pseudo_weight_scope == "batch":
            # one scalar over the whole batch; under GSPMD this mean is
            # global across the data axis — NOT the reference's per-rank
            # scalar (cmdise.py:498-502).  'sample' (the default) matches
            # the reference at its shipped local batch of 1.
            pseudo_weight = jnp.broadcast_to(pseudo_val.mean(), pseudo_prob.shape)
        else:  # 'sample': per-sample confident fraction
            pseudo_weight = jnp.broadcast_to(
                pseudo_val[:, None, None], pseudo_prob.shape
            )
        if tc.prompt_confidence is not None:
            # scale the pseudo weight by the teacher's agreement with a
            # random-prompt teacher pass (cmdise.py:504-515)
            rp_out = backbone(
                base_vars, target, input_modal="others", lora_name=tgt_lora,
                ema_forward=True, prompt_mode="rand_prompt", prompt_rng=k_rp,
                modality_mask=model.modality_mask(target, modality),
            )
            rp_logits = model.head_forward(
                base_vars, rp_out["output_features"], ema_forward=True
            )
            rp_logits = criterion._resize_logits(
                rp_logits.astype(jnp.float32), target.shape[1:3]
            )
            rp_label = jnp.argmax(rp_logits, axis=-1)
            consistent = (pseudo_label == rp_label).mean()
            pseudo_weight = pseudo_weight * consistent
        if tc.pl_crop:
            pseudo_weight = pseudo_weight.at[:, : tc.psweight_ignore_top, :].set(0.0)

        if tc.enable_mixup:
            mixed_lbl = dacs.one_mix(
                mix_mask, gt.astype(jnp.float32), pseudo_label.astype(jnp.float32)
            ).astype(jnp.int32)
            mixed_w = dacs.one_mix(mix_mask, jnp.ones_like(pseudo_weight), pseudo_weight)
        else:
            mixed_lbl, mixed_w = pseudo_label, pseudo_weight

        # reg_uncertain palette-distance PL — vis/metric only in the
        # shipped path (mtmadise.py:327-333)
        if tc.reg_uncertain and mcfg.use_s0:
            dec01 = (tch_out["after_vae_decoder"].astype(jnp.float32) + 1) / 2
            reg_prob, _, _ = palette.palette_distance_pseudo_label(dec01, class_table)
        else:
            reg_prob = jnp.zeros(())

        # palette-rendered targets (frozen VAE; no grad)
        src_gt_lat = src_valid = tgt_gt_lat = tgt_mask = pl_color_lat = None
        if "s" in tc.vae_decoder_loss:
            src_gt_lat, src_valid = encode_palette(base_vars, gt)
        if "t" in tc.vae_decoder_loss:
            tgt_gt_lat, tgt_valid = encode_palette(base_vars, mixed_lbl)
            tgt_mask = tgt_valid * pseudo_weight[..., None]
        if tc.mic_reg or tc.denoise_supervise:
            pl_color_lat, _ = encode_palette(base_vars, pseudo_label)
            pv = pseudo_val.mean()

        # noise-reg target: teacher PL at an extra noise timestep, rendered
        # to palette latent (mtmadise.py:458-463)
        if tc.noise_reg:
            lo, hi = tc.denoise_timestep_range
            t_nr = jax.random.randint(k_nrt, (b,), lo, hi + 1)
            nr_out = backbone(
                base_vars, target, input_modal="others", lora_name=tgt_lora,
                ema_forward=True, timesteps=t_nr,
                modality_mask=model.modality_mask(target, modality),
            )
            nr_logits = model.head_forward(
                base_vars, nr_out["output_features"], ema_forward=True,
            )
            nr_logits = criterion._resize_logits(
                nr_logits.astype(jnp.float32), target.shape[1:3]
            )
            nr_pl = jnp.argmax(nr_logits, axis=-1).astype(jnp.int32)
            nr_color_lat, _ = encode_palette(base_vars, nr_pl)

        # ------------- grad pass 1: source (student, rgb) ------------------
        # gradients are linear: grad(source losses) + grad(mixed losses) ==
        # grad(total); computing them in two value_and_grad calls keeps only
        # one pass's activations live in each backward (memory: 16GB v5e)
        def loss_src(trainable):
            params = merge_trainable(trainable, frozen)
            variables = {**base_vars, "params": params}
            src_out = backbone(
                variables, source, input_modal="rgb", lora_name=src_lora, train=True,
                modality_mask=model.modality_mask(source, "rgb"),
                capture_attention=(
                    bool(tc.fd_attention) or mcfg.concat_attention_to_conv_seg
                ),
            )
            src_logits, bn1 = model.head_forward(
                variables, src_out["output_features"], train=True,
                dropout_rng=k_drop1, update_bn=True,
                cross_attention_feat=src_out.get("cross_attention_feat"),
            )
            losses = {"source_loss": criterion.cross_entropy(src_logits, gt)}
            if tc.fd or tc.fd_attention:
                # one feature_distance slot, fd takes priority — reference
                # mtmadise.py:533-546: taps when fd, up-block cross-attn
                # maps when fd_attention
                ori_params = {**params, "unet": ts.consts["ori_unet"],
                              "prompt": ts.consts["ori_prompt"]}
                ori_out = backbone(
                    {**variables, "params": ori_params}, source,
                    input_modal="rgb", lora_name=None,
                    modality_mask=model.modality_mask(source, "rgb"),
                    capture_attention=bool(tc.fd_attention) and not tc.fd,
                )
                if tc.fd:
                    feats, ori_feats = src_out["unet_taps"], ori_out["unet_taps"]
                else:
                    feats, ori_feats = src_out["up_cross"], ori_out["up_cross"]
                losses["feature_distance_loss"] = criterion.feature_distance_loss(
                    feats,
                    [jax.lax.stop_gradient(t) for t in ori_feats],
                    tc.fd if tc.fd else tc.fd_attention,
                )
            if "s" in tc.vae_decoder_loss:
                losses["vae_decoder_source_loss"] = criterion.vae_decoder_loss(
                    src_out["before_vae_decoder"], src_gt_lat, src_valid,
                    tc.vae_decoder_loss_type, tc.vae_decoder_loss_weight[0],
                )
            return sum(losses.values()), (losses, bn1)

        # ------------- grad pass 2: mixed/target (student, adapter) --------
        def loss_mix(trainable, bn1):
            params = merge_trainable(trainable, frozen)
            var1 = {**base_vars, "params": params,
                    "state": {**ts.state, "head_bn": bn1}}
            mix_out = backbone(
                var1, mixed_img, input_modal="mixed", lora_name=tgt_lora, train=True,
                modality_mask=model.mixed_modality_mask(mix_mask, modality),
                latent_noise_rng=k_aln,
                capture_attention=mcfg.concat_attention_to_conv_seg,
            )
            mix_logits, bn2 = model.head_forward(
                var1, mix_out["output_features"], train=True,
                dropout_rng=k_drop2, update_bn=True, use_sec_modal=True,
                cross_attention_feat=mix_out.get("cross_attention_feat"),
            )
            losses = {
                "target_loss": criterion.cross_entropy(
                    mix_logits, mixed_lbl, pixel_weight=mixed_w
                ),
            }
            if tc.mic or tc.mic_reg:
                masked_img = dacs.strong_transform(
                    k_micjit, target, tc.color_jitter_strength,
                    tc.color_jitter_probability, tc.blur,
                )
                masked_img = dacs.mask_image(k_micmask, masked_img, tc.mask_ratio)
                masked_img = jax.lax.stop_gradient(masked_img)
                mic_out = backbone(
                    var1, masked_img, input_modal="others", lora_name=tgt_lora,
                    train=True,
                    modality_mask=model.modality_mask(target, modality),
                )
                if tc.mic:
                    # BN running stats chain source -> mixed -> masked like
                    # the reference's sequential train() forwards
                    bn_key = (
                        "head_sec_bn" if mcfg.sem_seg_head_sec_modal else "head_bn"
                    )
                    var2 = {**var1, "state": {**ts.state, bn_key: bn2}}
                    mic_logits, bn2 = model.head_forward(
                        var2, mic_out["output_features"], train=True,
                        dropout_rng=k_micdrop, update_bn=True, use_sec_modal=True,
                    )
                    losses["masked_prompt_consistency_loss"] = criterion.cross_entropy(
                        mic_logits, pseudo_label, pixel_weight=pseudo_weight
                    )
                if tc.mic_reg:
                    losses["mic_vae_decoder_loss"] = criterion.denoise_consistency_loss(
                        mic_out["before_vae_decoder"], pl_color_lat,
                        1.0 if tc.mic_reg_wo_pl_val else pv,
                        tc.vae_decoder_loss_type, tc.mic_reg,
                    )
            if tc.remove_texture:
                # consistency on the texture-removed edge map: strong
                # transform only, no mask_image (cmdise.py:573-576); same
                # loss slot as MIC (cmdise.py:598-603)
                rt_img = dacs.strong_transform(
                    k_micjit, batch["target_second_modality_pha"],
                    tc.color_jitter_strength, tc.color_jitter_probability,
                    tc.blur,
                )
                rt_img = jax.lax.stop_gradient(rt_img)
                rt_out = backbone(
                    var1, rt_img, input_modal="others", lora_name=tgt_lora,
                    train=True,
                    modality_mask=model.modality_mask(target, modality),
                )
                rt_logits = model.head_forward(
                    var1, rt_out["output_features"], train=True,
                    dropout_rng=k_micdrop, use_sec_modal=True,
                )
                losses["masked_prompt_consistency_loss"] = criterion.cross_entropy(
                    rt_logits, pseudo_label, pixel_weight=pseudo_weight
                )
            if tc.mask_prompt_ratio:
                mp_out = backbone(
                    var1, target, input_modal="others", lora_name=tgt_lora,
                    train=True, prompt_mode="masked_prompt", prompt_rng=k_pm,
                    modality_mask=model.modality_mask(target, modality),
                )
                mp_logits = model.head_forward(
                    var1, mp_out["output_features"], train=True,
                    dropout_rng=k_micdrop, use_sec_modal=True,
                )
                losses["masked_prompt_consistency_loss"] = criterion.cross_entropy(
                    mp_logits, pseudo_label, pixel_weight=pseudo_weight
                )
            elif tc.prompt_perturbation:
                # the reference runs the backbone under no_grad for this
                # pass (ldm_base.py:920-924); only the head trains
                pp_out = backbone(
                    var1, target, input_modal="others", lora_name=tgt_lora,
                    train=True, prompt_mode="prompt_perturbation",
                    prompt_rng=k_pm,
                    modality_mask=model.modality_mask(target, modality),
                )
                pp_feats = jax.lax.stop_gradient(pp_out["output_features"])
                pp_logits = model.head_forward(
                    var1, pp_feats, train=True, dropout_rng=k_micdrop,
                    use_sec_modal=True,
                )
                losses["masked_prompt_consistency_loss"] = criterion.cross_entropy(
                    pp_logits, pseudo_label, pixel_weight=pseudo_weight
                )
            if tc.target_attention_loss:
                # student cross-attn maps on the raw target vs the EMA
                # teacher's (captured in the pseudo-label pass above);
                # the reference reads the flag (cmdise.py:178) but ships no
                # consumer — this is the working consistency loss
                tal_out = backbone(
                    var1, target, input_modal="others", lora_name=tgt_lora,
                    train=True, capture_attention=True,
                    modality_mask=model.modality_mask(target, modality),
                )
                s_maps = list(tal_out["attention_features"].values())
                t_maps = [
                    jax.lax.stop_gradient(v)
                    for v in tch_out["attention_features"].values()
                ]
                losses["target_attention_loss"] = criterion.feature_distance_loss(
                    s_maps, t_maps, 1.0
                )
            if tc.denoise_supervise:
                lo, hi = tc.denoise_timestep_range
                t_ds = jax.random.randint(k_dst, (b,), lo, hi + 1) + tc.denoise_interval
                ds_out = backbone(
                    var1, target, input_modal="others", lora_name=tgt_lora,
                    timesteps=t_ds, train=True,
                    modality_mask=model.modality_mask(target, modality),
                )
                losses["denoise_consistency_loss"] = criterion.denoise_consistency_loss(
                    ds_out["before_vae_decoder"], pl_color_lat, pv,
                    tc.vae_decoder_loss_type, tc.denoise_supervise,
                )
            if "t" in tc.vae_decoder_loss:
                losses["vae_decoder_target_loss"] = criterion.vae_decoder_loss(
                    mix_out["before_vae_decoder"], tgt_gt_lat, tgt_mask,
                    tc.vae_decoder_loss_type, tc.vae_decoder_loss_weight[1],
                )
            if tc.noise_reg:
                aug_target = jax.lax.stop_gradient(dacs.strong_transform(
                    k_nrjit, target, tc.color_jitter_strength,
                    tc.color_jitter_probability, tc.blur,
                ))
                nr_student = backbone(
                    var1, aug_target, input_modal="others", lora_name=tgt_lora,
                    train=True,
                    modality_mask=model.modality_mask(target, modality),
                )
                losses["noise_reg_loss"] = criterion.denoise_consistency_loss(
                    nr_student["before_vae_decoder"], nr_color_lat, 1.0,
                    tc.vae_decoder_loss_type, tc.noise_reg,
                )
            return sum(losses.values()), (losses, bn2)

        trainable, _ = split_trainable(
            {"params": ts.params}, mcfg.finetune_unet,
            learnable_clip=mcfg.clip_state == "learnable_clip",
        )
        (_, (losses_src, bn1)), grads_src = jax.value_and_grad(
            loss_src, has_aux=True
        )(trainable)
        (_, (losses_mix, bn2)), grads_mix = jax.value_and_grad(
            loss_mix, has_aux=True
        )(trainable, bn1)
        grads = jax.tree.map(jnp.add, grads_src, grads_mix)

        losses = {**losses_src, **losses_mix}
        total = sum(losses.values())
        if mcfg.sem_seg_head_sec_modal:
            new_state = {"head_bn": bn1, "head_sec_bn": bn2, "ema_head_bn": ema_bn}
        else:
            new_state = {"head_bn": bn2, "ema_head_bn": ema_bn}
        metrics = {**losses, "total_loss": total,
                   "pseudo_val": jnp.mean(pseudo_val),
                   "reg_prob_mean": jnp.mean(reg_prob)}
        gnorm = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, ts.opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        new_params = merge_trainable(new_trainable, frozen)
        metrics["grad_norm"] = gnorm

        return ts.replace(
            step=step + 1,
            params=new_params,
            ema=ema,
            state=new_state,
            opt_state=new_opt,
        ), metrics

    return step_fn
