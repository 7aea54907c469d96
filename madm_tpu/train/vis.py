"""Training-vis data collection (reference ``mtmadise.py:551-653``).

Reproduces the reference's full vis-grid panel set by re-deriving the step's
no-grad intermediates (DACS mix, teacher pseudo-labels, decoder RGB outputs,
reg-uncertain maps) with the SAME rng splits the train step used, plus plain
student forwards for the prediction panels.  Jitted separately from the train
step so the step graph never pays for vis; called every ``vis_period`` iters.

Panels (matching ``mtmadise.py:559-569`` + conditionals):

- source_rgb / source_pred / source_label
- target_sec_modal / target_sec_modal_pl (+ ``_{t}_t`` while rev-noise is on)
- mixup_modal / mixup_pred / mixup_label
- masked_image / masked_image_pred (``mic``; ``:572-576``)
- source_vae_decoder_out / target_vae_decoder_out (``'s'``/``'t'`` in
  vae_decoder_loss; ``:590-598``)
- pl_reg / pl_prob_reg / pl_prob_{pseudo_val} (``reg_uncertain``; ``:599-604``)
- attention overlays of the teacher's captured cross-attn maps (the working
  analog of ``utils/visualization.py:44-118`` ``show_image_attention_maps``)
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..models.madm import MADM
from ..ops import dacs, palette
from . import criterion
from .train_step import TrainConfig, rev_noise_timestep


def make_vis_fn(model: MADM, tc: TrainConfig):
    """Jitted collector: (variables, batch, rng, step) -> dict of vis arrays.

    ``rng`` must be the step_rng passed to the train step at the same
    iteration so the DACS mix / jitter / rev-noise draw reproduce the step's
    actual inputs (train_step.py:304-306 split order)."""
    mcfg = model.cfg
    modality = mcfg.target_modality
    lora_names = set(model.lora_specs)
    src_lora = "default" if "default" in lora_names else None
    tgt_lora = modality if modality in lora_names else None
    num_classes = mcfg.num_classes
    class_table = jnp.asarray(
        palette.palette_table(mcfg.train_palette)[:num_classes]
    )
    want_attn = bool(mcfg.attention_features_res)

    @jax.jit
    def vis_fn(variables: Dict[str, Any], batch: Dict[str, jax.Array],
               rng: jax.Array, step: jax.Array):
        # identical split order to train_step.py:304-306
        (k_mask, k_jitter, k_revt, _k_drop1, _k_drop2, _k_drop3, k_micjit,
         k_micmask, _k_micdrop, _k_dst, _k_nrjit, _k_nrt, k_aln,
         _k_pm, _k_rp) = jax.random.split(rng, 15)

        source = batch["source_rgb"]
        target = batch["target_second_modality"]
        gt = batch["source_label"]
        b = source.shape[0]

        mix_mask = dacs.sample_class_masks(k_mask, gt, num_classes)
        mixed_img = dacs.one_mix(mix_mask[..., None], source, target)
        mixed_img = dacs.strong_transform(
            k_jitter, mixed_img, tc.color_jitter_strength,
            tc.color_jitter_probability, tc.blur,
        )
        t_pl = rev_noise_timestep(k_revt, step.astype(jnp.float32), tc)

        out: Dict[str, jax.Array] = {
            "source_rgb": source,
            "source_label": gt,
            "target_sec_modal": target,
            "mixup_modal": mixed_img,
            "rev_noise_t": t_pl,
        }

        # ---- teacher pseudo-label pass (eval-mode head is fine for vis)
        tch = model.backbone_forward(
            variables, target, input_modal="others", lora_name=tgt_lora,
            ema_forward=True, timesteps=jnp.broadcast_to(t_pl, (b,)),
            modality_mask=model.modality_mask(target, modality),
            capture_attention=want_attn,
        )
        ema_logits = model.head_forward(
            variables, tch["output_features"], ema_forward=True,
        )
        ema_logits = criterion._resize_logits(
            ema_logits.astype(jnp.float32), target.shape[1:3]
        )
        out["target_sec_modal_pl"] = ema_logits
        ema_sm = jax.nn.softmax(ema_logits, axis=-1)
        pseudo_prob = ema_sm.max(axis=-1)
        pseudo_label = ema_sm.argmax(axis=-1).astype(jnp.int32)
        out["pl_prob"] = pseudo_prob
        out["pseudo_val"] = (pseudo_prob >= tc.pseudo_threshold).mean()
        if tc.enable_mixup:
            out["mixup_label"] = dacs.one_mix(
                mix_mask, gt.astype(jnp.float32), pseudo_label.astype(jnp.float32)
            ).astype(jnp.int32)
        else:
            out["mixup_label"] = pseudo_label
        if want_attn:
            # first captured resolution's maps, token-mean -> [B, h, w]
            maps = next(iter(tch["attention_features"].values()))
            out["attention_map"] = maps.mean(axis=-1)

        # ---- student source + mixed prediction panels
        src = model.backbone_forward(
            variables, source, input_modal="rgb", lora_name=src_lora,
            modality_mask=model.modality_mask(source, "rgb"),
        )
        out["source_pred"] = criterion._resize_logits(
            model.head_forward(variables, src["output_features"]).astype(jnp.float32),
            source.shape[1:3],
        )
        if "s" in tc.vae_decoder_loss and mcfg.use_s0:
            out["source_vae_decoder_out"] = (src["after_vae_decoder"] + 1) / 2
        mix = model.backbone_forward(
            variables, mixed_img, input_modal="mixed", lora_name=tgt_lora,
            modality_mask=model.mixed_modality_mask(mix_mask, modality),
            latent_noise_rng=k_aln,
        )
        out["mixup_pred"] = criterion._resize_logits(
            model.head_forward(
                variables, mix["output_features"], use_sec_modal=True
            ).astype(jnp.float32),
            mixed_img.shape[1:3],
        )
        if "t" in tc.vae_decoder_loss and mcfg.use_s0:
            out["target_vae_decoder_out"] = (mix["after_vae_decoder"] + 1) / 2

        # ---- MIC masked panel (mtmadise.py:572-576)
        if tc.mic or tc.mic_reg:
            masked_img = dacs.strong_transform(
                k_micjit, target, tc.color_jitter_strength,
                tc.color_jitter_probability, tc.blur,
            )
            masked_img = dacs.mask_image(k_micmask, masked_img, tc.mask_ratio)
            out["masked_image"] = masked_img
            if tc.mic:
                mic = model.backbone_forward(
                    variables, masked_img, input_modal="others",
                    lora_name=tgt_lora,
                    modality_mask=model.modality_mask(target, modality),
                )
                out["masked_image_pred"] = criterion._resize_logits(
                    model.head_forward(
                        variables, mic["output_features"], use_sec_modal=True
                    ).astype(jnp.float32),
                    target.shape[1:3],
                )

        # ---- reg_uncertain palette-distance panels (mtmadise.py:599-604)
        if tc.reg_uncertain and mcfg.use_s0:
            dec01 = (tch["after_vae_decoder"].astype(jnp.float32) + 1) / 2
            reg_p, _, reg_sm = palette.palette_distance_pseudo_label(
                dec01, class_table
            )
            out["pl_reg"] = reg_sm
            out["pl_prob_reg"] = reg_p
        return out

    return vis_fn


def build_vis_data(host: Dict[str, np.ndarray], tc: TrainConfig,
                   iteration: int) -> List[Dict]:
    """Fetched vis_fn outputs -> the reference's ordered vis_data panel list
    (``mtmadise.py:559-604``)."""
    pl_info = "target_sec_modal_pl"
    t = int(np.asarray(host["rev_noise_t"]))
    if tc.rev_noise_sup and iteration <= tc.rev_noise_end_iter and t > 0:
        pl_info += f"_{t}_t"

    def p(dtype, info, key):
        return {"data_type": dtype, "info": info, "data": np.asarray(host[key])}

    vis = [
        p("image", "source_rgb", "source_rgb"),
        p("logits", "source_pred", "source_pred"),
        p("label", "source_label", "source_label"),
        p("image", "target_sec_modal", "target_sec_modal"),
        p("logits", pl_info, "target_sec_modal_pl"),
        p("image", "mixup_modal", "mixup_modal"),
        p("logits", "mixup_pred", "mixup_pred"),
        p("label", "mixup_label", "mixup_label"),
    ]
    if "masked_image" in host:
        vis.append(p("image", "masked_image", "masked_image"))
    if "masked_image_pred" in host:
        vis.append(p("logits", "masked_image_pred", "masked_image_pred"))
    if "source_vae_decoder_out" in host:
        vis.append(p("image", "source_vae_decoder_out", "source_vae_decoder_out"))
    if "target_vae_decoder_out" in host:
        vis.append(p("image", "target_vae_decoder_out", "target_vae_decoder_out"))
    if "pl_reg" in host:
        pv = float(np.asarray(host["pseudo_val"]))
        vis.append(p("logits", "pl_reg", "pl_reg"))
        vis.append(p("heatmap", "pl_prob_reg", "pl_prob_reg"))
        vis.append({"data_type": "heatmap", "info": f"pl_prob_{pv:.3f}",
                    "data": np.asarray(host["pl_prob"])})
    if "attention_map" in host:
        vis.append({
            "data_type": "attention_maps", "info": "teacher_cross_attn",
            "data": np.asarray(host["attention_map"]),
            "image": np.asarray(host["target_sec_modal"]),
        })
    return vis
