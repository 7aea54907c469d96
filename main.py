"""MADM-TPU launcher (reference: ``main.py`` — LazyConfig load, flag->cfg
mutation, do_train / do_test / eval-only).

Differences from the reference launcher, by design:

- No per-GPU process spawning (``launch``, ``main.py:819-828``): one process
  drives all local TPU chips through a GSPMD mesh; multi-host runs call
  ``jax.distributed.initialize`` (``--distributed``).
- torch AMP/GradScaler flags collapse into bf16 compute (no loss scaling).

Usage (mirrors the reference):
  python main.py --config-file config_files/SemSeg/MTMADISE/mtmadise_cityscapes_rgb_to_depth_11.py \
      --bs 2 --tag RGB2Depth --source_root ... --target_root ...
  python main.py --config-file ... --eval-only --init-from model_RGB2Depth.pth
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

import numpy as np

logger = logging.getLogger("madm_tpu")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="MADM-TPU trainer")
    p.add_argument("--config-file", required=True)
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--init-from", default="", help="released .pth or orbax dir")
    p.add_argument("--sd-snapshot", default=os.environ.get("MADM_SD_SNAPSHOT", ""),
                   help="HF SD-v1.4 snapshot dir for frozen VAE/UNet-init weights")
    p.add_argument("--output", default="")
    p.add_argument("--tag", default="")
    p.add_argument("--debug", action="store_true")
    # frequently-used reference flags (main.py:721-817)
    p.add_argument("--bs", type=int, default=None, help="total train batch size")
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--max_iter", type=int, default=None)
    p.add_argument("--eval_iter", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--source_root", default="")
    p.add_argument("--target_root", default="")
    p.add_argument("--rare_class_sample", action="store_true")
    p.add_argument("--lora_configs", default=None,
                   help="comma list like Infrared_r16_a16 ('' disables)")
    p.add_argument("--slide_inference", action="store_true")
    p.add_argument("--eval_with_noise", type=int, default=None,
                   help="fixed diffusion timestep at eval (mtmadise.py:681)")
    # the rest of the reference flag surface (main.py:721-817) — each maps to
    # the same cfg mutation the reference performs (main.py:356-692); see
    # README for the full per-flag table
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--log-tag", dest="log_tag", default=None)
    p.add_argument("--amp", action="store_true",
                   help="accepted for parity; TPU always computes in bf16")
    p.add_argument("--reference-world-size", "--ref", dest="reference_world_size",
                   type=int, default=None)
    p.add_argument("--enable_sem_seg_head_sec_modal", action="store_true")
    p.add_argument("--stop_iter", type=int, default=None)
    p.add_argument("--unet_lr", type=float, default=None)
    p.add_argument("--vis_period", type=int, default=None)
    p.add_argument("--use_checkpoint", action="store_true")
    p.add_argument("--same_cond_params", action="store_true")
    p.add_argument("--disable_mixup", action="store_true")
    p.add_argument("--disable_color_aug", action="store_true")
    p.add_argument("--pl_crop", action="store_true")
    p.add_argument("--pseudo_threshold", type=float, default=None)
    p.add_argument("--MIC", dest="mic", action="store_true")
    p.add_argument("--mask_ratio", type=float, default=None)
    p.add_argument("--MIC_reg", dest="mic_reg", type=float, default=None)
    p.add_argument("--MIC_reg_wo_pl_val", dest="mic_reg_wo_pl_val",
                   action="store_true")
    p.add_argument("--FD", dest="fd", type=float, default=None)
    p.add_argument("--noise_reg", type=float, default=None)
    p.add_argument("--reg_target_palette", type=str, default=None)
    p.add_argument("--denoise_supervise", type=float, default=None)
    p.add_argument("--denoise_timestep_range", type=int, nargs="+", default=None)
    p.add_argument("--rev_noise_sup", action="store_true")
    p.add_argument("--rev_noise_end_iter", type=int, default=None)
    p.add_argument("--rev_noise_gradually", action="store_true")
    p.add_argument("--reg_uncertain", action="store_true")
    p.add_argument("--vae_decoder_loss", default=None, choices=["s", "t", "st"])
    p.add_argument("--vae_decoder_loss_type", default=None, choices=["L1", "L2"])
    p.add_argument("--vae_decoder_loss_weight", type=float, nargs="+", default=None)
    p.add_argument("--finetune_without_cross_attention", action="store_true")
    p.add_argument("--finetune_no", action="store_true")
    p.add_argument("--remove_texture", action="store_true",
                   help="edge-texture dataset ablation (dataset-side)")
    p.add_argument("--remove_amp", type=float, nargs="+", default=None,
                   help="FDA amplitude-removal range for source images "
                        "(dataset-side, cross_modality_dataset.py:112-126)")
    p.add_argument("--slide_training", action="store_true")
    p.add_argument("--final_fuse_vae_decoder_feat", action="store_true")
    p.add_argument("--mask_prompt_ratio", type=float, default=None)
    p.add_argument("--detach_mask_prompt", action="store_true")
    p.add_argument("--prompt_perturbation", type=float, default=None)
    p.add_argument("--prompt_confidence", type=float, default=None)
    p.add_argument("--rand_prompt_scale", type=float, default=None)
    p.add_argument("--without_prompt", action="store_true")
    p.add_argument("--without_prompt_alpha", action="store_true")
    p.add_argument("--prompt_seq_len", type=int, default=None)
    p.add_argument("--init_uncond_prompt", action="store_true")
    p.add_argument("--denoise_interval", type=int, default=None)
    p.add_argument("--multi_layer_prompt", action="store_true",
                   help="per-UNet-layer learnable prompts (ldm_base.py:649-651)")
    p.add_argument("--target_attention_loss", action="store_true",
                   help="teacher-student consistency on target cross-attn maps "
                        "(reference flag main.py:762; vestigial there, working here)")
    p.add_argument("--attention_select_index", type=int, default=None, nargs="+",
                   help="token indices picked from the attention maps "
                        "(reference main.py:764)")
    p.add_argument("--FD_attention", type=float, default=None,
                   help="feature distance on up-block cross-attn maps "
                        "(reference main.py:545-548: also sets res={16,32}, "
                        "location=['up'])")
    p.add_argument("--merge_with_pl_data", default=None,
                   help="mode or 'mode-val' (reference main.py:567-583)")
    p.add_argument("--pl_data_path", default=None)
    p.add_argument("--merge_more_target_data", default=None)
    p.add_argument("--with_clip", default=None,
                   choices=["no_learnable_clip", "learnable_clip"])
    # reference spelling kept ("corss"), main.py:758
    p.add_argument("--concat_corss_attention_feat_to_conv_seg",
                   dest="concat_attention_to_conv_seg", action="store_true")
    # feature-graph ablations (reference main.py:756,784,812)
    p.add_argument("--without_vae_encoder_feat", action="store_true",
                   help="drop the VAE-branch scale (reference main.py:469-479)")
    p.add_argument("--baseline_wo_encoder_feat", action="store_true",
                   help="same graph cut, base-model spelling "
                        "(reference main.py:645-652)")
    p.add_argument("--single_scale_decoder", action="store_true",
                   help="head on the highest-res UNet tap only "
                        "(reference main.py:584-592)")
    p.add_argument("--fda_fusion_val", type=float, default=None, nargs="+")
    p.add_argument("--concat_pixel_shuffle", action="store_true")
    p.add_argument("--mask_diff", default=None,
                   help="'circle' or per-modality constants like "
                        "'rgb=0_Depth=1' (reference main.py:654-660)")
    p.add_argument("--add_latent_noise", type=float, default=-1)
    p.add_argument("--norm_latent_noise", action="store_true")
    p.add_argument("--ema_w_unet", action="store_true",
                   help="EMA teacher also tracks the UNet+LoRA "
                        "(reference main.py:677-678, cmdise.py:318-321)")
    p.add_argument("--warmup_lr", action="store_true",
                   help="linear-decay-to-0 LR schedule + weight_decay 0.01 "
                        "(reference main.py:528-540)")
    p.add_argument("--num_chips", type=int, default=None,
                   help="limit the mesh to the first N local devices")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize()")
    p.add_argument("opts", nargs=argparse.REMAINDER,
                   help="dot-path overrides: a.b.c=value")
    return p


def apply_cli_mutations(cfg, args):
    """The reference's imperative flag->cfg layer (``main.py:356-692``),
    reduced to the flags this CLI exposes."""
    if args.debug:
        cfg.train.checkpointer["period"] = 5
        cfg.train.eval_period = 5
        cfg.train.vis_period = 2
        cfg.train.run_tag = "[Debug]" + cfg.train.get("run_tag", "")
    if args.bs is not None:
        cfg.dataloader.train.total_batch_size = args.bs
    if args.lr is not None:
        cfg.optimizer["lr"] = args.lr
    if args.max_iter is not None:
        cfg.train.max_iter = args.max_iter
    if args.eval_iter is not None:
        cfg.train.checkpointer["period"] = args.eval_iter
        cfg.train.eval_period = args.eval_iter
    if args.seed is not None:
        cfg.train.seed = args.seed
    if args.source_root:
        cfg.dataloader.train.dataset.source_root_path = args.source_root
        cfg.dataloader.test.dataset.source_root_path = args.source_root
    if args.target_root:
        cfg.dataloader.train.dataset.target_root_path = args.target_root
        cfg.dataloader.test.dataset.target_root_path = args.target_root
    if args.rare_class_sample:
        cfg.dataloader.train.dataset.rare_class_sample = True
    if args.lora_configs is not None:
        cfg.model.lora_configs = [s for s in args.lora_configs.split(",") if s]
    if args.wandb:
        cfg.train.wandb["enable_writer"] = True
    if args.log_tag:
        cfg.train.run_name = args.log_tag
    if args.amp:
        cfg.train.amp["enabled"] = True  # bf16 on TPU; no GradScaler
    if args.reference_world_size is not None:
        cfg.train.reference_world_size = args.reference_world_size
    if args.enable_sem_seg_head_sec_modal:
        cfg.model.sem_seg_head_sec_modal = True
    if args.stop_iter is not None:
        cfg.train.stop_iter = args.stop_iter
    if args.unet_lr is not None:
        cfg.optimizer["unet_lr"] = args.unet_lr
    if args.vis_period is not None:
        cfg.train.vis_period = args.vis_period
    if args.use_checkpoint:
        cfg.model.remat = True
    if args.same_cond_params:
        cfg.model.same_cond_params = True
    if args.disable_mixup:
        cfg.model.enable_mixup = False
    if args.disable_color_aug:  # color_aug_flag=False (cmdise.py:141)
        cfg.model.color_jitter_probability = 0.0
        cfg.model.color_jitter_strength = 0.0
    if args.pl_crop:
        cfg.model.pl_crop = True
    if args.pseudo_threshold is not None:
        cfg.model.pseudo_threshold = args.pseudo_threshold
    if args.mic:
        cfg.model.mic = True
    if args.mask_ratio is not None:
        cfg.model.mask_ratio = args.mask_ratio
    if args.mic_reg is not None:
        cfg.model.mic_reg = args.mic_reg
    if args.mic_reg_wo_pl_val:
        cfg.model.mic_reg_wo_pl_val = True
    if args.fd is not None:
        cfg.model.fd = args.fd
    if args.noise_reg is not None:
        cfg.model.noise_reg = args.noise_reg
    if args.reg_target_palette is not None:
        cfg.model.reg_target_palette = args.reg_target_palette
    if args.denoise_supervise is not None:
        cfg.model.denoise_supervise = args.denoise_supervise
    if args.denoise_timestep_range is not None:
        cfg.model.denoise_timestep_range = list(args.denoise_timestep_range)
    if args.rev_noise_sup:
        cfg.model.rev_noise_sup = True
    if args.rev_noise_end_iter is not None:
        cfg.model.rev_noise_end_iter = args.rev_noise_end_iter
    if args.rev_noise_gradually:
        cfg.model.rev_noise_gradually = True
    if args.reg_uncertain:
        cfg.model.reg_uncertain = True
    if args.vae_decoder_loss is not None:
        cfg.model.vae_decoder_loss = args.vae_decoder_loss
    if args.vae_decoder_loss_type is not None:
        cfg.model.vae_decoder_loss_type = args.vae_decoder_loss_type
    if args.vae_decoder_loss_weight is not None:
        cfg.model.vae_decoder_loss_weight = list(args.vae_decoder_loss_weight)
    if args.finetune_without_cross_attention:
        cfg.model.finetune_unet = "without cross-attention"
    if args.finetune_no:
        cfg.model.finetune_unet = "no"
    if args.remove_amp is not None:
        cfg.dataloader.train.dataset.remove_amp = list(args.remove_amp)
    if args.remove_texture:
        # dataset emits 'target_second_modality_pha' AND the train step runs
        # the edge-map consistency pass (reference main.py:462-464)
        cfg.dataloader.train.dataset.remove_texture = True
        cfg.model.remove_texture = True
    if args.slide_training:
        cfg.model.slide_training = True
    if args.final_fuse_vae_decoder_feat:
        cfg.model.final_fuse_vae_decoder_feat = True
    if args.mask_prompt_ratio is not None:
        cfg.model.mask_prompt_ratio = args.mask_prompt_ratio
    if args.detach_mask_prompt:
        cfg.model.detach_mask_prompt = True
    if args.prompt_perturbation is not None:
        cfg.model.prompt_perturbation = args.prompt_perturbation
    if args.prompt_confidence is not None:
        cfg.model.prompt_confidence = args.prompt_confidence
    if args.rand_prompt_scale is not None:
        cfg.model.rand_prompt_scale = args.rand_prompt_scale
    if args.without_prompt:
        cfg.model.without_prompt = True
    if args.without_prompt_alpha:
        cfg.model.without_prompt_alpha = True
    if args.prompt_seq_len is not None:
        cfg.model.prompt_seq_len = args.prompt_seq_len
    if args.init_uncond_prompt:
        cfg.model.init_uncond_prompt = True
    if args.denoise_interval is not None:
        cfg.model.denoise_interval = args.denoise_interval
    if args.multi_layer_prompt:
        cfg.model.multi_layer_prompt = True
    if args.target_attention_loss:
        # consistency needs maps to exist; default to the FD_attention tap
        # set when the config has none (reference main.py:503-504 only sets
        # the flag — its producer is broken, see MADMConfig)
        cfg.model.target_attention_loss = True
        if not cfg.model.get("attention_features_res", None):
            cfg.model.attention_features_res = [16, 32]
            cfg.model.attention_features_location = ["up"]
    if args.attention_select_index is not None:
        cfg.model.attention_select_index = list(args.attention_select_index)
    if args.FD_attention is not None:
        # reference main.py:545-548
        cfg.model.fd_attention = args.FD_attention
        cfg.model.attention_features_res = [16, 32]
        cfg.model.attention_features_location = ["up"]
    if args.merge_with_pl_data is not None:
        mode = args.merge_with_pl_data
        if "-" in mode:  # 'linear_mix-0.3' (reference cmdise.py:204-205)
            mode, val = mode.split("-")
            cfg.model.pl_merge_val = float(val)
        cfg.model.merge_with_pl_data = mode
    if args.pl_data_path is not None:
        cfg.dataloader.train.dataset.pl_data_path = args.pl_data_path
    if args.merge_more_target_data is not None:
        cfg.dataloader.train.dataset.merge_more_target_data = args.merge_more_target_data
    if args.with_clip is not None:
        cfg.model.clip_state = args.with_clip
    if args.without_vae_encoder_feat or args.baseline_wo_encoder_feat:
        # drop the VAE-branch scale: the reference empties
        # encoder_block_indices and shifts every per-scale list by one
        # (main.py:469-479,645-652); here that scale is out_features[0]
        # ('s0' in the shipped configs)
        assert cfg.model.out_features[0] in ("s0", "s2"), cfg.model.out_features
        cfg.model.out_features = list(cfg.model.out_features[1:])
        cfg.model.in_keys = list(cfg.model.in_keys[1:])
        cfg.model.feature_dims = list(cfg.model.feature_dims[1:])
        cfg.model.projection_dim = list(cfg.model.projection_dim[1:])
    if args.single_scale_decoder:
        # only the highest-res UNet tap feeds the head (main.py:584-592;
        # tap channels hardcoded for the full SD UNet, like the reference)
        cfg.model.out_features = ["s3"]
        cfg.model.in_keys = ["s3"]
        cfg.model.feature_dims = [320]
        cfg.model.projection_dim = [512]
        cfg.model.unet_block_indices = [11]
    if args.fda_fusion_val is not None:
        cfg.dataloader.train.dataset.fda_fusion_val = list(args.fda_fusion_val)
        cfg.dataloader.test.dataset.fda_fusion_val = list(args.fda_fusion_val)
    if args.concat_pixel_shuffle:
        cfg.model.concat_pixel_shuffle = True
    if args.mask_diff is not None:
        # 'circle' adds a 2-channel mask input, otherwise 1 (main.py:654-660)
        cfg.model.mask_diff = args.mask_diff
        cfg.model.input_channel_plus = 2 if args.mask_diff == "circle" else 1
    if args.add_latent_noise != -1:
        cfg.model.add_latent_noise = args.add_latent_noise
    if args.norm_latent_noise:
        cfg.model.norm_latent_noise = True
    if args.ema_w_unet:
        cfg.model.ema_w_unet = True
    if args.warmup_lr:
        # replaces the multi-step schedule with linear decay to 0 and drops
        # weight decay to 0.01 (reference main.py:528-540)
        cfg.optimizer["schedule"] = "linear"
        cfg.optimizer["weight_decay"] = 0.01
    if args.concat_attention_to_conv_seg:
        cfg.model.concat_attention_to_conv_seg = True
    if args.tag:
        cfg.train.run_tag = args.tag
    out = args.output or os.path.join(
        cfg.train.output_dir, cfg.train.get("run_tag", "") or "run"
    )
    cfg.train.output_dir = out
    return cfg


def apply_step2_convention(cfg, args):
    """Two-stage training convention (reference ``main.py:301-302,405-406``):
    when the train manifest name contains ``step_2``, stage-2 source data
    (stage-1 pseudo-labeled outputs) lives beside the manifest, and
    ``train.init_checkpoint`` is auto-loaded before training."""
    ds = cfg.dataloader.train.dataset
    json_path = str(ds.get("json_path", ""))
    if "step_2" not in os.path.basename(json_path):
        return
    ds.source_root_path = os.path.dirname(json_path)
    cfg.dataloader.test.dataset.source_root_path = ds.source_root_path
    if not args.init_from and cfg.train.get("init_checkpoint"):
        args.init_from = cfg.train.init_checkpoint
        logger.info(f"step_2 manifest: auto-loading {args.init_from}")


def setup(args):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s: %(message)s",
    )
    if args.distributed:
        import jax

        jax.distributed.initialize()

    from madm_tpu.config import LazyConfig, auto_scale_workers

    from madm_tpu.utils.collect_env import collect_env_info

    logger.info("environment:\n" + collect_env_info())
    cfg = LazyConfig.load(args.config_file)
    cfg = apply_cli_mutations(cfg, args)
    LazyConfig.apply_overrides(cfg, args.opts)
    apply_step2_convention(cfg, args)
    if cfg.train.get("reference_world_size", 0):
        import jax

        cfg = auto_scale_workers(cfg, len(jax.devices()))
    os.makedirs(cfg.train.output_dir, exist_ok=True)
    with open(os.path.join(cfg.train.output_dir, "config.yaml"), "w") as f:
        f.write(LazyConfig.to_py(cfg))
    return cfg


def build_model_and_state(cfg, args):
    import jax

    from madm_tpu.checkpoint import load_sd_snapshot, merge_into_variables
    from madm_tpu.config import instantiate
    from madm_tpu.train import make_optimizer, make_train_state, split_trainable

    model = instantiate(cfg.model)
    variables = model.init_params(jax.random.PRNGKey(cfg.train.seed))

    if args.sd_snapshot:
        logger.info(f"loading SD snapshot from {args.sd_snapshot}")
        sd = load_sd_snapshot(args.sd_snapshot)
        clip_text = sd.pop("clip_text", None)
        if model.cfg.input_channel_plus or model.cfg.concat_pixel_shuffle:
            # conv_in surgery: widen the 4-channel SD kernel with the
            # reference's copy rules (ldm_diffusers.py:60-99)
            from madm_tpu.checkpoint import expand_conv_in

            sd["unet"]["conv_in"]["kernel"] = expand_conv_in(
                sd["unet"]["conv_in"]["kernel"],
                model.cfg.input_channel_plus,
                model.cfg.concat_pixel_shuffle,
            )
        variables["params"] = merge_into_variables(variables["params"], sd)
        if clip_text is not None:
            # recompute the empty-prompt embedding from the real text encoder
            # (reference ldm_diffusers.py:219-243)
            from madm_tpu.models.clip_text import compute_uncond_inputs

            variables["consts"]["uncond_inputs"] = compute_uncond_inputs(clip_text)
            if model.cfg.init_uncond_prompt:
                # seed the learnable prompt from the (resized) uncond
                # embedding (reference ldm_base.py:648-650)
                import jax.numpy as jnp

                uncond = variables["consts"]["uncond_inputs"]
                for key, tree in variables["params"]["prompt"].items():
                    if "prompt_embed" in tree:
                        tgt = tree["prompt_embed"].shape
                        pe = uncond if uncond.shape == tgt else jax.image.resize(
                            uncond, tgt, method="bilinear")
                        tree["prompt_embed"] = pe.astype(tree["prompt_embed"].dtype)

    trainable, _ = split_trainable(
        variables, model.cfg.finetune_unet,
        learnable_clip=model.cfg.clip_state == "learnable_clip",
    )
    opt = cfg.optimizer
    tx = make_optimizer(
        trainable,
        base_lr=opt["lr"],
        weight_decay=opt["weight_decay"],
        max_iter=cfg.train.max_iter,
        grad_clip=cfg.train.get("grad_clip") or 0.01,
        unet_lr=opt.get("unet_lr"),
        # optimizer.no_momentum=True (adafactor only): classic momentumless
        # Adafactor — drops the first-moment buffer (-1.7GB, single-chip)
        b1=(None if opt.get("no_momentum")
            else opt.get("betas", (0.9, 0.999))[0]),
        b2=opt.get("betas", (0.9, 0.999))[1],
        eps=opt.get("eps", 1e-8),
        mu_dtype=opt.get("mu_dtype"),
        schedule=opt.get("schedule", "multistep"),
        name=opt.get("name", "adamw"),
    )
    state = make_train_state(model, variables, tx)
    return model, state, tx


def state_to_variables(state):
    return {
        "params": state.params,
        "ema": state.ema,
        "state": state.state,
        "consts": state.consts,
    }


def do_test(cfg, model, state, args, iteration=0):
    import jax

    from madm_tpu.config import instantiate
    from madm_tpu.evaluation import inference_on_dataset
    from madm_tpu.parallel import make_mesh

    devices = jax.devices()
    if args.num_chips:
        devices = devices[: args.num_chips]
    mesh = make_mesh(devices)  # eval crops ride the data axis
    loader = instantiate(cfg.dataloader.test)
    evaluator = instantiate(cfg.dataloader.evaluator)[0]
    evaluator._output_dir = os.path.join(cfg.train.output_dir, f"{iteration:06d}")
    results = inference_on_dataset(
        model,
        state_to_variables(state),
        loader,
        evaluator,
        mesh=mesh,
        # single-chip: group MADM_EVAL_BATCH images per dispatch (v5e
        # sublane fill at 8; default 1 = reference batch-1 protocol)
        batch=int(os.environ.get("MADM_EVAL_BATCH", "1")),
        lora_name=model.cfg.target_modality if model.lora_specs else None,
        slide_inference=args.slide_inference,
        eval_with_noise=(
            args.eval_with_noise if args.eval_with_noise is not None
            else model.cfg.eval_with_noise  # mtmadise.py:46,681-682
        ),
    )
    logger.info(f"eval @ iter {iteration}: {dict(results['sem_seg'])}")
    return {k: v for k, v in results["sem_seg"].items() if not k.startswith(("IoU-", "ACC-"))}


def do_train(cfg, args):
    import jax

    from madm_tpu.checkpoint import BestCheckpointer, Checkpointer, PeriodicCheckpointer
    from madm_tpu.config import instantiate
    from madm_tpu.parallel import make_mesh, make_sharded_train_step, place_state, shard_batch
    from madm_tpu.train import TrainConfig, make_train_step
    from madm_tpu.utils import CommonMetricPrinter, EventStorage, JSONWriter, WriterStack

    model, state, tx = build_model_and_state(cfg, args)

    from madm_tpu.utils.parameter_count import parameter_count_table

    logger.info("parameters:\n" + parameter_count_table(state.params))

    from madm_tpu.train import build_train_config

    tc = build_train_config(cfg, model.cfg)

    devices = jax.devices()
    if args.num_chips:
        devices = devices[: args.num_chips]
    # the data axis cannot exceed the total batch (ref: total batch split
    # across ranks, data/build.py:77-90) — use the largest divisor that fits
    total_bs = cfg.dataloader.train.total_batch_size
    n = len(devices)
    while total_bs % n:
        n -= 1
    if n != len(devices):
        logger.warning(
            f"batch {total_bs} not divisible by {len(devices)} devices; "
            f"using {n} devices for the data axis"
        )
    mesh = make_mesh(devices[:n])
    logger.info(f"mesh: {mesh}")

    ckpt = Checkpointer(cfg.train.output_dir)
    state, resumed = ckpt.resume_or_load(state, args.init_from, args.resume, model)
    start_iter = int(state.step)

    if tc.fd or tc.fd_attention:
        # snapshot the init UNet/prompt as the feature-distance target
        # (reference ``ori_unet = deepcopy(...)``, cmdise.py:332-335)
        from madm_tpu.train.train_step import add_feature_distance_baseline

        state = add_feature_distance_baseline(state)

    step_fn = make_sharded_train_step(make_train_step(model, tc, tx), mesh, state)
    state = place_state(mesh, state)

    loader = instantiate(cfg.dataloader.train)
    periodic = PeriodicCheckpointer(
        ckpt, cfg.train.checkpointer["period"], cfg.train.max_iter,
        cfg.train.checkpointer.get("max_to_keep", 1),
    )
    best = BestCheckpointer(ckpt)
    from madm_tpu.train.optimizer import get_lr_schedule

    lr_sched = get_lr_schedule(cfg.optimizer["lr"], cfg.train.max_iter,
                               cfg.optimizer.get("schedule", "multistep"))
    storage = EventStorage(start_iter)
    writer_list = [JSONWriter(os.path.join(cfg.train.output_dir, "metrics.json")),
                   CommonMetricPrinter(cfg.train.max_iter)]
    wandb_cfg = cfg.train.get("wandb", {})
    if wandb_cfg.get("enable_writer"):
        from madm_tpu.utils import WandbWriter

        writer_list.append(WandbWriter(
            project=wandb_cfg.get("project", "MADM_TPU"),
            name=cfg.train.get("run_tag") or None,
            resume=wandb_cfg.get("resume", False),
            output_dir=cfg.train.output_dir,
        ))
    writers = WriterStack(writer_list, period=cfg.train.get("log_period", 50))

    # periodic training-vis grids with the reference's full panel set
    # (reference VisHook / mtmadise.py:551-653; see madm_tpu/train/vis.py)
    vis_period = cfg.train.get("vis_period", 0)
    if vis_period:
        import jax.numpy as jnp

        from madm_tpu.train.vis import build_vis_data, make_vis_fn
        from madm_tpu.utils.visualization import save_vis_grid

        vis_fn = make_vis_fn(model, tc)

        def maybe_vis(it, state, batch, step_rng):
            if (it + 1) % vis_period:
                return
            host = jax.device_get(
                vis_fn(state_to_variables(state), batch, step_rng,
                       jnp.asarray(it, jnp.int32))
            )
            save_vis_grid(
                build_vis_data(host, tc, it + 1),
                cfg.train.output_dir, it + 1, list(model.cfg.train_palette),
            )
    else:
        def maybe_vis(it, state, batch, step_rng):
            return

    rng = jax.random.PRNGKey(cfg.train.seed)
    data_iter = iter(loader)
    t_last = time.perf_counter()
    # --stop_iter halts early without shortening the lr schedule
    stop_iter = min(cfg.train.max_iter, cfg.train.get("stop_iter") or cfg.train.max_iter)

    # metric fetch is pipelined one step behind the dispatch: fetching step
    # i-1's scalars while step i runs on device hides the per-fetch transfer
    # latency (~30 ms on the tunneled TPU, CLAUDE.md); the NaN sentinel fires
    # on the delayed value.  The reference's metric path is likewise off the
    # critical path (engine/train_loop.py:144-185, rank-0 gather).
    pending = None  # (it, device metric tree, data_time, dispatch timestamp)

    def flush(p):
        p_it, dev_metrics, data_time, t_disp = p
        metrics = {k: float(v) for k, v in dev_metrics.items()}
        if not np.isfinite(metrics["total_loss"]):
            raise FloatingPointError(f"non-finite loss at iter {p_it}: {metrics}")
        storage.put_scalars(
            **metrics, data_time=data_time, time=t_disp,
            lr=float(lr_sched(p_it)),
        )
        writers.maybe_write(storage)
        storage.step()

    try:
        for it in range(start_iter, stop_iter):
            t0 = time.perf_counter()
            batch = next(data_iter)
            batch = shard_batch(mesh, batch)
            t1 = time.perf_counter()
            rng, step_rng = jax.random.split(rng)
            state, dev_metrics = step_fn(state, batch, step_rng)
            t2 = time.perf_counter()
            if pending is not None:
                flush(pending)
            pending = (it, dev_metrics, t1 - t0, t2 - t_last)
            t_last = t2
            maybe_vis(it, state, batch, step_rng)
            is_ckpt_iter = ((it + 1) % periodic.period == 0
                            or it + 1 == cfg.train.max_iter)
            is_eval_iter = ((it + 1) % cfg.train.eval_period == 0
                            or it + 1 == cfg.train.max_iter)
            if pending is not None and (is_ckpt_iter or is_eval_iter):
                # validate this iter's metrics BEFORE saving/evaluating so a
                # NaN-poisoned state never lands in a checkpoint (the fetch
                # is forced here anyway — do_test/save both sync the device)
                flush(pending)
                pending = None
            periodic.step(it, state)
            if is_eval_iter:
                results = do_test(cfg, model, state, args, iteration=it + 1)
                best.step(results, state)
                if results:
                    # flatten eval metrics into EventStorage so they reach
                    # metrics.json/wandb like every other scalar (reference
                    # EvalHook, engine/hooks.py:16-52)
                    storage.put_scalars(**{
                        f"eval/{k}": float(v)
                        for k, v in results.items()
                        if isinstance(v, (int, float)) and np.isfinite(float(v))
                    })
                    writers.write(storage)
        if pending is not None:
            flush(pending)
            pending = None
    finally:
        if pending is not None:  # surface the last step's metrics on error
            try:
                flush(pending)
            except Exception:
                # never mask the primary traceback (device-side errors can
                # surface from float() here, not just FloatingPointError)
                pass
        writers.close()
    return state


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = setup(args)
    if args.eval_only:
        model, state, _ = build_model_and_state(cfg, args)
        from madm_tpu.checkpoint import Checkpointer

        ckpt = Checkpointer(cfg.train.output_dir)
        state, _ = ckpt.resume_or_load(state, args.init_from, args.resume, model)
        return do_test(cfg, model, state, args, iteration=int(state.step))
    return do_train(cfg, args)


if __name__ == "__main__":
    main()
