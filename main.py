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
    if args.tag:
        cfg.train.run_tag = args.tag
    out = args.output or os.path.join(
        cfg.train.output_dir, cfg.train.get("run_tag", "") or "run"
    )
    cfg.train.output_dir = out
    return cfg


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
        variables["params"] = merge_into_variables(variables["params"], sd)
        if clip_text is not None:
            # recompute the empty-prompt embedding from the real text encoder
            # (reference ldm_diffusers.py:219-243)
            from madm_tpu.models.clip_text import compute_uncond_inputs

            variables["consts"]["uncond_inputs"] = compute_uncond_inputs(clip_text)

    trainable, _ = split_trainable(variables)
    opt = cfg.optimizer
    tx = make_optimizer(
        trainable,
        base_lr=opt["lr"],
        weight_decay=opt["weight_decay"],
        max_iter=cfg.train.max_iter,
        grad_clip=cfg.train.get("grad_clip") or 0.01,
        unet_lr=opt.get("unet_lr"),
        b1=opt.get("betas", (0.9, 0.999))[0],
        b2=opt.get("betas", (0.9, 0.999))[1],
        eps=opt.get("eps", 1e-8),
        mu_dtype=opt.get("mu_dtype"),
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
    from madm_tpu.config import instantiate
    from madm_tpu.evaluation import inference_on_dataset

    loader = instantiate(cfg.dataloader.test)
    evaluator = instantiate(cfg.dataloader.evaluator)[0]
    evaluator._output_dir = os.path.join(cfg.train.output_dir, f"{iteration:06d}")
    results = inference_on_dataset(
        model,
        state_to_variables(state),
        loader,
        evaluator,
        lora_name=model.cfg.target_modality if model.lora_specs else None,
        slide_inference=args.slide_inference,
        eval_with_noise=args.eval_with_noise,
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

    uda_cfg = cfg.get("uda", {})
    tc = TrainConfig(
        max_iter=cfg.train.max_iter,
        ema_alpha=model.cfg.ema_alpha,
        pseudo_threshold=model.cfg.pseudo_threshold,
        blur=uda_cfg.get("blur", True),
        color_jitter_strength=uda_cfg.get("color_jitter_strength", 0.2),
        color_jitter_probability=uda_cfg.get("color_jitter_probability", 0.2),
        enable_mixup=uda_cfg.get("enable_mixup", True),
        rev_noise_sup=uda_cfg.get("rev_noise_sup", False),
        rev_noise_end_iter=uda_cfg.get("rev_noise_end_iter") or cfg.train.max_iter,
        rev_noise_gradually=uda_cfg.get("rev_noise_gradually", False),
        denoise_timestep_range=tuple(uda_cfg.get("denoise_timestep_range") or (0, 0)),
        vae_decoder_loss=uda_cfg.get("vae_decoder_loss", ""),
        vae_decoder_loss_type=uda_cfg.get("vae_decoder_loss_type", "L1"),
        vae_decoder_loss_weight=tuple(
            (uda_cfg.get("vae_decoder_loss_weight") or [1.0, 1.0]) + [1.0]
        )[:2],
        reg_uncertain=uda_cfg.get("reg_uncertain", False),
    )

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

    step_fn = make_sharded_train_step(make_train_step(model, tc, tx), mesh, state)
    state = place_state(mesh, state)

    loader = instantiate(cfg.dataloader.train)
    periodic = PeriodicCheckpointer(
        ckpt, cfg.train.checkpointer["period"], cfg.train.max_iter,
        cfg.train.checkpointer.get("max_to_keep", 1),
    )
    best = BestCheckpointer(ckpt)
    from madm_tpu.train.optimizer import lr_schedule

    lr_sched = lr_schedule(cfg.optimizer["lr"], cfg.train.max_iter)
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

    # periodic training-vis grids (reference VisHook / mtmadise.py:551-653)
    vis_period = cfg.train.get("vis_period", 0)
    if vis_period:
        import jax.numpy as jnp

        from madm_tpu.utils.visualization import save_vis_grid

        @jax.jit
        def _vis_fwd(variables, src, tgt):
            sfeats = model.backbone_forward(variables, src, input_modal="rgb")
            slog = model.head_forward(variables, sfeats["output_features"])
            tfeats = model.backbone_forward(
                variables, tgt, input_modal="others", ema_forward=True
            )
            tlog = model.head_forward(
                variables, tfeats["output_features"], ema_forward=True
            )
            return slog.astype(jnp.float32), tlog.astype(jnp.float32)

        def maybe_vis(it, state, batch):
            if (it + 1) % vis_period:
                return
            v = state_to_variables(state)
            slog, tlog = _vis_fwd(v, batch["source_rgb"], batch["target_second_modality"])
            save_vis_grid(
                [
                    {"data_type": "image", "info": "source_rgb",
                     "data": np.asarray(batch["source_rgb"])},
                    {"data_type": "logits", "info": "source_pred", "data": np.asarray(slog)},
                    {"data_type": "label", "info": "source_label",
                     "data": np.asarray(batch["source_label"])},
                    {"data_type": "image", "info": "target_sec_modal",
                     "data": np.asarray(batch["target_second_modality"])},
                    {"data_type": "logits", "info": "target_sec_modal_pl",
                     "data": np.asarray(tlog)},
                ],
                cfg.train.output_dir, it + 1, list(model.cfg.train_palette),
            )
    else:
        def maybe_vis(it, state, batch):
            return

    rng = jax.random.PRNGKey(cfg.train.seed)
    data_iter = iter(loader)
    t_last = time.perf_counter()
    try:
        for it in range(start_iter, cfg.train.max_iter):
            t0 = time.perf_counter()
            batch = next(data_iter)
            batch = shard_batch(mesh, batch)
            t1 = time.perf_counter()
            rng, step_rng = jax.random.split(rng)
            state, metrics = step_fn(state, batch, step_rng)
            metrics = {k: float(v) for k, v in metrics.items()}
            t2 = time.perf_counter()
            if not np.isfinite(metrics["total_loss"]):
                raise FloatingPointError(f"non-finite loss at iter {it}: {metrics}")
            storage.put_scalars(
                **metrics, data_time=t1 - t0, time=t2 - t_last,
                lr=float(lr_sched(it)),
            )
            t_last = t2
            writers.maybe_write(storage)
            maybe_vis(it, state, batch)
            periodic.step(it, state)
            if (it + 1) % cfg.train.eval_period == 0 or it + 1 == cfg.train.max_iter:
                results = do_test(cfg, model, state, args, iteration=it + 1)
                best.step(results, state)
            storage.step()
    finally:
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
