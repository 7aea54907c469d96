"""Single-chip 512x512 flagship TRAIN step: does it fit, and how fast?

Usage:  python tools/train_memory_probe.py [--bs 1] [--steps 3]
                                           [--opt adafactor|adamw]
                                           [--mu-dtype bfloat16|float32]

The reference trains on 2x >40GB A100s (README.md:77); a 16GB v5e OOMs at
~18.6GB with replicated fp32 AdamW state (CLAUDE.md).  This probe compiles
the FULL flagship UDA train step (TrainConfig defaults: rev-noise,
vae_decoder_loss='st', reg_uncertain, split-grad, remat) on the real chip
and reports device memory + step time — the experiment behind the
``optimizer.name='adafactor'`` single-chip memory option
(``madm_tpu/train/optimizer.py``).

Timing fetches a device scalar (tunneled block_until_ready is a no-op).

``run_probe`` is importable (bench.py's opt-in MADM_BENCH_TRAIN leg).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def mem_gb():
    stats = jax.local_devices()[0].memory_stats() or {}
    return {k: round(v / 2**30, 2) for k, v in stats.items()
            if k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")}


def run_probe(bs: int = 1, steps: int = 3, opt: str = "adafactor",
              mu_dtype: str = "bfloat16", no_momentum: bool = False,
              frozen_bf16: bool = False, xla_opts=None,
              quiet: bool = False, aspp_scan: bool = True) -> float:
    """Compile + run the flagship 512^2 train step; return steady ms/step."""

    def say(msg):
        if not quiet:
            print(msg, flush=True)
        else:
            print(msg, file=sys.stderr, flush=True)

    if aspp_scan:
        # the measured 16GB fit needs the scan-serialized ASPP backward
        # (STATUS r4); read at trace time by ASPPWrapper
        os.environ.setdefault("MADM_ASPP_SCAN", "1")

    from madm_tpu.models.madm import MADM, MADMConfig
    from madm_tpu.train import (
        TrainConfig, make_optimizer, make_train_state, make_train_step,
        split_trainable,
    )

    # remat=True is how the shipped configs train (config_files set
    # model.remat); MADMConfig's default is False, which silently probed
    # the no-remat graph in the first r4 runs (16.87G best case)
    model = MADM(MADMConfig(remat=True))  # full SD-v1.4, 512x512
    variables = model.init_params(jax.random.PRNGKey(0))
    trainable, frozen = split_trainable(variables, model.cfg.finetune_unet)
    if frozen_bf16:
        import jax.tree_util as tu

        frozen_paths = {
            tu.keystr(p) for p, _ in tu.tree_flatten_with_path(frozen)[0]
        }
        variables["params"] = tu.tree_map_with_path(
            lambda p, x: (x.astype(jnp.bfloat16)
                          if tu.keystr(p) in frozen_paths
                          and x.dtype == jnp.float32 else x),
            variables["params"],
        )
    n_train = sum(x.size for x in jax.tree.leaves(trainable))
    say(f"trainable params: {n_train / 1e6:.1f}M   "
        f"opt={opt} mu_dtype={mu_dtype}")

    opt_kw = {"b1": None} if no_momentum else {}
    tx = make_optimizer(trainable, name=opt, mu_dtype=mu_dtype, **opt_kw)
    tc = TrainConfig()  # flagship defaults: rev-noise + 'st' decoder loss
    state = make_train_state(model, variables, tx)
    # donate the state like the production sharded step does
    # (parallel/mesh.py:125) — without it the 5.2G output state is a second
    # allocation on top of the argument state (measured r4: the no-donation
    # probe OOM'd at 17.56G purely from that duplication)
    step_fn = jax.jit(make_train_step(model, tc, tx), donate_argnums=0)

    batch = {
        "source_rgb": jnp.zeros((bs, 512, 512, 3), jnp.float32),
        "source_label": jnp.zeros((bs, 512, 512), jnp.int32),
        "target_second_modality": jnp.zeros((bs, 512, 512, 3), jnp.float32),
    }
    if xla_opts:
        say(f"compiler options: {xla_opts}")
        step_fn = step_fn.lower(
            state, batch, jax.random.PRNGKey(0)
        ).compile(compiler_options=xla_opts)
    say(f"after init: {mem_gb()}")

    t0 = time.perf_counter()
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
    loss = float(metrics["total_loss"])  # fetch = the only reliable sync
    say(f"step 1 (compile): {time.perf_counter() - t0:.0f}s  "
        f"total_loss={loss:.4f}")
    say(f"after step 1: {mem_gb()}")

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    loss = float(metrics["total_loss"])
    dt = (time.perf_counter() - t0) / steps
    say(f"steady state: {dt * 1e3:.0f} ms/step "
        f"({bs / dt:.2f} crops/s train)  total_loss={loss:.4f}")
    say(f"peak: {mem_gb()}")
    return dt * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=1)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--opt", default="adafactor")
    ap.add_argument("--mu-dtype", default="bfloat16")
    ap.add_argument("--no-momentum", action="store_true",
                    help="classic Adafactor: drop the first-moment buffer "
                         "(-1.7GB on the flagship)")
    ap.add_argument("--frozen-bf16", action="store_true",
                    help="store the frozen (non-trainable: VAE/CLIP) params "
                         "in bf16 (~-0.4GB; compute is bf16 anyway)")
    ap.add_argument("--xla-opt", action="append", default=[],
                    help="per-compile XLA option key=value (repeatable)")
    args = ap.parse_args()
    run_probe(
        bs=args.bs, steps=args.steps, opt=args.opt, mu_dtype=args.mu_dtype,
        no_momentum=args.no_momentum, frozen_bf16=args.frozen_bf16,
        xla_opts=(dict(kv.split("=", 1) for kv in args.xla_opt)
                  if args.xla_opt else None),
        # CLI keeps the historical behavior: MADM_ASPP_SCAN is the caller's
        # choice (the r4 probe matrix swept it explicitly)
        aspp_scan=False,
    )


if __name__ == "__main__":
    main()
