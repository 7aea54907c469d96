"""Per-op profile of the UNet forward alone on the real TPU.

Round-2 verdict: the UNet runs 0.68 TFLOP in 8.6 ms/crop (~40% MFU) while
the head's conv fusion reaches 190 TF/s — this tool breaks the UNet time
down by op class (conv / attention matmuls / GN / GEGLU / copies) to find
the sub-roofline pieces.  Usage:

    python tools/profile_unet.py [--bs 8] [--attention pallas|xla]

Reference hot loop being profiled: ``ldm_diffusers.py:454-616``.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  __import__("os").path.join(
                      __import__("os").path.dirname(
                          __import__("os").path.abspath(__file__)),
                      "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp


def run(bs: int, trace_dir: str, attention: str, iters: int = 8):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from madm_tpu.models.madm import MADM, MADMConfig
    from madm_tpu.ops.attention import set_default_attention_impl

    if attention:
        set_default_attention_impl(attention)
    model = MADM(MADMConfig())
    variables = model.init_params(jax.random.PRNGKey(0))
    unet_params = variables["params"]["unet"]

    @jax.jit
    def unet_fn(p, latents, ctx):
        ts = jnp.zeros((latents.shape[0],), jnp.int32)
        eps, taps = model.unet.apply({"params": p}, latents, ts, ctx)
        return eps.sum() + sum(t.sum() for t in taps)

    latents = jnp.zeros((bs, 64, 64, 4), jnp.bfloat16)
    ctx = jnp.zeros((bs, 77, 768), jnp.bfloat16)
    float(unet_fn(unet_params, latents, ctx))  # compile (fetch syncs)
    float(unet_fn(unet_params, latents, ctx))
    t0 = time.perf_counter()
    outs = [unet_fn(unet_params, latents, ctx) for _ in range(iters)]
    for o in outs:
        float(o)
    dt = time.perf_counter() - t0
    print(f"# untraced: {iters} iters bs={bs}: {dt / iters * 1e3:.2f} ms/iter, "
          f"{dt / iters / bs * 1e3:.2f} ms/crop")
    with jax.profiler.trace(trace_dir):
        outs = [unet_fn(unet_params, latents, ctx) for _ in range(4)]
        for o in outs:
            float(o)


OP_CLASSES = (
    ("convolution", "conv"),
    ("dot", "matmul"),
    ("fusion", "fusion"),
    ("reduce", "reduce"),
    ("copy", "copy/layout"),
    ("transpose", "copy/layout"),
    ("all-", "collective"),
    ("dynamic", "slice/update"),
    ("concatenate", "concat"),
)


def summarize(trace_dir: str, top: int = 45):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    tpu_pids = set()
    for e in events:
        if e.get("name") == "process_name" and "TPU" in str(
            e.get("args", {}).get("name", "")
        ):
            tpu_pids.add(e["pid"])
    per_op = collections.Counter()
    per_class = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "")
        if name.startswith(("process_", "thread_")):
            continue
        dur = e.get("dur", 0) / 1e6
        total += dur
        per_op[name] += dur
        cls = "other"
        for pat, label in OP_CLASSES:
            if pat in name:
                cls = label
                break
        per_class[cls] += dur
    print(f"\n## total UNet device time: {total:.4f}s over 4 iters")
    print("\n## by op class:")
    for cls, t in per_class.most_common():
        print(f"  {cls:16s} {t:.4f}s  {100 * t / total:5.1f}%")
    print(f"\n## top {top} ops:")
    for name, t in per_op.most_common(top):
        print(f"  {t:.4f}s  {100 * t / total:5.1f}%  {name[:150]}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=8)
    p.add_argument("--trace-dir", default="/tmp/madm_unet_trace")
    p.add_argument("--attention", default="")
    p.add_argument("--parse-only", action="store_true")
    args = p.parse_args()
    if not args.parse_only:
        os.makedirs(args.trace_dir, exist_ok=True)
        run(args.bs, args.trace_dir, args.attention)
    summarize(args.trace_dir)
