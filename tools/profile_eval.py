"""Profile the eval crop pipeline on the real TPU and print a per-op summary.

Usage: python tools/profile_eval.py [--bs 8] [--module head|all]
Parses the trace's device lanes (process_name containing 'TPU') and groups
op time by the op_name's source module.
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


def run(bs: int, trace_dir: str, attention: str):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from madm_tpu.models.madm import MADM, MADMConfig
    from madm_tpu.ops.attention import set_default_attention_impl

    if attention:
        set_default_attention_impl(attention)
    model = MADM(MADMConfig())
    variables = model.init_params(jax.random.PRNGKey(0))

    @jax.jit
    def eval_fn(variables, images):
        return model.eval_forward_ids(variables, images).sum()

    images = jnp.zeros((bs, 512, 512, 3), jnp.float32)
    float(eval_fn(variables, images))  # compile
    float(eval_fn(variables, images))
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        outs = [eval_fn(variables, images) for _ in range(4)]
        for o in outs:
            float(o)
    dt = time.perf_counter() - t0
    print(f"# 4 iters bs={bs}: {dt:.3f}s wall, {bs * 4 / dt:.2f} crops/s")


def summarize(trace_dir: str, top: int = 40):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # find device lanes: pids whose process_name contains 'TPU'
    tpu_pids = set()
    for e in events:
        if e.get("name") == "process_name" and "TPU" in str(
            e.get("args", {}).get("name", "")
        ):
            tpu_pids.add(e["pid"])
    per_op = collections.Counter()
    per_mod = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        dur = e.get("dur", 0) / 1e6  # us -> s
        name = e.get("name", "")
        if name.startswith(("process_", "thread_")):
            continue
        args = e.get("args", {})
        if name.startswith("jit_") and "run_id" in args:
            continue  # whole-program envelope event, not an op
        total += dur
        per_op[name] += dur
        # newer profiler schema: 'tf_op' = the jit scope path
        # (jit(eval_fn)/Encoder/mid_block/...), 'source'/'source_stack' =
        # file:line; older traces used source_file/op_name/long_name
        src = str(args.get("source_file", "")) + str(args.get("source", ""))
        src += str(args.get("source_stack", ""))
        long_name = (str(args.get("long_name", ""))
                     + str(args.get("op_name", ""))
                     + str(args.get("tf_op", "")))
        mod = "other"
        for tag, label in (
            ("/Encoder/", "vae_encoder"), ("/Decoder/", "vae_decoder"),
            ("/UNet", "unet"), ("/CondUNet", "unet"),
            ("/DAFormerHead/", "head"),
            ("/MultiScaleProjection/", "projections"),
            ("flash_attention.py", "flash_attention"),
            ("aspp.py", "aspp_kernel"),
            ("vae.py", "vae"), ("unet.py", "unet"),
            ("daformer.py", "head"), ("projections.py", "projections"),
            ("fuse_layer", "head"), ("embed_", "head"),
            ("conv_seg", "head"), ("bottleneck", "head"),
        ):
            if tag in long_name or tag in src:
                mod = label
                break
        per_mod[mod] += dur
    print(f"\n## total device time: {total:.4f}s over 4 iters")
    print("\n## by module:")
    for mod, t in per_mod.most_common():
        print(f"  {mod:30s} {t:.4f}s  {100 * t / total:5.1f}%")
    print(f"\n## top {top} ops:")
    for name, t in per_op.most_common(top):
        print(f"  {t:.4f}s  {100 * t / total:5.1f}%  {name[:140]}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=8)
    p.add_argument("--trace-dir", default="/tmp/madm_trace")
    p.add_argument("--attention", default="")
    p.add_argument("--parse-only", action="store_true")
    args = p.parse_args()
    if not args.parse_only:
        os.makedirs(args.trace_dir, exist_ok=True)
        run(args.bs, args.trace_dir, args.attention)
    summarize(args.trace_dir)
