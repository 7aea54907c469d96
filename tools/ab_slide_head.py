"""On-chip check + A/B for the sliding-window eval head routing.

1. numeric: fused-head slide ids == plain-module-head slide ids on random
   input (the Pallas head must not change any argmax decision at 512x1024);
2. perf: interleaved A/B, fused vs plain slide pass.

Usage: python tools/ab_slide_head.py [--bs 1] [--iters 8]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=1)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from madm_tpu.models.madm import MADM, MADMConfig

    model = MADM(MADMConfig())
    variables = model.init_params(jax.random.PRNGKey(0))
    images = jax.random.uniform(
        jax.random.PRNGKey(1), (args.bs, 512, 1024, 3), jnp.float32
    )

    def slide_ids(variables, image, fused: bool):
        stitched = model.slide_backbone_forward(
            variables, image, input_modal="others"
        )["output_features"]
        if fused:
            return model.head_ids(variables, stitched, image.shape)
        logits = model.head_forward(variables, stitched, use_sec_modal=True)
        return model._ids_from_logits(logits, image.shape[1:3])

    fused_fn = jax.jit(lambda v, x: slide_ids(v, x, True))
    plain_fn = jax.jit(lambda v, x: slide_ids(v, x, False))

    t0 = time.perf_counter()
    ids_f = fused_fn(variables, images)
    sf = float(ids_f.sum())
    print(f"fused compile+run: {time.perf_counter() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    ids_p = plain_fn(variables, images)
    sp = float(ids_p.sum())
    print(f"plain compile+run: {time.perf_counter() - t0:.0f}s", flush=True)

    mism = int(jnp.sum(ids_f != ids_p))
    print(f"ids sums fused={sf} plain={sp}; mismatched px = {mism} "
          f"/ {ids_f.size}", flush=True)

    # interleaved A/B (chip state drifts across sessions; only interleaved
    # same-session comparisons are trustworthy — CLAUDE.md)
    def timed(fn):
        outs = [fn(variables, images) for _ in range(args.iters)]
        t0 = time.perf_counter()
        outs = [fn(variables, images) for _ in range(args.iters)]
        for o in outs:
            float(o.sum())
        return (time.perf_counter() - t0) / args.iters

    for rep in range(3):
        tf = timed(fused_fn)
        tp = timed(plain_fn)
        n = 3 * args.bs
        print(f"rep{rep}: fused {tf * 1e3:.1f} ms ({n / tf:.2f} crops/s)  "
              f"plain {tp * 1e3:.1f} ms ({n / tp:.2f} crops/s)  "
              f"speedup x{tp / tf:.3f}", flush=True)


if __name__ == "__main__":
    main()
