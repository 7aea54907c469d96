"""Interleaved A/B of MADM_FUSED_QKV on the full eval pass, real chip.

Usage:  python tools/ab_fused_qkv.py [--bs 8] [--reps 4] [--n 8]

``MADM_FUSED_QKV`` is read at *trace* time (sd/layers.py Attention), so one
process can compile both variants: set the env var right before the first
call of each jitted fn.  Timing fetches device scalars after a burst of
dispatches (tunneled block_until_ready is a no-op).  Only the interleaved
numbers printed together are comparable (chip-state drifts across sessions).
"""
import argparse
import os
import sys
import time

os.environ.setdefault("MADM_FUSED_QKV", "0")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--n", type=int, default=8)
    args = ap.parse_args()

    from madm_tpu.models.madm import MADM, MADMConfig

    model = MADM(MADMConfig())
    variables = model.init_params(jax.random.PRNGKey(0))
    images = jnp.zeros((args.bs, 512, 512, 3), jnp.float32)

    def make(fused: str):
        @jax.jit
        def eval_fn(variables, images):
            pred = model.eval_forward_ids(variables, images)
            return pred.sum()
        def run():
            os.environ["MADM_FUSED_QKV"] = fused  # read at trace time
            return eval_fn(variables, images)
        return run

    base, fused = make("0"), make("1")

    for name, fn in (("base", base), ("fused", fused)):
        print(f"compiling {name}...", flush=True)
        t0 = time.perf_counter()
        r = float(fn())
        print(f"  {time.perf_counter() - t0:.0f}s  sum={r}", flush=True)

    rb, rf = float(base()), float(fused())
    print(f"pred sums: base={rb} fused={rf} (argmax ids; equal => same preds)",
          flush=True)

    def timeit(fn):
        float(fn())
        t0 = time.perf_counter()
        outs = [fn() for _ in range(args.n)]
        for o in outs:
            float(o)
        return (time.perf_counter() - t0) / args.n * 1e3

    for rep in range(args.reps):
        tb = timeit(base)
        tf = timeit(fused)
        print(f"rep{rep}: base={tb:.1f}ms  fused={tf:.1f}ms  "
              f"speedup={tb / tf:.3f}x", flush=True)


if __name__ == "__main__":
    main()
