"""Interleaved A/B of the flash-attention head packing on the real chip.

Usage:  python tools/ab_flash_pack.py [--bwd] [--g 3] [--reps 4]

Measures the plain [B,H,S,D]-per-grid-step kernel against the packed-head
variant (``MADM_FLASH_PACK=auto``) at the UNet's dominant self-attention
shape (B=8 H=8 S=4096 D=40, bf16).  Timing fetches a device scalar after a
burst of dispatches — the tunneled chip's ``block_until_ready`` is a no-op
(CLAUDE.md).  Chip-state drifts ~15% across sessions: only the interleaved
numbers printed together are comparable.
"""
import argparse
import functools
import os
import sys
import time

os.environ["MADM_FLASH_PACK"] = "0"  # the plain path stays plain

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from madm_tpu.ops.flash_attention import (  # noqa: E402
    _flash_attention_bwd_impl,
    _flash_attention_fwd_impl,
    _packed_bwd_impl,
    _packed_fwd_impl,
)


def fetch(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(leaves[0].astype(jnp.float32)))


def timeit(fn, n):
    outs = [fn() for _ in range(3)]
    fetch(outs[-1])
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    fetch(outs[-1])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bwd", action="store_true", help="A/B the backward")
    ap.add_argument("--g", type=int, default=3)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--n", type=int, default=30)
    ap.add_argument("--shape", type=int, nargs=4, default=(8, 4096, 8, 40),
                    metavar=("B", "S", "H", "D"))
    args = ap.parse_args()

    b, s, h, d = args.shape
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    q, k, v, g = (jax.random.normal(kk, (b, s, h, d), jnp.bfloat16)
                  for kk in keys)
    scale = d ** -0.5

    if args.bwd:
        plain = lambda: _flash_attention_bwd_impl(q, k, v, g, scale=scale)
        packed = jax.jit(functools.partial(
            _packed_bwd_impl, q, k, v, g, scale, args.g))
        flops = (6 + 4 * args.g) * b * h * s * s * d
    else:
        plain = lambda: _flash_attention_fwd_impl(q, k, v, scale=scale)
        packed = jax.jit(functools.partial(
            _packed_fwd_impl, q, k, v, scale, args.g))
        flops = 4 * b * h * s * s * d

    print(f"compiling plain {'bwd' if args.bwd else 'fwd'}...", flush=True)
    t0 = time.perf_counter()
    r_plain = plain()
    print(f"  {time.perf_counter() - t0:.0f}s", flush=True)
    print(f"compiling packed g={args.g}...", flush=True)
    t0 = time.perf_counter()
    r_packed = packed()
    print(f"  {time.perf_counter() - t0:.0f}s", flush=True)

    pl_leaves = jax.tree_util.tree_leaves(r_plain)
    pk_leaves = jax.tree_util.tree_leaves(r_packed)
    err = max(float(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                    b_.astype(jnp.float32))))
              for a, b_ in zip(pl_leaves, pk_leaves))
    print(f"max |packed - plain|: {err:.5f}", flush=True)

    for rep in range(args.reps):
        tp = timeit(plain, args.n)
        tk = timeit(packed, args.n)
        print(f"rep{rep}: plain={tp:.3f}ms ({flops / tp / 1e9:.0f} GF/s)  "
              f"packed={tk:.3f}ms ({flops / tk / 1e9:.0f} GF/s)  "
              f"speedup={tp / tk:.2f}x", flush=True)


if __name__ == "__main__":
    main()
