"""Interleaved A/B of the eval head tail variants (MADM_ASPP_TAIL).

The tail = conv_seg + argmax after the fused-head bottleneck conv
(ops/aspp.py aspp_head_forward).  The r5 trace shows the 'nchw' tail at
11.4 ms/iter bs8 (conv_seg 2.3 + reduce_min 7.5 + eq 1.6) — XLA laid the
NCHW logits out with C minor this session, defeating the major-axis-reduce
intent.  This A/B measures all tails in one session (chip state drifts
~15% across sessions; only interleaved numbers are comparable).

Usage: python tools/ab_tail.py [--bs 8] [--iters 8] [--rounds 3]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--tails", default="nchw,pallas,xla")
    args = ap.parse_args()

    from madm_tpu.models.madm import MADM, MADMConfig

    model = MADM(MADMConfig())
    variables = model.init_params(jax.random.PRNGKey(0))
    images = jnp.zeros((args.bs, 512, 512, 3), jnp.float32)

    fns = {}
    preds = {}
    for tail in args.tails.split(","):
        os.environ["MADM_ASPP_TAIL"] = tail

        def make(tail):
            @jax.jit
            def f(v, x):
                p = model.eval_forward_ids(v, x)
                return p.sum(), p[0, ::97, ::97]

            return f

        fns[tail] = make(tail)
        t0 = time.perf_counter()
        s, pr = fns[tail](variables, images)
        float(s)
        preds[tail] = jax.device_get(pr)
        print(f"# {tail}: compile+warm {time.perf_counter() - t0:.0f}s",
              flush=True)
    os.environ.pop("MADM_ASPP_TAIL", None)

    # parity: identical argmax ids across tails
    import numpy as np

    base = args.tails.split(",")[0]
    for tail, pr in preds.items():
        same = np.array_equal(pr, preds[base])
        print(f"# parity {tail} vs {base}: {'OK' if same else 'MISMATCH'}")

    rates = {t: [] for t in fns}
    for r in range(args.rounds):
        for tail, f in fns.items():
            float(f(variables, images)[0])  # re-warm queue
            t0 = time.perf_counter()
            outs = [f(variables, images)[0] for _ in range(args.iters)]
            for o in outs:
                float(o)
            dt = time.perf_counter() - t0
            rate = args.bs * args.iters / dt
            rates[tail].append(rate)
            print(f"round {r} {tail:7s}: {rate:6.2f} crops/s "
                  f"({dt / args.iters * 1e3:.1f} ms/iter)", flush=True)
    print("\n== medians ==")
    for tail, rs in rates.items():
        rs = sorted(rs)
        print(f"{tail:7s}: {rs[len(rs) // 2]:6.2f} crops/s  (all: "
              + ", ".join(f"{x:.2f}" for x in rs) + ")")


if __name__ == "__main__":
    main()
