"""Headline benchmark: 512x512 seg crops/sec/chip through the MADM feature pass.

Measures the full inference crop pipeline — VAE encode -> UNet(t=0) with
feature taps -> VAE decode (s0) -> projections -> DAFormer head — on the real
TPU chip in bf16, sweeping batch sizes and reporting the best steady-state
throughput per chip.

Baseline note: the reference publishes accuracy only (SURVEY.md §6 — no
throughput numbers exist in XiaRho/MADM).  ``vs_baseline`` is computed
against an estimated 2xA100 reference rate for the same pass
(batch-1 torch eager fp16, ~80 ms/crop per GPU => ~12.5 crops/s/GPU), kept
fixed across rounds so the trend is comparable.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_CROPS_PER_SEC_PER_CHIP = 12.5  # estimated A100 batch-1 eager rate


def main():
    from madm_tpu.models.madm import MADM, MADMConfig

    model = MADM(MADMConfig())  # full SD-v1.4, bf16 compute
    variables = model.init_params(jax.random.PRNGKey(0))

    @jax.jit
    def eval_fn(variables, images):
        logits = model.eval_forward(variables, images)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    best = 0.0
    best_bs = 0
    for bs in (1, 2, 4, 8):
        try:
            images = jnp.zeros((bs, 512, 512, 3), jnp.float32)
            # compile + warmup
            eval_fn(variables, images).block_until_ready()
            eval_fn(variables, images).block_until_ready()
            iters = max(3, int(8 / bs))
            t0 = time.perf_counter()
            for _ in range(iters):
                out = eval_fn(variables, images)
            out.block_until_ready()
            dt = time.perf_counter() - t0
            rate = bs * iters / dt
            print(f"# bs={bs}: {rate:.2f} crops/s ({dt / iters * 1e3:.1f} ms/iter)",
                  file=sys.stderr)
            if rate > best:
                best, best_bs = rate, bs
        except Exception as e:  # OOM at large batch: keep best so far
            print(f"# bs={bs} failed: {type(e).__name__}: {e}", file=sys.stderr)
            break

    print(json.dumps({
        "metric": "512x512 seg crops/sec/chip (VAE+UNet feature pass + head)",
        "value": round(best, 3),
        "unit": f"crops/s/chip (best batch={best_bs}, bf16)",
        "vs_baseline": round(best / BASELINE_CROPS_PER_SEC_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
