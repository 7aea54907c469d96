"""END-TO-END eval throughput on the real chip — loader + device + evaluator.

The headline bench (bench.py) measures the device pass on zeros; the real
eval pipeline adds host-side PNG decode (1-core host, native C++ loader),
resize, and the evaluator's conf-matrix bincount.  This measures
``inference_on_dataset`` over N synthetic 512x512 images end-to-end and
reports the data/compute split the way the reference driver logs it
(``/root/reference/evaluation/evaluator.py:41-133``).

Usage: python tools/e2e_eval_bench.py [--n 200] [--batch 8] [--classes 19]
       (--batch 1 reproduces the reference's batch-1 protocol)
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

logging.basicConfig(level=logging.INFO)


def make_dataset(root: str, n: int, classes: int):
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    manifest = {"source_data": {"RGB": [], "label": []},
                "target_data": {"second_modality": [], "label": []}}
    for i in range(n):
        img = rng.integers(0, 255, (512, 512, 3), dtype=np.uint8)
        lbl = rng.integers(0, classes, (512, 512), dtype=np.uint8)
        Image.fromarray(img).save(f"{root}/img{i}.png")
        Image.fromarray(lbl).save(f"{root}/lbl{i}.png")
        manifest["target_data"]["second_modality"].append(f"img{i}.png")
        manifest["target_data"]["label"].append(f"lbl{i}.png")
    path = f"{root}/Synthetic_RGB_to_DSEC_Event_e2e.json"
    with open(path, "w") as f:
        json.dump(manifest, f)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--classes", type=int, default=19)
    ap.add_argument("--root", default="/tmp/madm_e2e_set")
    args = ap.parse_args()

    from madm_tpu.data import CrossModalityDataset, TestLoader
    from madm_tpu.evaluation import DSECSemSegEvaluator, inference_on_dataset
    from madm_tpu.models.madm import MADM, MADMConfig

    t0 = time.perf_counter()
    json_path = make_dataset(args.root, args.n, args.classes)
    print(f"dataset: {args.n} imgs in {time.perf_counter() - t0:.0f}s")

    dataset = CrossModalityDataset(
        json_path=json_path, target_root_path=args.root,
        train_or_test="test", test_resize_h_w=[512, 512],
    )
    loader = TestLoader(dataset)
    evaluator = DSECSemSegEvaluator(
        stuff_classes=[f"c{i}" for i in range(args.classes)],
        ignore_label=255,
    )
    model = MADM(MADMConfig(num_classes=args.classes))
    variables = model.init_params(jax.random.PRNGKey(0))

    t0 = time.perf_counter()
    metrics = inference_on_dataset(
        model, variables, loader, evaluator, batch=args.batch,
        warmup=2,
    )
    wall = time.perf_counter() - t0
    # first 2 groups are warmup (compile); steady rate excludes them
    steady_n = args.n - 2 * args.batch
    print(f"\ne2e: {args.n} imgs in {wall:.1f}s wall "
          f"({args.n / wall:.2f} crops/s incl. compile)")
    print(f"mIoU={metrics['sem_seg']['mIoU']:.2f} (synthetic labels)")
    print("steady-state data/compute split is in the inference log above "
          f"(per-group of {args.batch}); steady imgs={steady_n}")


if __name__ == "__main__":
    main()
