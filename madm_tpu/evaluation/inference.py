"""Inference drivers: single-pass eval + batched sliding-window inference.

Reference behavior being reproduced:

- ``inference_on_dataset`` (``evaluation/evaluator.py:14-133``): eval loop
  with warmup-aware data/compute timing, feeding the evaluator per image.
- sliding-window (``feature_extractor.py:199-278``): 3 fixed 512x512 crops
  over a 512x1024 image — (0,512,0,512), (0,512,256,768), (0,512,512,1024) —
  features accumulated into full-size canvases and count-normalized, then the
  head runs once on the stitched features.

TPU-first differences: the reference loops crops sequentially in Python; here
the crops are **batched into one backbone forward** (they are independent
until the accumulate), and the accumulate is a static-slice add inside the
same jit.  Eval shapes are static per dataset (512x512 resize or 448x640
DSEC natives, both 64-divisible), so each dataset compiles exactly one
program.
"""

from __future__ import annotations

import logging
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.daformer import resize_bilinear

logger = logging.getLogger(__name__)

SLIDE_WINDOWS = ((0, 512, 0, 512), (0, 512, 256, 768), (0, 512, 512, 1024))


def pad_to_divisible(img: jnp.ndarray, divisor: int = 64):
    """Zero-pad NHWC to divisor-multiple (reference ImageList.from_tensors)."""
    b, h, w, c = img.shape
    ph = (divisor - h % divisor) % divisor
    pw = (divisor - w % divisor) % divisor
    if ph or pw:
        img = jnp.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return img, (h, w)


def make_eval_fn(model, lora_name: Optional[str] = None,
                 eval_with_noise: Optional[int] = None):
    """Jitted single-pass eval: [B,H,W,3] in [0,1] -> argmax ids [B,H,W]."""

    @jax.jit
    def eval_fn(variables, image):
        padded, (h, w) = pad_to_divisible(image)
        logits = model.eval_forward(variables, padded, lora_name=lora_name,
                                    eval_with_noise=eval_with_noise)
        return jnp.argmax(logits[:, :h, :w], axis=-1).astype(jnp.int32)

    return eval_fn


def make_slide_eval_fn(model, lora_name: Optional[str] = None,
                       windows=SLIDE_WINDOWS):
    """Jitted sliding-window eval for [B, 512, 1024, 3] images.

    Batches the crops ([B*n_win, 512, 512, 3]) through one backbone pass and
    stitches per-scale features before a single head pass.
    """
    strides = model._strides()
    out_features = model.cfg.out_features

    @jax.jit
    def eval_fn(variables, image):
        b, h, w, _ = image.shape
        crops = jnp.concatenate(
            [image[:, y1:y2, x1:x2] for (y1, y2, x1, x2) in windows], axis=0
        )
        feats = model.backbone_forward(
            variables, crops, input_modal="others", lora_name=lora_name
        )["output_features"]

        stitched = {}
        for name, stride in zip(out_features, strides):
            f = feats[name]  # [B*n_win, 512/s, 512/s, C]
            canvas = jnp.zeros((b, h // stride, w // stride, f.shape[-1]), f.dtype)
            count = jnp.zeros((b, h // stride, w // stride, 1), f.dtype)
            for wi, (y1, y2, x1, x2) in enumerate(windows):
                fy1, fy2 = y1 // stride, y2 // stride
                fx1, fx2 = x1 // stride, x2 // stride
                crop_f = f[wi * b : (wi + 1) * b]
                canvas = canvas.at[:, fy1:fy2, fx1:fx2].add(crop_f)
                count = count.at[:, fy1:fy2, fx1:fx2].add(1.0)
            stitched[name] = canvas / count
        # eval uses the target-modality head (mtmadise.py:685)
        logits = model.head_forward(variables, stitched, use_sec_modal=True)
        logits = resize_bilinear(logits.astype(jnp.float32), (h, w))
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    return eval_fn


def inference_on_dataset(
    model,
    variables,
    loader,
    evaluator,
    lora_name: Optional[str] = None,
    slide_inference: bool = False,
    eval_with_noise: Optional[int] = None,
    warmup: int = 2,
) -> Dict:
    """Run eval over a TestLoader shard, feed the evaluator, return metrics.

    Logs data/compute split timing like the reference driver
    (``evaluation/evaluator.py:56-132``)."""
    eval_fn = (
        make_slide_eval_fn(model, lora_name)
        if slide_inference
        else make_eval_fn(model, lora_name, eval_with_noise)
    )
    evaluator.reset()
    total = len(loader)
    t_data = t_compute = 0.0
    last = time.perf_counter()

    # pipelined loop: dispatch image i+1 before fetching prediction i, so
    # host decode + conf-matrix accumulation overlap device compute (jax
    # dispatch is async; the fetch in np.asarray is the sync point).  The
    # reference loops strictly sequentially (evaluation/evaluator.py:79-102).
    pending = None  # (sample, device_pred)
    for i, sample in enumerate(loader):
        now = time.perf_counter()
        t_data += now - last
        dev_pred = eval_fn(variables, jnp.asarray(sample["target_second_modality"]))
        if pending is not None:
            prev_sample, prev_pred = pending
            evaluator.process(prev_sample, np.asarray(prev_pred[0]))
        pending = (sample, dev_pred)
        now2 = time.perf_counter()
        t_compute += now2 - now
        last = time.perf_counter()
        if i == warmup - 1:  # exclude compile from steady-state stats
            t_data = t_compute = 0.0
        if (i + 1) % 100 == 0 or i + 1 == total:
            done = i + 1 - warmup
            if done > 0:
                eta = (total - i - 1) * (t_compute + t_data) / done
                logger.info(
                    f"inference {i + 1}/{total} "
                    f"compute {t_compute / done:.3f}s/iter "
                    f"data {t_data / done:.3f}s/iter eta {eta:.0f}s"
                )
    if pending is not None:
        prev_sample, prev_pred = pending
        evaluator.process(prev_sample, np.asarray(prev_pred[0]))
    return evaluator.evaluate()
