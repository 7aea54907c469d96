"""Checkpoint save/resume (reference: ``checkpoint/odise_checkpointer.py``).

Orbax-backed, preserving the reference's key behaviors:

- **frozen-weight exclusion**: saved checkpoints contain the trainable
  subtree + EMA + trainer state (step, optimizer, BN stats) but NOT the
  frozen VAE — those re-materialize from the SD snapshot at load
  (``helper.py:35-36`` / ``odise_checkpointer.py:78-101``).
- ``resume_or_load(init_from, resume)``: resume from ``last_checkpoint`` in
  the output dir if present, else initialize from ``init_from`` (a released
  torch ``.pth`` via the converter, or another orbax dir)
  (``main.py:331-337``, ``odise_checkpointer.py:104-111``).
- ``PeriodicCheckpointer``: save every ``period`` iters, keep ``max_to_keep``
  (``config_files/common/train.py:15``).
- ``BestCheckpointer``: track a metric and keep the best (``main.py:318-320``).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


def _saveable(state) -> Dict[str, Any]:
    """TrainState -> dict without the frozen VAE params."""
    params = {k: v for k, v in state.params.items()
              if k not in ("vae_encoder", "vae_decoder")}
    return {
        "step": state.step,
        "params": params,
        "ema": state.ema,
        "state": state.state,
        "opt_state": state.opt_state,
    }


class Checkpointer:
    def __init__(self, save_dir: str):
        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.save_dir, name)

    def save(self, name: str, state) -> None:
        path = self._path(name)
        self._ckpt.save(path, _saveable(state), force=True)
        self._ckpt.wait_until_finished()
        with open(os.path.join(self.save_dir, "last_checkpoint"), "w") as f:
            f.write(name)
        logger.info(f"saved checkpoint {path}")

    def load(self, name: str, state):
        """Restore a checkpoint into ``state`` (frozen VAE kept from state)."""
        target = _saveable(state)
        target = jax.tree.map(np.asarray, target)
        restored = self._ckpt.restore(self._path(name), target)
        return state.replace(
            step=jax.numpy.asarray(restored["step"]),
            params={**state.params, **restored["params"]},
            ema=restored["ema"],
            state=restored["state"],
            opt_state=restored["opt_state"],
        )

    def has_checkpoint(self) -> bool:
        return os.path.exists(os.path.join(self.save_dir, "last_checkpoint"))

    def last_checkpoint(self) -> Optional[str]:
        p = os.path.join(self.save_dir, "last_checkpoint")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return f.read().strip()

    def resume_or_load(self, state, init_from: Optional[str] = None,
                       resume: bool = True, model=None):
        """reference ``resume_or_load`` semantics (``main.py:302,331``)."""
        if resume and self.has_checkpoint():
            name = self.last_checkpoint()
            logger.info(f"resuming from {name}")
            return self.load(name, state), True
        if init_from:
            logger.info(f"initializing from {init_from}")
            if os.path.isdir(init_from):
                # an orbax checkpoint: either a save dir (model_*/...) or an
                # output dir containing last_checkpoint
                src = Checkpointer(init_from)
                name = src.last_checkpoint()
                if name is not None:
                    return src.load(name, state), False
                if os.path.exists(os.path.join(init_from, "_METADATA")):
                    parent = Checkpointer(os.path.dirname(init_from.rstrip("/")))
                    return parent.load(os.path.basename(init_from.rstrip("/")), state), False
                raise FileNotFoundError(f"no orbax checkpoint under {init_from}")

            from .converter import convert_madm_pth, merge_into_variables

            converted = convert_madm_pth(init_from)
            variables = {
                "params": state.params, "ema": state.ema, "state": state.state,
            }
            merged = merge_into_variables(variables, converted)
            return state.replace(
                params=merged["params"], ema=merged["ema"], state=merged["state"]
            ), False
        return state, False


class PeriodicCheckpointer:
    def __init__(self, checkpointer: Checkpointer, period: int, max_iter: int,
                 max_to_keep: int = 1):
        self.ckpt = checkpointer
        self.period = period
        self.max_iter = max_iter
        self.max_to_keep = max_to_keep
        self._kept = []

    def step(self, iteration: int, state) -> None:
        it = iteration + 1
        if it % self.period != 0 and it != self.max_iter:
            return
        name = f"model_{iteration:07d}"
        self.ckpt.save(name, state)
        self._kept.append(name)
        while len(self._kept) > self.max_to_keep:
            old = self._kept.pop(0)
            path = self.ckpt._path(old)
            try:
                import shutil

                shutil.rmtree(path)
            except OSError:
                pass


class BestCheckpointer:
    def __init__(self, checkpointer: Checkpointer, metric: str = "mIoU",
                 mode: str = "max"):
        self.ckpt = checkpointer
        self.metric = metric
        self.mode = mode
        self.best = None

    def step(self, metrics: Dict[str, float], state) -> bool:
        value = metrics.get(self.metric)
        if value is None:
            return False
        better = self.best is None or (
            value > self.best if self.mode == "max" else value < self.best
        )
        if better:
            self.best = value
            self.ckpt.save("model_best", state)
            logger.info(f"new best {self.metric}={value:.4f}")
        return better
