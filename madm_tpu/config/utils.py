"""Config utilities (reference: ``config/utils.py:4-66`` linear-scaling rule)."""

from __future__ import annotations

import copy


def auto_scale_workers(cfg, num_workers: int):
    """Scale batch size / lr / schedule by the world-size ratio.

    Mirrors the linear-scaling rule of ``config/utils.py:43-66`` in the
    reference: the config declares a reference world size
    ``cfg.train.reference_world_size``; when launched on ``num_workers``
    devices, total batch, lr, max_iter, eval/checkpoint periods are rescaled so
    the effective training run is equivalent.
    """
    old_world_size = cfg.train.get("reference_world_size", 0)
    if old_world_size == 0 or old_world_size == num_workers:
        return cfg
    cfg = copy.deepcopy(cfg)
    assert cfg.dataloader.train.total_batch_size % old_world_size == 0, (
        f"Invalid reference_world_size in config! "
        f"{cfg.dataloader.train.total_batch_size} % {old_world_size} != 0"
    )
    scale = num_workers / old_world_size
    bs = cfg.dataloader.train.total_batch_size = int(
        round(cfg.dataloader.train.total_batch_size * scale)
    )
    lr = cfg.optimizer.lr = cfg.optimizer.lr * scale
    max_iter = cfg.train.max_iter = int(round(cfg.train.max_iter / scale))
    cfg.train.eval_period = int(round(cfg.train.eval_period / scale))
    cfg.train.checkpointer.period = int(round(cfg.train.checkpointer.period / scale))
    cfg.train.reference_world_size = num_workers
    import logging

    logging.getLogger(__name__).info(
        f"Auto-scaling the config to batch_size={bs}, learning_rate={lr}, "
        f"max_iter={max_iter}."
    )
    return cfg
