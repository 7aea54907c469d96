from . import criterion, ema, optimizer, train_step  # noqa: F401
from .train_step import (
    TrainConfig,
    TrainState,
    add_feature_distance_baseline,
    build_train_config,
    make_train_state,
    make_train_step,
)
from .optimizer import make_optimizer, split_trainable, merge_trainable

__all__ = [
    "criterion",
    "ema",
    "optimizer",
    "train_step",
    "TrainConfig",
    "add_feature_distance_baseline",
    "build_train_config",
    "TrainState",
    "make_train_state",
    "make_train_step",
    "make_optimizer",
    "split_trainable",
    "merge_trainable",
]
