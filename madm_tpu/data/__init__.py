from . import native  # noqa: F401
from .dataset import CrossModalityDataset, get_rcs_class_probs
from .multi_modality import MultiModalityDataset
from .loader import (
    TestLoader,
    TrainLoader,
    build_d2_test_dataloader,
    build_d2_train_dataloader,
)

__all__ = [
    "CrossModalityDataset",
    "MultiModalityDataset",
    "native",
    "get_rcs_class_probs",
    "TrainLoader",
    "TestLoader",
    "build_d2_train_dataloader",
    "build_d2_test_dataloader",
]
