from .evaluator import DSECSemSegEvaluator
from .inference import (
    inference_on_dataset,
    make_eval_fn,
    make_slide_eval_fn,
    pad_to_divisible,
)

__all__ = [
    "DSECSemSegEvaluator",
    "inference_on_dataset",
    "make_eval_fn",
    "make_slide_eval_fn",
    "pad_to_divisible",
]
