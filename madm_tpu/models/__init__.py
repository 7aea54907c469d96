from . import sd  # noqa: F401
from .build import build_madm
from .daformer import DAFormerHead
from .madm import MADM, MADMConfig
from .projections import BottleneckBlock, MultiScaleProjection
from .segformer import SegFormerHead

__all__ = [
    "sd",
    "build_madm",
    "DAFormerHead",
    "SegFormerHead",
    "MADM",
    "MADMConfig",
    "BottleneckBlock",
    "MultiScaleProjection",
]
