from . import dacs, fda, palette  # noqa: F401
from .attention import (
    dot_product_attention,
    get_default_attention_impl,
    set_default_attention_impl,
)
from .flash_attention import flash_attention
from .group_norm import group_norm

__all__ = [
    "dacs",
    "fda",
    "palette",
    "dot_product_attention",
    "flash_attention",
    "group_norm",
    "set_default_attention_impl",
    "get_default_attention_impl",
]
