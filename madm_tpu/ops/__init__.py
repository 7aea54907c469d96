from .attention import dot_product_attention, set_default_attention_impl, get_default_attention_impl

__all__ = [
    "dot_product_attention",
    "set_default_attention_impl",
    "get_default_attention_impl",
]
