from .scheduler import add_noise, alphas_cumprod, shared_noise
from .unet import UNet2DCondition
from .vae import Decoder as VAEDecoder
from .vae import Encoder as VAEEncoder
from .lora import init_lora, merge_lora, parse_lora_configs

__all__ = [
    "add_noise",
    "alphas_cumprod",
    "shared_noise",
    "UNet2DCondition",
    "VAEDecoder",
    "VAEEncoder",
    "init_lora",
    "merge_lora",
    "parse_lora_configs",
]
