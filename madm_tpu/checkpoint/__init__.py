from .checkpointer import BestCheckpointer, Checkpointer, PeriodicCheckpointer
from .converter import (
    convert_madm_pth,
    convert_unet_state,
    convert_vae_state,
    load_sd_snapshot,
    load_torch_file,
    merge_into_variables,
)

__all__ = [
    "BestCheckpointer",
    "Checkpointer",
    "PeriodicCheckpointer",
    "convert_madm_pth",
    "convert_unet_state",
    "convert_vae_state",
    "load_sd_snapshot",
    "load_torch_file",
    "merge_into_variables",
]
