from .checkpointer import BestCheckpointer, Checkpointer, PeriodicCheckpointer
from .converter import (
    convert_madm_pth,
    convert_unet_state,
    convert_vae_state,
    LdmCheckpointer,
    convert_compvis_state,
    expand_conv_in,
    load_compvis_checkpoint,
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
    "LdmCheckpointer",
    "convert_compvis_state",
    "expand_conv_in",
    "load_compvis_checkpoint",
    "load_sd_snapshot",
    "load_torch_file",
    "merge_into_variables",
]
