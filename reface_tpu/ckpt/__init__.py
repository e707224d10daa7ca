from reface_tpu.ckpt.convert import (
    convert_arcface,
    convert_clip_conditioner,
    convert_reface_checkpoint,
    convert_safety_checker,
    convert_unet,
    convert_vae,
    load_torch_state_dict,
)
from reface_tpu.ckpt.io import (
    load_params,
    load_train_state,
    save_params,
    save_train_state,
)

__all__ = [
    "convert_arcface",
    "convert_clip_conditioner",
    "convert_reface_checkpoint",
    "convert_safety_checker",
    "convert_unet",
    "convert_vae",
    "load_torch_state_dict",
    "load_params",
    "load_train_state",
    "save_params",
    "save_train_state",
]
