from reface_tpu.nn.unet import UNetConfig, UNetModel
from reface_tpu.nn.vae import SD_SCALE_FACTOR, AutoencoderKL, VAEConfig
from reface_tpu.nn.clip import CLIPConditioner, CLIPVisionConfig, CLIPVisionTower
from reface_tpu.nn.arcface import ArcFaceConfig, IRSE50, arcface_preprocess_from_clip
from reface_tpu.nn.conditioner import ConditionerConfig, REFaceConditioner
from reface_tpu.nn.bisenet import BiSeNet, BiSeNetConfig, parse_faces
from reface_tpu.nn.landmarks import LandmarkAuxHead, LandmarkNet, LandmarkNetConfig

__all__ = [
    "UNetConfig",
    "UNetModel",
    "SD_SCALE_FACTOR",
    "AutoencoderKL",
    "VAEConfig",
    "CLIPConditioner",
    "CLIPVisionConfig",
    "CLIPVisionTower",
    "ArcFaceConfig",
    "IRSE50",
    "arcface_preprocess_from_clip",
    "ConditionerConfig",
    "REFaceConditioner",
    "BiSeNet",
    "BiSeNetConfig",
    "parse_faces",
    "LandmarkAuxHead",
    "LandmarkNet",
    "LandmarkNetConfig",
]
