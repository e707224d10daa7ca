from reface_tpu.eval.fid import CLIP_B32, clip_features, clip_fid, frechet_distance
from reface_tpu.eval.id_retrieval import embed_identities, id_retrieval_metrics
from reface_tpu.eval.pose import pose_angles, pose_l2
from reface_tpu.eval.expression import expression_coeffs, expression_l2
from reface_tpu.eval.backbones import (
    FaceReconCoeffNet,
    Hopenet,
    ResNet50,
    decode_hopenet_angles,
)

__all__ = [
    "CLIP_B32",
    "clip_features",
    "clip_fid",
    "frechet_distance",
    "embed_identities",
    "id_retrieval_metrics",
    "pose_angles",
    "pose_l2",
    "expression_coeffs",
    "expression_l2",
    "FaceReconCoeffNet",
    "Hopenet",
    "ResNet50",
    "decode_hopenet_angles",
]
