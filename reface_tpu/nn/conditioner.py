"""REFace conditioning fusion: CLIP(src)+CLIP(tar) + ArcFace ID + landmarks.

Behavioral parity target (semantics, not code):
  /root/reference/ldm/models/diffusion/ddpm.py:872-1045 with the shipped
  config (configs/train.yaml:75-78): clip_weight=1, ID_weight=10,
  Landmarks_weight=0.05, weight_division=True, Source_CLIP_feat=True,
  Target_CLIP_feat=True, concat_feat=False, stack_feat=False.

    c_clip = proj_src(CLIP(ref224)) + proj_tgt(CLIP(clipnorm(resize(tar,224))))
    c_id   = ID_proj(ArcFace(ref))        # 512 -> 768
    c_lm   = lm_proj(landmarks)           # 136 -> 768 (raw 512px pixel coords)
    c      = (1*c_clip + 10*c_id + 0.05*c_lm) / 11.05      -> (B, 1, 768)

  CFG null token: trainable `learnable_vector` of shape (1,1,768)
  (ddpm.py:698), returned by `null_conditioning`.

The heavy towers (CLIP, ArcFace) are separate modules so the swap pipeline
can reuse their features; this module owns only the trainable projections.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import linen as nn

from reface_tpu.nn.arcface import ArcFaceConfig, IRSE50, arcface_preprocess_from_clip
from reface_tpu.nn.clip import CLIPConditioner, CLIPVisionConfig

__all__ = ["ConditionerConfig", "REFaceConditioner"]


@dataclasses.dataclass(frozen=True)
class ConditionerConfig:
    clip_weight: float = 1.0
    id_weight: float = 10.0
    landmark_weight: float = 0.05
    weight_division: bool = True
    landmark_cond: bool = True
    context_dim: int = 768
    landmark_dim: int = 136
    clip: CLIPVisionConfig = CLIPVisionConfig()
    arcface: ArcFaceConfig = ArcFaceConfig()


class REFaceConditioner(nn.Module):
    """Produces the (B, 1, 768) cross-attention context and the CFG null token."""

    config: ConditionerConfig = ConditionerConfig()

    def setup(self):
        cfg = self.config
        d = cfg.context_dim
        self.clip_embed = CLIPConditioner(cfg.clip, name="clip_embed")
        self.face_id = IRSE50(cfg.arcface, name="face_id")
        self.proj_out_source = nn.Dense(d, name="proj_out_source")
        self.proj_out_target = nn.Dense(d, name="proj_out_target")
        self.id_proj_out = nn.Dense(d, name="id_proj_out")
        self.landmark_proj_out = nn.Dense(d, name="landmark_proj_out")
        self.learnable_vector = self.param(
            "learnable_vector", nn.initializers.normal(1.0), (1, 1, d)
        )

    def fuse(self, c_clip, c_id, c_lm=None):
        """Weighted fusion of already-projected (B,1,768) streams."""
        cfg = self.config
        total = cfg.clip_weight * c_clip + cfg.id_weight * c_id
        denom = cfg.clip_weight + cfg.id_weight
        if cfg.landmark_cond and c_lm is not None:
            total = total + cfg.landmark_weight * c_lm
            denom = denom + cfg.landmark_weight
        return total / denom if cfg.weight_division else total

    def __call__(self, ref_clip224, tar_clip224, landmarks=None):
        """ref/tar: (B,224,224,3) CLIP-normalized NHWC; landmarks: (B,136).

        The caller is responsible for producing tar_clip224 from the [-1,1]
        target image (un-norm -> CLIP-norm -> resize 224), matching
        ddpm.py:907-915. Source and target ride the CLIP tower as ONE 2B
        batch (identical numerics, one MXU program instead of two).
        """
        b = ref_clip224.shape[0]
        z = self.clip_embed(
            jnp.concatenate([ref_clip224, tar_clip224], axis=0)
        )
        c_src = self.proj_out_source(z[:b])
        c_tar = self.proj_out_target(z[b:])
        c_clip = c_src + c_tar

        id_in = arcface_preprocess_from_clip(ref_clip224)
        c_id = self.id_proj_out(self.face_id(id_in))[:, None, :]

        c_lm = None
        if self.config.landmark_cond and landmarks is not None:
            c_lm = self.landmark_proj_out(landmarks.astype(jnp.float32))[:, None, :]
        return self.fuse(c_clip, c_id, c_lm)

    def null_conditioning(self, batch: int):
        """CFG unconditional context (B, 1, 768)."""
        return jnp.broadcast_to(
            self.learnable_vector, (batch, 1, self.config.context_dim)
        )
