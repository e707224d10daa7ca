"""Eval-model backbones: torchvision-style ResNet-50, Hopenet, D3DFR coeffs.

Parity targets (semantics, not code):
  - Hopenet: eval_tool/face_vid2vid/modules/hopenet.py — ResNet-50 trunk +
    three 66-bin fc heads (yaw/pitch/roll); angles decoded as
    sum(softmax(logits) * idx) * 3 - 99 degrees
    (eval_tool/Pose/pose_compare.py:101-177).
  - Deep3DFaceRecon coeff regressor: ResNet-50 variant -> 257 BFM
    coefficients; the Expression metric needs only exp = coeffs[80:144]
    (Deep3DFaceRecon_pytorch_edit/models/facerecon_model.py:136-146). The
    CUDA rasterizer is NOT needed for coeff extraction (SURVEY.md §2.6).

TPU notes: frozen inference BatchNorm; NHWC bf16-capable; both heads are
plain dense layers over pooled features.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from reface_tpu.nn.arcface import BatchNormInference

__all__ = ["ResNet50", "Hopenet", "FaceReconCoeffNet", "decode_hopenet_angles"]


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        h = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = nn.relu(BatchNormInference(self.planes, name="bn1")(h))
        h = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = nn.relu(BatchNormInference(self.planes, name="bn2")(h))
        h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = BatchNormInference(out_ch, name="bn3")(h)
        if x.shape[-1] != out_ch or self.stride != 1:
            x = nn.Conv(out_ch, (1, 1), strides=self.stride, use_bias=False,
                        dtype=self.dtype, name="down_conv")(x)
            x = BatchNormInference(out_ch, name="down_bn")(x)
        return nn.relu(x + h)


class ResNet50(nn.Module):
    """Returns pooled (B, 2048) features. layers = (3, 4, 6, 3)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        h = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=dt, name="conv1")(x.astype(dt))
        h = nn.relu(BatchNormInference(64, name="bn1")(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for li, (planes, blocks, stride) in enumerate(
            [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]
        ):
            for b in range(blocks):
                h = Bottleneck(planes, stride if b == 0 else 1, dtype=dt,
                               name=f"layer{li+1}_{b}")(h)
        return jnp.mean(h.astype(jnp.float32), axis=(1, 2))


class Hopenet(nn.Module):
    """(B, 224, 224, 3) ImageNet-normalized -> (yaw, pitch, roll) logits."""

    num_bins: int = 66
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = ResNet50(dtype=self.dtype, name="trunk")(x)
        yaw = nn.Dense(self.num_bins, name="fc_yaw")(f)
        pitch = nn.Dense(self.num_bins, name="fc_pitch")(f)
        roll = nn.Dense(self.num_bins, name="fc_roll")(f)
        return yaw, pitch, roll


def decode_hopenet_angles(logits: jnp.ndarray) -> jnp.ndarray:
    """66-bin logits -> degrees via expectation: sum(p*i)*3 - 99."""
    p = jnp.asarray(logits)
    p = jnp.exp(p - p.max(axis=-1, keepdims=True))
    p = p / p.sum(axis=-1, keepdims=True)
    idx = jnp.arange(p.shape[-1], dtype=jnp.float32)
    return jnp.sum(p * idx, axis=-1) * 3.0 - 99.0


class FaceReconCoeffNet(nn.Module):
    """(B, 224, 224, 3) in [0,1] -> (B, 257) BFM coefficients.

    Coefficient layout (facerecon_model.py:136-146):
      id [0:80], exp [80:144], tex [144:224], angle [224:227],
      gamma [227:254], translation [254:257].
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = ResNet50(dtype=self.dtype, name="trunk")(x)
        return nn.Dense(257, name="fc")(f)

    @staticmethod
    def split_coeffs(coeffs: jnp.ndarray) -> dict:
        return {
            "id": coeffs[:, :80],
            "exp": coeffs[:, 80:144],
            "tex": coeffs[:, 144:224],
            "angle": coeffs[:, 224:227],
            "gamma": coeffs[:, 227:254],
            "trans": coeffs[:, 254:257],
        }
