"""ArcFace IR-SE-50 identity encoder, TPU-native (flax.linen, NHWC).

Behavioral parity target (semantics, not code):
  /root/reference/src/Face_models/encoders/model_irse.py:9-69 and
  helpers.py:56-121 — input 112x112, stem conv3x3(64)+BN+PReLU, 4 stages of
  IR-SE bottlenecks (depths 64/128/256/512, units 3/4/14/3, stride 2 at each
  stage head), output BN -> flatten -> Linear(512*7*7, 512) -> BN1d, then
  l2-normalization.

Also implements the IDLoss crop protocol (ldm/models/diffusion/ddpm.py:112-124):
  un-CLIP-normalize -> [-1,1]-normalize -> resize 256 -> crop [35:223, 32:220]
  -> resize 112 -> backbone, so identity features match the reference's.

TPU notes: BatchNorm is folded to inference scale/bias form (the tower is
frozen in every reference code path); PReLU is a per-channel leaky max;
everything is NHWC bf16-friendly with fp32 normalization.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["ArcFaceConfig", "IRSE50", "arcface_preprocess_from_clip", "ARC_FACE_CROP"]

# (top, bottom, left, right) crop applied on the 256x256 face pool.
ARC_FACE_CROP = (35, 223, 32, 220)


@dataclasses.dataclass(frozen=True)
class ArcFaceConfig:
    depths: Sequence[int] = (64, 128, 256, 512)
    units: Sequence[int] = (3, 4, 14, 3)
    embed_dim: int = 512
    dtype: jnp.dtype = jnp.bfloat16


class BatchNormInference(nn.Module):
    """Frozen BatchNorm: y = (x - mean) / sqrt(var+eps) * gamma + beta.

    Stored as four vectors so torch running stats convert directly.
    """

    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        shape = (self.features,)
        gamma = self.param("scale", nn.initializers.ones, shape)
        beta = self.param("bias", nn.initializers.zeros, shape)
        mean = self.param("mean", nn.initializers.zeros, shape)
        var = self.param("var", nn.initializers.ones, shape)
        x32 = x.astype(jnp.float32)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon) * gamma + beta
        return y.astype(x.dtype)


class PReLU(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (self.features,))
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


class SEModule(nn.Module):
    channels: int
    reduction: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)
        s = nn.Conv(max(1, self.channels // self.reduction), (1, 1), use_bias=False,
                    dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype, name="fc2")(s)
        return x * nn.sigmoid(s.astype(jnp.float32)).astype(x.dtype)


class BottleneckIRSE(nn.Module):
    depth: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        if in_ch == self.depth:
            # MaxPool2d(1, stride): identity for stride 1, strided subsample else.
            shortcut = x if self.stride == 1 else x[:, :: self.stride, :: self.stride, :]
        else:
            shortcut = nn.Conv(self.depth, (1, 1), strides=self.stride, use_bias=False,
                               dtype=self.dtype, name="shortcut_conv")(x)
            shortcut = BatchNormInference(self.depth, name="shortcut_bn")(shortcut)
        h = BatchNormInference(in_ch, name="bn0")(x)
        h = nn.Conv(self.depth, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="conv1")(h)
        h = PReLU(self.depth, name="prelu")(h)
        h = nn.Conv(self.depth, (3, 3), strides=self.stride, padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = BatchNormInference(self.depth, name="bn2")(h)
        h = SEModule(self.depth, dtype=self.dtype, name="se")(h)
        return h + shortcut


class IRSE50(nn.Module):
    """Returns l2-normalized 512-d identity embedding for 112x112 NHWC input.

    multi_scale=True additionally returns l2-normalized flattened activations
    after body blocks 2/6/20/23 (parity: model_irse.py:47-68).
    """

    config: ArcFaceConfig = ArcFaceConfig()

    @nn.compact
    def __call__(self, x, multi_scale: bool = False):
        cfg = self.config
        dt = cfg.dtype
        x = x.astype(dt)
        h = nn.Conv(64, (3, 3), padding=1, use_bias=False, dtype=dt, name="input_conv")(x)
        h = BatchNormInference(64, name="input_bn")(h)
        h = PReLU(64, name="input_prelu")(h)

        taps = {}
        idx = 0
        for depth, units in zip(cfg.depths, cfg.units):
            for u in range(units):
                stride = 2 if u == 0 else 1
                h = BottleneckIRSE(depth, stride, dtype=dt, name=f"body_{idx}")(h)
                if idx in (2, 6, 20, 23):
                    taps[idx] = h
                idx += 1

        h = BatchNormInference(cfg.depths[-1], name="output_bn")(h)
        h = h.astype(jnp.float32).reshape(h.shape[0], -1)
        h = nn.Dense(cfg.embed_dim, dtype=jnp.float32, name="output_fc")(h)
        # BatchNorm1d(affine=True) on the embedding
        h = BatchNormInference(cfg.embed_dim, name="output_bn1d")(h)

        def l2n(v):
            v = v.astype(jnp.float32).reshape(v.shape[0], -1)
            return v / jnp.linalg.norm(v, axis=1, keepdims=True)

        if multi_scale:
            return [l2n(taps[i]) for i in sorted(taps)] + [l2n(h)]
        return l2n(h)


# CLIP normalization constants (used to undo CLIP preprocessing).
# numpy, not jnp: module import must not initialize a JAX backend (the
# sitecustomize pins the axon TPU plugin, so an import-time jnp.array
# would open the tunnel before callers can select a platform).
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def arcface_preprocess_from_clip(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP-normalized (B,224,224,3) -> ArcFace (B,112,112,3) input.

    Parity with IDLoss.extract_feats (ddpm.py:112-124): un-CLIP-norm to [0,1],
    renorm to [-1,1], adaptive-avg-pool to 256, crop [35:223,32:220],
    adaptive-avg-pool to 112 (exact AdaptiveAvgPool2d semantics).
    """
    from reface_tpu.ops.pooling import adaptive_avg_pool2d

    x = x * CLIP_STD + CLIP_MEAN  # back to [0,1]
    x = x * 2.0 - 1.0
    x = adaptive_avg_pool2d(x, 256, 256)
    t, b, l, r = ARC_FACE_CROP
    x = x[:, t:b, l:r, :]
    return adaptive_avg_pool2d(x, 112, 112)
