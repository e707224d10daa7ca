"""BiSeNet face parser (ResNet-18 context path), TPU-native flax NHWC.

Behavioral parity target (semantics, not code):
  /root/reference/pretrained/face_parsing/model.py:19-269 and resnet.py:20-90 —
  ResNet-18 backbone (feat8/16/32), AttentionRefinementModules + global
  context on the 16/32 features, FeatureFusion of feat8 with the refined
  context, 19-class output head, bilinear align_corners=True upsample to the
  input size. The spatial path is replaced by feat8 exactly as the reference
  does ("self.sp is deleted", model.py:241-246).

Wrapper parity: pretrained/face_parsing/face_parsing_demo.py:124-283 —
ImageNet-normalized 512x512 input, argmax over the main head, optional remap
to seg12 (reface_tpu.preprocess.masks.FACE_PARSING_TO_SEG12).

TPU notes: frozen inference BatchNorm (scale/bias/mean/var vectors), all
convs NHWC/bf16-capable; the global-average "attention" squeezes are tiny
VPU work; align-corners upsample implemented as a gather-free lerp.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from reface_tpu.nn.arcface import BatchNormInference

__all__ = ["BiSeNetConfig", "BiSeNet", "parse_faces", "SEG_MEAN", "SEG_STD",
           "resize_bilinear_align_corners"]

SEG_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
SEG_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclasses.dataclass(frozen=True)
class BiSeNetConfig:
    n_classes: int = 19
    stem: int = 64
    dtype: jnp.dtype = jnp.bfloat16


def resize_bilinear_align_corners(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear resize with align_corners=True (torch F.interpolate parity)."""
    b, ih, iw, c = x.shape
    ys = jnp.linspace(0.0, ih - 1.0, h)
    xs = jnp.linspace(0.0, iw - 1.0, w)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, ih - 1)
    x1 = jnp.minimum(x0 + 1, iw - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


class ConvBN(nn.Module):
    out: int
    ks: int = 3
    stride: int = 1
    relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.ks // 2
        h = nn.Conv(self.out, (self.ks, self.ks), strides=self.stride,
                    padding=pad, use_bias=False, dtype=self.dtype, name="conv")(x)
        h = BatchNormInference(self.out, name="bn")(h)
        return nn.relu(h) if self.relu else h


class BasicBlock(nn.Module):
    out: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.out, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = nn.relu(BatchNormInference(self.out, name="bn1")(h))
        h = nn.Conv(self.out, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = BatchNormInference(self.out, name="bn2")(h)
        if x.shape[-1] != self.out or self.stride != 1:
            x = nn.Conv(self.out, (1, 1), strides=self.stride, use_bias=False,
                        dtype=self.dtype, name="down_conv")(x)
            x = BatchNormInference(self.out, name="down_bn")(x)
        return nn.relu(x + h)


class Resnet18(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        h = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=dt, name="conv1")(x)
        h = nn.relu(BatchNormInference(64, name="bn1")(h))
        # MaxPool2d(3, 2, padding=1)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, (ch, stride) in enumerate([(64, 1), (128, 2), (256, 2), (512, 2)]):
            for j in range(2):
                h = BasicBlock(ch, stride if j == 0 else 1, dtype=dt,
                               name=f"layer{i+1}_{j}")(h)
            if ch == 128:
                feat8 = h
            elif ch == 256:
                feat16 = h
        return feat8, feat16, h


class ARM(nn.Module):
    """AttentionRefinementModule: conv-bn-relu then global sigmoid gate."""

    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = ConvBN(self.out, dtype=self.dtype, name="conv")(x)
        att = jnp.mean(feat.astype(jnp.float32), axis=(1, 2), keepdims=True)
        att = nn.Conv(self.out, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv_atten")(att.astype(feat.dtype))
        att = BatchNormInference(self.out, name="bn_atten")(att)
        return feat * nn.sigmoid(att.astype(jnp.float32)).astype(feat.dtype)


class FFM(nn.Module):
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, fsp, fcp):
        cat = jnp.concatenate([fsp, fcp], axis=-1)
        feat = ConvBN(self.out, ks=1, dtype=self.dtype, name="convblk")(cat)
        att = jnp.mean(feat.astype(jnp.float32), axis=(1, 2), keepdims=True)
        att = att.astype(feat.dtype)
        att = nn.Conv(self.out // 4, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(att)
        att = nn.relu(att)
        att = nn.Conv(self.out, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv2")(att)
        att = nn.sigmoid(att.astype(jnp.float32)).astype(feat.dtype)
        return feat * att + feat


class OutputHead(nn.Module):
    mid: int
    n_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = ConvBN(self.mid, dtype=self.dtype, name="conv")(x)
        return nn.Conv(self.n_classes, (1, 1), use_bias=False,
                       dtype=self.dtype, name="conv_out")(h)


class BiSeNet(nn.Module):
    config: BiSeNetConfig = BiSeNetConfig()

    @nn.compact
    def __call__(self, x, aux_heads: bool = False):
        """x: (B, H, W, 3) ImageNet-normalized. Returns (B, H, W, n_classes)
        logits (float32); aux_heads additionally returns the 16/32 heads."""
        cfg = self.config
        dt = cfg.dtype
        x = x.astype(dt)
        h0, w0 = x.shape[1:3]
        feat8, feat16, feat32 = Resnet18(dtype=dt, name="resnet")(x)

        avg = jnp.mean(feat32.astype(jnp.float32), axis=(1, 2), keepdims=True)
        avg = ConvBN(128, ks=1, dtype=dt, name="conv_avg")(avg.astype(dt))
        avg_up = jnp.broadcast_to(
            avg, (avg.shape[0],) + feat32.shape[1:3] + (128,)
        )
        f32 = ARM(128, dtype=dt, name="arm32")(feat32) + avg_up
        f32_up = jnp.repeat(jnp.repeat(f32, 2, 1), 2, 2)  # nearest to 1/16
        f32_up = ConvBN(128, dtype=dt, name="conv_head32")(f32_up)

        f16 = ARM(128, dtype=dt, name="arm16")(feat16) + f32_up
        f16_up = jnp.repeat(jnp.repeat(f16, 2, 1), 2, 2)  # nearest to 1/8
        f16_up = ConvBN(128, dtype=dt, name="conv_head16")(f16_up)

        fuse = FFM(256, dtype=dt, name="ffm")(feat8, f16_up)
        out = OutputHead(256, cfg.n_classes, dtype=dt, name="conv_out")(fuse)
        out = resize_bilinear_align_corners(out.astype(jnp.float32), h0, w0)
        if not aux_heads:
            return out
        out16 = OutputHead(64, cfg.n_classes, dtype=dt, name="conv_out16")(f16_up)
        out32 = OutputHead(64, cfg.n_classes, dtype=dt, name="conv_out32")(f32_up)
        out16 = resize_bilinear_align_corners(out16.astype(jnp.float32), h0, w0)
        out32 = resize_bilinear_align_corners(out32.astype(jnp.float32), h0, w0)
        return out, out16, out32


def parse_faces(model: BiSeNet, params, images01: jnp.ndarray,
                remap_lut=None) -> jnp.ndarray:
    """(B,H,W,3) images in [0,1] -> (B,H,W) int32 class map (19-class, or
    remapped through `remap_lut` e.g. FACE_PARSING_TO_SEG12)."""
    x = (images01 - SEG_MEAN) / SEG_STD
    logits = model.apply(params, x)
    classes = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if remap_lut is not None:
        classes = jnp.take(jnp.asarray(remap_lut, jnp.int32), classes)
    return classes
