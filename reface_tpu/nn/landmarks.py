"""Batched on-device 68-landmark prediction.

The reference calls dlib's C++ HOG detector + ERT shape predictor *per image,
inside the training loop* (ldm/models/diffusion/ddpm.py:1068-1099 — a
GPU->CPU sync and Python loop on the hot path). The TPU-native replacement
is a small heatmap-based landmark CNN that runs batched on device; it is
distilled offline from dlib outputs so the 136-d conditioning vector matches
(SURVEY.md hard-part #1; tolerance documented there). A separate C++ ERT
evaluator (native/) covers exact-parity offline preprocessing.

Also includes the reference's auxiliary LandmarkDetectionModel head
(ddpm.py:163-177): conv(640->128) + maxpool + linear -> 136, applied to UNet
decoder features when Landmark_loss_weight > 0.

Output convention matches get_landmarks: (B, 136) float pixel coordinates
interleaved (x0, y0, x1, y1, ...) in input-image pixel space.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from reface_tpu.nn.layers import GroupNorm32

__all__ = ["LandmarkNetConfig", "LandmarkNet", "LandmarkAuxHead", "soft_argmax_2d"]


def soft_argmax_2d(heatmaps: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, K) heatmaps -> (B, K, 2) expected (x, y) in pixel units."""
    b, h, w, k = heatmaps.shape
    flat = heatmaps.reshape(b, h * w, k)
    prob = jax.nn.softmax(flat.astype(jnp.float32), axis=1)
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    grid_y = jnp.repeat(ys, w)
    grid_x = jnp.tile(xs, h)
    ex = jnp.einsum("bnk,n->bk", prob, grid_x)
    ey = jnp.einsum("bnk,n->bk", prob, grid_y)
    return jnp.stack([ex, ey], axis=-1)


@dataclasses.dataclass(frozen=True)
class LandmarkNetConfig:
    num_points: int = 68
    input_size: int = 256
    widths: tuple = (32, 64, 128, 256)
    dtype: jnp.dtype = jnp.bfloat16


class _Block(nn.Module):
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.out, (3, 3), strides=2, padding=1, dtype=self.dtype,
                    name="down")(x)
        h = GroupNorm32(num_groups=8, name="norm")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out, (3, 3), padding=1, dtype=self.dtype, name="conv")(h)
        h = GroupNorm32(num_groups=8, name="norm2")(h)
        return nn.silu(h)


class LandmarkNet(nn.Module):
    """(B, S, S, 3) in [-1,1] -> (B, 136) pixel coords at input scale.

    Heatmap head at 1/8 resolution + soft-argmax; fully batched, jittable,
    differentiable (usable both for inference and distillation training).
    """

    config: LandmarkNetConfig = LandmarkNetConfig()

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        s = x.shape[1]
        h = x.astype(cfg.dtype)
        for i, wdt in enumerate(cfg.widths):
            h = _Block(wdt, dtype=cfg.dtype, name=f"block_{i}")(h)
            if i == 2:
                feat8 = h
        # upsample deepest back to 1/8 and fuse
        h = jnp.repeat(jnp.repeat(h, 2, 1), 2, 2)
        h = jnp.concatenate([h, feat8], axis=-1)
        h = nn.Conv(cfg.widths[-1], (3, 3), padding=1, dtype=cfg.dtype,
                    name="fuse")(h)
        h = nn.silu(GroupNorm32(num_groups=8, name="fuse_norm")(h))
        heat = nn.Conv(cfg.num_points, (1, 1), dtype=jnp.float32, name="heat")(h)
        pts = soft_argmax_2d(heat)  # (B, 68, 2) at 1/8 scale
        scale = s / heat.shape[1]
        pts = pts * scale
        return pts.reshape(x.shape[0], cfg.num_points * 2)


class LandmarkAuxHead(nn.Module):
    """Parity with LandmarkDetectionModel (ddpm.py:163-177): UNet decoder
    features (B, 64, 64, 640) -> (B, 136)."""

    @nn.compact
    def __call__(self, feats):
        h = nn.Conv(128, (3, 3), padding=1, name="conv")(feats)
        h = nn.relu(h)
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = h.reshape(h.shape[0], -1)
        return nn.Dense(136, name="fc")(h)
