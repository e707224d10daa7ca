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

__all__ = [
    "LandmarkNetConfig",
    "LandmarkNet",
    "LandmarkAuxHead",
    "soft_argmax_2d",
    "landmark_fn_from_net",
    "landmark_fn_from_rert",
    "landmark68_fn_from_rert",
]


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


def landmark_fn_from_net(net: "LandmarkNet", params, image_size: int):
    """Batched landmark-conditioning fn: (B,S,S,3) images in [-1,1] ->
    (B,136) pixel coords at `image_size` scale.

    This is the train/inference-time get_landmarks role (ddpm.py:1206 ->
    1068-1099): the reference loops dlib over the GT batch on the CPU every
    step; here it is one jitted device call.
    """
    s = net.config.input_size

    @jax.jit
    def fn(images_pm1):
        x = jax.image.resize(
            images_pm1, (images_pm1.shape[0], s, s, 3), "bilinear"
        )
        return net.apply(params, x) * (image_size / s)

    return fn


def landmark_fn_from_rert(path: str, image_size: int):
    """Host-side exact-ERT landmark fn over a batch of [-1,1] images.

    Uses the native C++ ERT cascade (dlib shape-predictor parity; see
    native/ and tools/convert_dlib_sp.py) with full-image boxes — the
    get_landmarks fallback box when detection fails (ddpm.py:1075-1082).
    """
    import numpy as np

    from reface_tpu import native_ops

    native_ops.ert_load(path)

    def fn(images_pm1):
        g = np.asarray(images_pm1, np.float32)
        gray = (g[..., 0] * 0.299 + g[..., 1] * 0.587 + g[..., 2] * 0.114)
        gray = np.clip((gray + 1.0) * 127.5, 0, 255).astype(np.uint8)
        b, h, w = gray.shape
        boxes = np.tile(
            np.array([0, 0, w - 1, h - 1], np.float32), (b, 1)
        )
        lm = native_ops.ert_predict_batch(gray, boxes).reshape(b, 136)
        return lm * (image_size / w)

    return fn


def landmark68_fn_from_rert(path: str):
    """Host-side exact-ERT landmark fn for the RAW pipeline.

    (B,H,W,3) images in [0,1] (np or device arrays) -> (B,68,2) np.float32
    pixel coords at the INPUT scale — the drop-in exact-parity replacement
    for RawSwapPipeline.detect_landmarks' LandmarkNet (dlib predictor
    semantics with the full-image fallback box, ddpm.py:1075-1082; every
    reference inference flow feeds dlib landmarks to alignment and the
    136-d conditioning, one_inference.py:532-541). Runs on the host via
    the native C++ ERT cascade at the image's native resolution — no
    resize, no scale-back."""
    import numpy as np

    from reface_tpu import native_ops

    native_ops.ert_load(path)

    def fn(images01):
        g = np.asarray(images01, np.float32)
        gray = (g[..., 0] * 0.299 + g[..., 1] * 0.587 + g[..., 2] * 0.114)
        gray = np.clip(gray * 255.0, 0, 255).astype(np.uint8)
        b, h, w = gray.shape
        boxes = np.tile(
            np.array([0, 0, w - 1, h - 1], np.float32), (b, 1)
        )
        return native_ops.ert_predict_batch(gray, boxes).reshape(b, 68, 2)

    return fn


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
