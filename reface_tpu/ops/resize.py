"""Bilinear resize with torch/cv2 semantics (half-pixel, NO antialias).

torchvision's Resize on tensors (as the reference uses for the 512->64 mask
downsample, ddpm.py:1215 / inference_test_bench.py:465) point-samples with
the half-pixel mapping and no antialias prefilter. jax.image.resize applies
an antialiasing kernel on downsample, which widens/softens mask edges — a
real numerics difference at 8x downsampling. This gather-lerp implementation
matches torch (and cv2.INTER_LINEAR / native rn_resize_bilinear) exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["resize_bilinear_no_aa"]


def resize_bilinear_no_aa(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """NHWC bilinear resize, align_corners=False, no antialias, edge clamp."""
    b, ih, iw, c = x.shape
    if (ih, iw) == (out_h, out_w):
        return x
    ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (ih / out_h) - 0.5
    xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (iw / out_w) - 0.5
    y0f = jnp.floor(ys)
    x0f = jnp.floor(xs)
    wy = (ys - y0f)[None, :, None, None]
    wx = (xs - x0f)[None, None, :, None]
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, ih - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, ih - 1)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, iw - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, iw - 1)
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy
