"""Face alignment + inverse paste-back as batched on-device warps.

Behavioral parity targets (semantics, not code):
  - FFHQ-style oriented crop quad from 68 landmarks:
    src/utils/alignmengt.py:148-178 (eye/mouth anchors, x/y axes, center)
  - PIL QUAD bilinear crop to output_size: alignmengt.py:99-145 — replaced by
    a direct bilinear quad warp on device (no shrink/crop/pad staging, which
    only exist because PIL works on host images)
  - 8-param perspective solve for paste-back: alignmengt.py:266-276 and the
    Image.PERSPECTIVE + alpha_composite pipeline (one_inference.py:782-799) —
    replaced by an on-device homography warp + mask blend.

Layout: landmarks are (68, 2) float (x, y) pixel coords; images NHWC.
Everything is jit/vmap-friendly (fixed shapes, no host sync).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "compute_align_quad",
    "quad_crop",
    "calc_perspective_coeffs",
    "perspective_warp",
    "paste_back",
    "bilinear_sample",
]


def compute_align_quad(lm: jnp.ndarray, scale: float = 1.0):
    """68-landmark -> oriented crop quad (4,2), FFHQ semantics.

    Returns quad rows [c-x-y, c-x+y, c+x+y, c+x-y] (NW,SW,SE,NE for PIL QUAD).
    """
    eye_left = jnp.mean(lm[36:42], axis=0)
    eye_right = jnp.mean(lm[42:48], axis=0)
    eye_avg = (eye_left + eye_right) * 0.5
    eye_to_eye = eye_right - eye_left
    mouth_avg = (lm[48] + lm[54]) * 0.5
    eye_to_mouth = mouth_avg - eye_avg

    # x-axis: eye line, counter-rotated by the mouth direction
    flip = eye_to_mouth[::-1] * jnp.array([-1.0, 1.0])
    x = eye_to_eye - flip
    x = x / jnp.linalg.norm(x)
    x = x * jnp.maximum(
        jnp.linalg.norm(eye_to_eye) * 2.0, jnp.linalg.norm(eye_to_mouth) * 1.8
    )
    x = x * scale
    y = x[::-1] * jnp.array([-1.0, 1.0])
    c = eye_avg + eye_to_mouth * 0.1
    return jnp.stack([c - x - y, c - x + y, c + x + y, c + x - y])


def bilinear_sample(img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray):
    """Sample one HWC image at float pixel coords (edge-clamped bilinear)."""
    h, w, _ = img.shape
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = (xs - x0)[..., None]
    wy = (ys - y0)[..., None]

    def at(yy, xx):
        yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        return img[yi, xi]

    v00 = at(y0, x0)
    v01 = at(y0, x0 + 1)
    v10 = at(y0 + 1, x0)
    v11 = at(y0 + 1, x0 + 1)
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def quad_crop(img: jnp.ndarray, quad: jnp.ndarray, size: int) -> jnp.ndarray:
    """Crop an HWC image to size x size by bilinear interpolation of the quad.

    PIL QUAD semantics: output (u,v) in [0,1]^2 maps to the bilinear
    interpolation of the 4 quad corners (NW, SW, SE, NE order). The
    reference adds 0.5 px to the quad before PIL's transform; PIL then
    samples at integer output coordinates which correspond to pixel centers —
    net effect reproduced by sampling at (quad + 0.5) - 0.5 = quad.
    """
    u = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    v = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    vv, uu = jnp.meshgrid(v, u, indexing="ij")  # vv: down, uu: right
    nw, sw, se, ne = quad[0], quad[1], quad[2], quad[3]
    top = nw[None, None] * (1 - uu[..., None]) + ne[None, None] * uu[..., None]
    bot = sw[None, None] * (1 - uu[..., None]) + se[None, None] * uu[..., None]
    pts = top * (1 - vv[..., None]) + bot * vv[..., None]  # (S,S,2) x,y
    return bilinear_sample(img, pts[..., 0], pts[..., 1])


def calc_perspective_coeffs(src_pts, dst_pts) -> jnp.ndarray:
    """8 perspective coefficients mapping output coords -> source coords.

    Least-squares solve of the standard homography system (parity with
    alignmengt.py:266-276: pa=corners of the output, pb=quad in the original).
    """
    src = jnp.asarray(src_pts, jnp.float32)
    dst = jnp.asarray(dst_pts, jnp.float32)
    rows = []
    for i in range(4):
        x, y = src[i, 0], src[i, 1]
        u, v = dst[i, 0], dst[i, 1]
        rows.append(jnp.stack([x, y, 1.0, 0.0, 0.0, 0.0, -u * x, -u * y]))
        rows.append(jnp.stack([0.0, 0.0, 0.0, x, y, 1.0, -v * x, -v * y]))
    a = jnp.stack(rows)
    b = dst.reshape(-1)
    return jnp.linalg.solve(a.T @ a, a.T @ b)


def perspective_warp(img: jnp.ndarray, coeffs: jnp.ndarray, out_h: int, out_w: int):
    """Warp HWC image: out(x,y) = img((a x + b y + c)/(g x + h y + 1), ...)."""
    a, b, c, d, e, f, g, h8 = [coeffs[i] for i in range(8)]
    ys, xs = jnp.meshgrid(
        jnp.arange(out_h, dtype=jnp.float32),
        jnp.arange(out_w, dtype=jnp.float32),
        indexing="ij",
    )
    denom = g * xs + h8 * ys + 1.0
    sx = (a * xs + b * ys + c) / denom
    sy = (d * xs + e * ys + f) / denom
    return bilinear_sample(img, sx, sy)


def paste_back(
    original: jnp.ndarray,  # (H, W, 3) the uncropped frame, [0,1] or [-1,1]
    swapped_crop: jnp.ndarray,  # (S, S, 3) model output crop, same range
    quad: jnp.ndarray,  # (4, 2) the alignment quad in original coords
    crop_mask: jnp.ndarray | None = None,  # (S, S, 1) blend weight in crop space
) -> jnp.ndarray:
    """Composite the swapped crop back into the original frame.

    Equivalent of resize-to-1024 + Image.PERSPECTIVE(inverse coeffs) +
    alpha_composite (one_inference.py:782-799), as one on-device warp: the
    homography maps original-frame coords -> crop coords; alpha comes from
    the warped validity (and optional crop-space mask).
    """
    s = swapped_crop.shape[0]
    h, w, _ = original.shape
    # crop-corner convention matching quad_crop's pixel-center sampling:
    # quad NW corresponds to crop coordinate -0.5 (edge), SE to s-0.5.
    corners = jnp.array(
        [[-0.5, -0.5], [-0.5, s - 0.5], [s - 0.5, s - 0.5], [s - 0.5, -0.5]],
        jnp.float32,
    )
    # map original-frame pixel -> crop pixel: solve with (quad -> corners)
    coeffs = calc_perspective_coeffs(quad, corners)
    warped = perspective_warp(swapped_crop, coeffs, h, w)

    a, b, c, d, e, f, g, h8 = [coeffs[i] for i in range(8)]
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    denom = g * xs + h8 * ys + 1.0
    sx = (a * xs + b * ys + c) / denom
    sy = (d * xs + e * ys + f) / denom
    inside = (
        (sx >= -0.5) & (sx <= s - 0.5) & (sy >= -0.5) & (sy <= s - 0.5)
    ).astype(original.dtype)[..., None]
    alpha = inside
    if crop_mask is not None:
        m = perspective_warp(crop_mask, coeffs, h, w)
        alpha = alpha * m
    return original * (1 - alpha) + warped * alpha
