"""Host-side (numpy/cv2) augmentation utilities for the input pipeline.

Parity targets (semantics, not code):
  - decow TPS mask warp: ldm/data/celebA.py:83-95 (3x3 control grid, interior
    jitter U(-0.5,0.5)*scale, bilinear, zeros padding) — numpy TPS + cv2.remap
    so data workers never touch the accelerator.
  - reference-image augmentation: celebA.py:349-359 — resize 224, hflip p=.5,
    rotate +-20 deg, blur p=.3, elastic p=.3.
  - tensor conventions: get_tensor ([-1,1]) / get_tensor_clip (CLIP norm),
    celebA.py:196-229.

All images are HWC float32 numpy; RNG is an explicit np.random.Generator so
the pipeline is reproducible per (seed, index).
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

__all__ = [
    "CLIP_MEAN_NP",
    "CLIP_STD_NP",
    "to_tensor_pm1",
    "clip_normalize_np",
    "clip_unnormalize_np",
    "tps_warp_mask_np",
    "augment_reference_np",
]

CLIP_MEAN_NP = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD_NP = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def to_tensor_pm1(img_uint8: np.ndarray) -> np.ndarray:
    """HWC uint8 -> HWC float32 in [-1, 1]."""
    return img_uint8.astype(np.float32) / 127.5 - 1.0


def clip_normalize_np(img01: np.ndarray) -> np.ndarray:
    return (img01 - CLIP_MEAN_NP) / CLIP_STD_NP


def clip_unnormalize_np(img: np.ndarray) -> np.ndarray:
    return img * CLIP_STD_NP + CLIP_MEAN_NP


# ------------------------------------------------------------------ TPS

def _tps_kernel(r2: np.ndarray) -> np.ndarray:
    out = np.zeros_like(r2)
    nz = r2 > 1e-12
    out[nz] = r2[nz] * np.log(r2[nz])
    return out


def _tps_grid_np(ctrl: np.ndarray, warped: np.ndarray, h: int, w: int) -> np.ndarray:
    """(H, W, 2) sampling grid in [-1,1] mapping output -> input coords."""
    p = ctrl.shape[0]
    d = ctrl[:, None, :] - ctrl[None, :, :]
    k = _tps_kernel((d * d).sum(-1))
    pm = np.concatenate([np.ones((p, 1)), ctrl], axis=1)
    l = np.zeros((p + 3, p + 3))
    l[:p, :p] = k
    l[:p, p:] = pm
    l[p:, :p] = pm.T
    rhs = np.concatenate([warped, np.zeros((3, 2))], axis=0)
    q = np.linalg.solve(l, rhs)
    wgt, aff = q[:p], q[p:]

    ys, xs = np.meshgrid(
        np.linspace(-1, 1, h, dtype=np.float32),
        np.linspace(-1, 1, w, dtype=np.float32),
        indexing="ij",
    )
    pts = np.stack([xs.ravel(), ys.ravel()], -1)
    dd = pts[:, None, :] - ctrl[None, :, :]
    u = _tps_kernel((dd * dd).sum(-1))
    pmat = np.concatenate([np.ones((pts.shape[0], 1)), pts], axis=1)
    out = pmat @ aff + u @ wgt
    return out.reshape(h, w, 2).astype(np.float32)


def tps_warp_mask_np(
    mask: np.ndarray, rng: np.random.Generator, scale: float | None = None,
    grid_n: int = 3,
) -> np.ndarray:
    """decow parity: warp an (H, W) or (H, W, 1) mask with a jittered TPS."""
    squeeze = mask.ndim == 2
    m = mask if squeeze else mask[..., 0]
    h, w = m.shape
    if scale is None:
        scale = rng.uniform(0.5, 1.0)
    lin = np.linspace(-1, 1, grid_n)
    gy, gx = np.meshgrid(lin, lin, indexing="ij")
    ctrl = np.stack([gx.ravel(), gy.ravel()], -1)
    noise = (rng.random((grid_n - 2, grid_n - 2, 2)) - 0.5) * scale
    full = np.zeros((grid_n, grid_n, 2))
    full[1:-1, 1:-1] = noise
    warped = ctrl + full.reshape(-1, 2)
    # the C++ grid builder is ~50x faster than the numpy dense evaluation
    # at 512^2 (same math, cross-tested in tests/test_native.py; the TPS
    # grid dominated the per-item cost — tools/bench_loader.py)
    try:
        from reface_tpu import native_ops as _rn

        if _rn.available():
            grid = _rn.tps_grid(ctrl.astype(np.float32),
                                warped.astype(np.float32), h, w)
        else:
            grid = _tps_grid_np(ctrl, warped, h, w)
    except Exception:
        grid = _tps_grid_np(ctrl, warped, h, w)
    # torch grid_sample align_corners=False convention
    map_x = ((grid[..., 0] + 1) * w - 1) / 2
    map_y = ((grid[..., 1] + 1) * h - 1) / 2
    if cv2 is not None:
        out = cv2.remap(
            m.astype(np.float32), map_x.astype(np.float32),
            map_y.astype(np.float32), cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT, borderValue=0,
        )
    else:  # tiny fallback: nearest gather
        xi = np.clip(np.round(map_x), 0, w - 1).astype(np.int64)
        yi = np.clip(np.round(map_y), 0, h - 1).astype(np.int64)
        out = m[yi, xi]
        out[(map_x < 0) | (map_x > w - 1) | (map_y < 0) | (map_y > h - 1)] = 0
    return out if squeeze else out[..., None]


# ------------------------------------------------- reference augmentation

def augment_reference_np(
    img01: np.ndarray, rng: np.random.Generator, size: int = 224,
    flip_p: float = 0.5, rot_limit: float = 20.0, blur_p: float = 0.3,
    elastic_p: float = 0.3,
) -> np.ndarray:
    """Augment the masked reference crop ([0,1] HWC float) to size x size."""
    if cv2 is None:  # pragma: no cover
        from PIL import Image

        im = Image.fromarray((img01 * 255).astype(np.uint8)).resize((size, size))
        return np.asarray(im, np.float32) / 255.0

    out = cv2.resize(img01, (size, size), interpolation=cv2.INTER_LINEAR)
    if rng.random() < flip_p:
        out = out[:, ::-1]
    angle = rng.uniform(-rot_limit, rot_limit)
    mat = cv2.getRotationMatrix2D((size / 2, size / 2), angle, 1.0)
    out = cv2.warpAffine(out, mat, (size, size), flags=cv2.INTER_LINEAR)
    if rng.random() < blur_p:
        k = int(rng.integers(1, 4)) * 2 + 1
        out = cv2.blur(out, (k, k))
    if rng.random() < elastic_p:
        alpha, sigma = 20.0, 5.0
        dx = cv2.GaussianBlur(
            (rng.random((size, size)).astype(np.float32) * 2 - 1), (0, 0), sigma
        ) * alpha
        dy = cv2.GaussianBlur(
            (rng.random((size, size)).astype(np.float32) * 2 - 1), (0, 0), sigma
        ) * alpha
        xs, ys = np.meshgrid(np.arange(size), np.arange(size))
        out = cv2.remap(
            out, (xs + dx).astype(np.float32), (ys + dy).astype(np.float32),
            cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT,
        )
    return np.clip(out, 0.0, 1.0)
