"""Synthetic mini dataset trees for tests and smoke runs (no real data)."""

from __future__ import annotations

import os

import numpy as np

__all__ = ["make_synthetic_celeba", "make_synthetic_ffhq"]


def _write_img(path: str, arr: np.ndarray) -> None:
    import cv2

    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, cv2.cvtColor(arr, cv2.COLOR_RGB2BGR))


def _write_mask(path: str, arr: np.ndarray) -> None:
    import cv2

    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, arr)


def _face_like(rng, size):
    """Image with a blob 'face' + a 19-class mask with plausible regions."""
    img = rng.integers(0, 255, (size, size, 3), np.uint8)
    mask = np.zeros((size, size), np.uint8)
    c = size // 2
    r = size // 3
    ys, xs = np.ogrid[:size, :size]
    face = (ys - c) ** 2 + (xs - c) ** 2 < r * r
    mask[face] = 1  # skin
    mask[c - r // 3 : c - r // 6, c - r // 2 : c - r // 4] = 4  # l_eye
    mask[c - r // 3 : c - r // 6, c + r // 4 : c + r // 2] = 5  # r_eye
    mask[c + r // 4 : c + r // 2, c - r // 4 : c + r // 4] = 10  # mouth
    mask[: c - r, :] = 13  # hair above
    return img, mask


def make_synthetic_celeba(root: str, start: int = 0, count: int = 4,
                          size: int = 64, seed: int = 0) -> str:
    rng = np.random.default_rng(seed)
    for i in range(start, start + count):
        img, mask = _face_like(rng, size)
        _write_img(os.path.join(root, "CelebA-HQ-img", f"{i}.jpg"), img)
        _write_mask(
            os.path.join(root, "CelebA-HQ-mask", "Overall_mask", f"{i}.png"), mask
        )
    return root


def make_synthetic_ffhq(root: str, start: int = 0, count: int = 4,
                        size: int = 64, seed: int = 0) -> str:
    rng = np.random.default_rng(seed)
    for i in range(start, start + count):
        img, mask = _face_like(rng, size)
        _write_img(os.path.join(root, "images512", f"{i:05d}.png"), img)
        _write_mask(os.path.join(root, "BiSeNet_mask", f"{i:05d}.png"), mask)
    return root
