"""Synthetic mini dataset trees for tests and smoke runs (no real data)."""

from __future__ import annotations

import os

import numpy as np

__all__ = [
    "make_synthetic_celeba",
    "make_synthetic_ffhq",
    "LANDMARK68_TEMPLATE",
    "make_landmark_faces",
]


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


def _landmark68_template() -> np.ndarray:
    """Canonical iBUG-68 landmark layout in [0,1]^2 (x right, y down).

    Procedural stand-in for a mean face shape: 17 jaw points on an
    ellipse arc, 2x5 brows, 9 nose (4 bridge + 5 base), 2x6 eyes, 12
    outer + 8 inner lip. Used as BOTH the renderer's skeleton and the
    ground truth for the synthetic landmark datasets (the environment
    ships no real faces or dlib .dat — SURVEY hard-part #1 is closed by
    measuring ERT/CNN errors against this known geometry)."""
    pts = []
    # jaw 0-16: lower half-ellipse, left ear -> chin (bottom) -> right ear
    # (y grows DOWN, so the chin is the +y pole at angle 90 deg)
    for i in range(17):
        a = np.pi * (1.0 - i / 16.0)
        pts.append([0.5 + 0.38 * np.cos(a), 0.47 + 0.45 * np.sin(a)])
    # brows 17-21 (left), 22-26 (right): shallow arcs
    for side in (-1, 1):
        cx = 0.5 + side * 0.17
        for i in range(5):
            t = (i / 4.0 - 0.5)
            x = cx + side * t * 0.16
            y = 0.30 - 0.035 * (1 - (2 * t) ** 2)
            pts.append([x, y])
    # nose bridge 27-30 + base 31-35
    for i in range(4):
        pts.append([0.5, 0.36 + i * 0.055])
    for i in range(5):
        pts.append([0.5 + (i - 2) * 0.035, 0.555 + 0.012 * (1 - abs(i - 2))])
    # eyes 36-41 (left), 42-47 (right): 6-point ellipses
    for side in (-1, 1):
        cx, cy, rx, ry = 0.5 + side * 0.17, 0.385, 0.055, 0.025
        for i in range(6):
            a = 2 * np.pi * i / 6.0
            pts.append([cx + rx * np.cos(a), cy + ry * np.sin(a)])
    # outer lip 48-59 (12) + inner lip 60-67 (8)
    for n, (rx, ry) in ((12, (0.10, 0.045)), (8, (0.065, 0.02))):
        for i in range(n):
            a = 2 * np.pi * i / n
            pts.append([0.5 + rx * np.cos(a), 0.70 + ry * np.sin(a)])
    return np.asarray(pts, np.float32)


LANDMARK68_TEMPLATE = _landmark68_template()


def make_landmark_faces(n: int, size: int = 256, seed: int = 0,
                        max_rot_deg: float = 15.0,
                        scale_range: tuple = (0.72, 1.05),
                        shift_frac: float = 0.10):
    """n synthetic face images with EXACT 68-point ground truth.

    Each sample: the template under a random similarity transform
    (rotation, scale, translation) + per-sample appearance jitter, drawn
    with cv2 (filled head ellipse, brows, eyes with pupils, nose, lips)
    over a textured background. Returns (images uint8 (n,size,size,3),
    landmarks float32 (n,68,2) pixel coords).

    This is the supervision source for the landmark stack's accuracy
    story: train the ERT / distill the LandmarkNet on these, report px
    error against known geometry (nn/landmarks.py, tools/ert_train.py).
    """
    import cv2

    rng = np.random.default_rng(seed)
    images = np.empty((n, size, size, 3), np.uint8)
    landmarks = np.empty((n, 68, 2), np.float32)
    base = LANDMARK68_TEMPLATE - 0.5  # center for rotation

    for k in range(n):
        ang = np.deg2rad(rng.uniform(-max_rot_deg, max_rot_deg))
        sc = rng.uniform(*scale_range) * size
        shift = rng.uniform(-shift_frac, shift_frac, 2) * size
        rot = np.array([[np.cos(ang), -np.sin(ang)],
                        [np.sin(ang), np.cos(ang)]], np.float32)
        lm = base @ rot.T * sc + size / 2.0 + shift
        landmarks[k] = lm

        img = np.empty((size, size, 3), np.uint8)
        img[:] = rng.integers(20, 235, 3, np.uint8)  # flat background
        # low-freq background texture
        for _ in range(6):
            p = rng.integers(0, size, 4)
            cv2.line(img, (int(p[0]), int(p[1])), (int(p[2]), int(p[3])),
                     tuple(int(v) for v in rng.integers(0, 255, 3)),
                     int(rng.integers(1, 6)))
        skin = tuple(int(v) for v in rng.integers(120, 230, 3))
        dark = tuple(int(v) for v in rng.integers(10, 80, 3))
        lip = tuple(int(v) for v in rng.integers(90, 200, 3))

        def poly(idx, color, closed=False, thickness=2, fill=False):
            p = lm[list(idx)].round().astype(np.int32)
            if fill:
                cv2.fillPoly(img, [p], color)
            else:
                cv2.polylines(img, [p], closed, color, thickness)

        # head: fill the jaw arc closed through a forehead arc mirrored
        # from the jaw ellipse (keeps the skin region consistent with lm)
        jaw = lm[:17]
        forehead = jaw[::-1] * np.array([1.0, -1.0]) + np.array(
            [0.0, 2.0 * float(jaw[:, 1].min()) - 8.0], np.float32)
        head = np.concatenate([jaw, forehead]).round().astype(np.int32)
        cv2.fillPoly(img, [head], skin)
        poly(range(17), dark, thickness=2)                    # jaw line
        poly(range(17, 22), dark, thickness=3)                # brows
        poly(range(22, 27), dark, thickness=3)
        poly(range(27, 31), dark, thickness=2)                # nose bridge
        poly(range(31, 36), dark, thickness=2)                # nose base
        poly(range(36, 42), (255, 255, 255), closed=True, fill=True)  # eyes
        poly(range(42, 48), (255, 255, 255), closed=True, fill=True)
        for eye in (range(36, 42), range(42, 48)):            # pupils
            c = lm[list(eye)].mean(0).round().astype(int)
            cv2.circle(img, (int(c[0]), int(c[1])), max(2, size // 96),
                       dark, -1)
        poly(range(36, 42), dark, closed=True, thickness=1)
        poly(range(42, 48), dark, closed=True, thickness=1)
        poly(range(48, 60), lip, closed=True, fill=True)      # lips
        poly(range(60, 68), dark, closed=True, thickness=1)
        # sensor noise
        noise = rng.integers(-12, 13, img.shape, np.int16)
        img = np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)
        images[k] = img

    return images, landmarks


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
