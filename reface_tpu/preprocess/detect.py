"""Face-box detection from parsing masks (on-device, batched).

The reference's detector is dlib's HOG+SVM frontal-face detector (C++, per
image on the CPU). The TPU-native equivalent derives the face box from the
BiSeNet parsing mask — the parser already runs in the pipeline, and the
bounding box of the face classes is exactly the region dlib's box is used
for (seeding the landmark predictor and sanity-gating frames). Batched,
jittable, differentiable-free integer math.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["face_bbox_from_mask", "FACE_CLASSES_SEG12"]

FACE_CLASSES_SEG12 = (1, 2, 3, 5, 6, 7, 9)  # lip/brows/eyes/nose/skin/ears/mouth


def face_bbox_from_mask(seg: jnp.ndarray, face_classes=FACE_CLASSES_SEG12,
                        min_pixels: int = 16):
    """(B, H, W) int class map -> ((B, 4) [x0,y0,x1,y1] float boxes, (B,) valid).

    Invalid (no face found) boxes fall back to the full frame, mirroring the
    reference's last-good-frame tolerance for failed detections
    (inference_swap_video.py:489-496 uses the previous frame; callers here
    can use `valid` to do the same).
    """
    b, h, w = seg.shape
    face = jnp.zeros(seg.shape, bool)
    for c in face_classes:
        face = face | (seg == c)
    count = face.sum(axis=(1, 2))
    valid = count >= min_pixels

    ys = jnp.arange(h)[None, :, None]
    xs = jnp.arange(w)[None, None, :]
    big = jnp.iinfo(jnp.int32).max
    y0 = jnp.where(face, ys, big).min(axis=(1, 2))
    x0 = jnp.where(face, xs, big).min(axis=(1, 2))
    y1 = jnp.where(face, ys, -1).max(axis=(1, 2))
    x1 = jnp.where(face, xs, -1).max(axis=(1, 2))

    full = jnp.stack(
        [jnp.zeros(b), jnp.zeros(b), jnp.full(b, w - 1.0), jnp.full(b, h - 1.0)],
        axis=1,
    )
    boxes = jnp.stack([x0, y0, x1, y1], axis=1).astype(jnp.float32)
    boxes = jnp.where(valid[:, None], boxes, full)
    return boxes, valid
