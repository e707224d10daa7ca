"""Segmentation-mask vocabularies, remaps, and preserve-list mask building.

Parity targets (semantic constants + remap behavior, not code):
  - CelebAMask-HQ 19-class ids and the 9-/12-class aggregations:
    ldm/data/celebA.py:171-334
  - face-parsing.PyTorch (BiSeNet) 19-class ordering: celebA.py:177-180,
    pretrained/face_parsing/face_parsing_demo.py:15-122
  - preserve-list -> binary mask -> inverted inpaint mask:
    ldm/data/celebA.py:412-493, test_bench_dataset.py:200-260
  - shipped preserve lists: configs/train.yaml:110-133 (CelebA),
    models/REFace/configs/project.yaml:205-224 (FFHQ seg12)

The "mask shuffling" / universal head-swap capability of the reference is
exactly editing these class lists (SURVEY.md §2.2) — exposed here as plain
arguments. All ops are vectorized LUT takes, usable on host (numpy) or
device (jnp) and batched.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "CELEBAHQ_LABELS",
    "FACE_PARSING_LABELS",
    "SEG9_LABELS",
    "SEG12_LABELS",
    "CELEBAHQ_TO_SEG12",
    "CELEBAHQ_TO_SEG9",
    "FACE_PARSING_TO_SEG12",
    "remap",
    "preserve_mask",
    "inpaint_mask_from_classes",
    "DEFAULT_PRESERVE_CELEBA",
    "DEFAULT_PRESERVE_CELEBA_SRC_TEST",
    "DEFAULT_PRESERVE_FFHQ_SEG12",
    "HEAD_SWAP_CELEBA",
    "HEAD_SWAP_SEG12",
]

# 19 classes: index 0 = background
CELEBAHQ_LABELS = (
    "background", "skin", "nose", "eye_g", "l_eye", "r_eye", "l_brow",
    "r_brow", "l_ear", "r_ear", "mouth", "u_lip", "l_lip", "hair", "hat",
    "ear_r", "neck_l", "neck", "cloth",
)

# BiSeNet / face-parsing.PyTorch ordering (index 0 = background)
FACE_PARSING_LABELS = (
    "background", "skin", "l_brow", "r_brow", "l_eye", "r_eye", "eye_g",
    "l_ear", "r_ear", "ear_r", "nose", "mouth", "u_lip", "l_lip", "neck",
    "neck_l", "cloth", "hair", "hat",
)

SEG9_LABELS = (
    "background", "mouth", "eyebrows", "eyes", "hair", "nose", "skin",
    "ears", "belowface",
)

SEG12_LABELS = (
    "background", "lip", "eyebrows", "eyes", "hair", "nose", "skin", "ears",
    "belowface", "mouth", "eye_glass", "ear_rings",
)

_SEG12 = {name: i for i, name in enumerate(SEG12_LABELS)}
_SEG9 = {name: i for i, name in enumerate(SEG9_LABELS)}

# source-class name -> seg12 class name (unlisted -> background)
_TO_SEG12_BY_NAME = {
    "skin": "skin", "nose": "nose", "eye_g": "eye_glass",
    "l_eye": "eyes", "r_eye": "eyes", "l_brow": "eyebrows",
    "r_brow": "eyebrows", "l_ear": "ears", "r_ear": "ears",
    "mouth": "mouth", "u_lip": "lip", "l_lip": "lip", "hair": "hair",
    "ear_r": "ear_rings", "neck": "belowface",
}
_TO_SEG9_BY_NAME = {
    "skin": "skin", "nose": "nose",
    "l_eye": "eyes", "r_eye": "eyes", "l_brow": "eyebrows",
    "r_brow": "eyebrows", "l_ear": "ears", "r_ear": "ears",
    "mouth": "mouth", "u_lip": "mouth", "l_lip": "mouth", "hair": "hair",
    "neck": "belowface",
}


def _lut(src_labels, mapping, dst_index) -> np.ndarray:
    out = np.zeros(len(src_labels), np.int32)
    for i, name in enumerate(src_labels):
        if name in mapping:
            out[i] = dst_index[mapping[name]]
    return out


CELEBAHQ_TO_SEG12 = _lut(CELEBAHQ_LABELS, _TO_SEG12_BY_NAME, _SEG12)
CELEBAHQ_TO_SEG9 = _lut(
    CELEBAHQ_LABELS,
    {**_TO_SEG9_BY_NAME, "mouth": "mouth"},
    {**_SEG9, "mouth": 1},
)
FACE_PARSING_TO_SEG12 = _lut(FACE_PARSING_LABELS, _TO_SEG12_BY_NAME, _SEG12)

# Shipped preserve lists (CelebA 19-class ids / FFHQ seg12 ids)
DEFAULT_PRESERVE_CELEBA = (1, 2, 4, 5, 8, 9, 6, 7, 10, 11, 12, 17)
DEFAULT_PRESERVE_CELEBA_SRC_TEST = (1, 2, 4, 5, 8, 9, 6, 7, 10, 11, 12, 13, 17)
DEFAULT_PRESERVE_FFHQ_SEG12 = (1, 2, 3, 5, 6, 7, 9)

# "Universal head swap" — the reference's mask-shuffling capability is
# exactly extending these lists with hair/hat/accessory classes
# (SURVEY.md §2.2, BASELINE config #4).
HEAD_SWAP_CELEBA = DEFAULT_PRESERVE_CELEBA + (13, 14)  # + hair, hat
HEAD_SWAP_SEG12 = DEFAULT_PRESERVE_FFHQ_SEG12 + (4, 10, 11)  # + hair, glasses, earrings


def remap(mask, lut) -> np.ndarray:
    """Apply a class LUT to an integer mask (any shape, numpy or jnp)."""
    xp = np if isinstance(mask, np.ndarray) else __import__("jax.numpy", fromlist=["x"])
    lut = xp.asarray(lut)
    return xp.take(lut, mask.astype(np.int32) if isinstance(mask, np.ndarray) else mask)


def preserve_mask(mask, classes) -> np.ndarray:
    """Binary mask: 1 where mask's class is in `classes` (vectorized LUT)."""
    n = int(mask.max()) + 1 if isinstance(mask, np.ndarray) else 32
    n = max(n, (max(classes) + 1) if len(classes) else 1, 32)
    lut = np.zeros(n, np.float32)
    for c in classes:
        lut[c] = 1.0
    if isinstance(mask, np.ndarray):
        return np.take(lut, mask.astype(np.int64))
    import jax.numpy as jnp

    return jnp.take(jnp.asarray(lut), mask.astype(jnp.int32))


def inpaint_mask_from_classes(mask, remove_classes) -> np.ndarray:
    """Reference convention: mask=1 -> KEEP pixel, 0 -> region to inpaint.

    The dataset binarizes by the remove/preserve list then *inverts*
    (celebA.py:455-477): pixels belonging to the listed face classes become
    the inpaint region (0), everything else is kept (1).
    """
    face = preserve_mask(mask, remove_classes)
    return 1.0 - face
