"""Pre-cropped video-frame dataset.

Parity target: ldm/data/video_swap_dataset.py:86-243 — a directory of
aligned frame crops + a directory of (BiSeNet 19-class or seg12) masks,
producing the same swap-ready target-side tensors as the test bench, with
FFHQ seg-12 class lists.
"""

from __future__ import annotations

import dataclasses
import glob
import os

import numpy as np

from reface_tpu.data.augment import to_tensor_pm1
from reface_tpu.preprocess.masks import DEFAULT_PRESERVE_FFHQ_SEG12

__all__ = ["VideoFramesConfig", "VideoFramesDataset"]


@dataclasses.dataclass(frozen=True)
class VideoFramesConfig:
    frames_dir: str
    masks_dir: str
    image_size: int = 512
    remove_classes: tuple = DEFAULT_PRESERVE_FFHQ_SEG12  # seg12 face classes


class VideoFramesDataset:
    def __init__(self, config: VideoFramesConfig):
        self.cfg = config
        self.frames = sorted(
            glob.glob(os.path.join(config.frames_dir, "*.png"))
            + glob.glob(os.path.join(config.frames_dir, "*.jpg"))
        )

    def __len__(self):
        return len(self.frames)

    def _mask_path(self, frame_path: str) -> str:
        base = os.path.splitext(os.path.basename(frame_path))[0]
        return os.path.join(self.cfg.masks_dir, base + ".png")

    def __getitem__(self, index: int) -> dict:
        import cv2

        cfg = self.cfg
        s = cfg.image_size
        img = cv2.cvtColor(cv2.imread(self.frames[index]), cv2.COLOR_BGR2RGB)
        mask = cv2.imread(self._mask_path(self.frames[index]),
                          cv2.IMREAD_GRAYSCALE)
        keep = 1.0 - np.isin(mask, cfg.remove_classes).astype(np.float32)
        keep = cv2.resize(keep, (s, s), interpolation=cv2.INTER_LINEAR)
        gt = to_tensor_pm1(cv2.resize(img, (s, s)))
        return {
            "target_image": gt.astype(np.float32),
            "inpaint_image": (gt * keep[..., None]).astype(np.float32),
            "inpaint_mask": keep[..., None].astype(np.float32),
            "index": np.int32(index),
        }
