"""CelebAMask-HQ train/val/test dataset (host-side numpy pipeline).

Parity targets (semantics, not code):
  - file layout + 28k/2k/2k split: ldm/data/celebA.py:376-405
    ({dir}/CelebA-HQ-img/{i}.jpg, {dir}/CelebA-HQ-mask/Overall_mask/{i}.png)
  - gray-mask item recipe: celebA.py:412-493 —
      keep-mask  = 1 - isin(mask19, preserve)
      TPS-warp the keep-mask (decow, scale~U(0.5,1))
      inpaint    = GT * keep-mask
      reference  = CLIP-normalized GT masked to the face region, then
                   augmented (resize 224 / flip / rotate / blur / elastic)
  - black-mask item recipe (gray_outer_mask: False dispatch,
    celebA.py:405-409 -> 495-557): same keep-mask and reference build but
    NO decow TPS warp of the inpaint mask (the mask follows the parsing
    classes exactly), and the reference is masked with the
    nearest-resized raw class mask before augmentation
  - shipped class lists: configs/train.yaml:108-133

Returns per item (all HWC float32 numpy):
  {GT: (S,S,3) in [-1,1], inpaint_image: (S,S,3), inpaint_mask: (S,S,1),
   ref_imgs: (224,224,3) CLIP-normalized}
"""

from __future__ import annotations

import dataclasses
import os.path as osp

import numpy as np

from reface_tpu.data.augment import (
    augment_reference_np,
    clip_normalize_np,
    to_tensor_pm1,
    tps_warp_mask_np,
)
from reface_tpu.preprocess.masks import DEFAULT_PRESERVE_CELEBA

__all__ = ["CelebAHQConfig", "CelebAHQDataset"]


def _imread_rgb(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def _imread_gray(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    return img


def _resize(img: np.ndarray, size: int, nearest: bool = False) -> np.ndarray:
    import cv2

    interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
    return cv2.resize(img, (size, size), interpolation=interp)


@dataclasses.dataclass(frozen=True)
class CelebAHQConfig:
    dataset_dir: str
    state: str = "train"  # train | validation | test
    image_size: int = 512
    preserve: tuple = DEFAULT_PRESERVE_CELEBA
    data_seed: int = 0
    tps_scale_range: tuple = (0.5, 1.0)
    train_count: int = 28000
    eval_count: int = 2000
    # True = __getitem_gray__ recipe (shipped default); False = the
    # __getitem_black__ recipe (celebA.py:405-409 config dispatch): no
    # decow TPS warp of the inpaint mask
    gray_outer_mask: bool = True


class CelebAHQDataset:
    def __init__(self, config: CelebAHQConfig):
        self.cfg = config
        d = config.dataset_dir
        if config.state == "train":
            ids = range(config.train_count)
        else:
            ids = range(config.train_count, config.train_count + config.eval_count)
        self.ids = list(ids)
        self.imgs = [osp.join(d, "CelebA-HQ-img", f"{i}.jpg") for i in self.ids]
        self.masks = [
            osp.join(d, "CelebA-HQ-mask", "Overall_mask", f"{i}.png")
            for i in self.ids
        ]

    def __len__(self):
        return len(self.ids)

    def __getitem__(self, index: int) -> dict:
        cfg = self.cfg
        rng = np.random.default_rng(
            np.random.SeedSequence([cfg.data_seed, index])
        )
        img = _imread_rgb(self.imgs[index])  # native 1024 or any size
        mask19 = _imread_gray(self.masks[index])

        face = np.isin(mask19, cfg.preserve)
        keep = 1.0 - face.astype(np.float32)  # 1 = keep, 0 = inpaint region

        s = cfg.image_size
        gt = to_tensor_pm1(_resize(img, s))
        keep_s = _resize(keep, s)
        if cfg.state == "train" and cfg.gray_outer_mask:
            # the black recipe (gray_outer_mask False) skips the decow
            # warp: its inpaint mask follows the parsing classes exactly
            # (celebA.py:495-557 has no decow call)
            scale = rng.uniform(*cfg.tps_scale_range)
            keep_s = tps_warp_mask_np(keep_s, rng, scale=scale)
        inpaint = gt * keep_s[..., None]

        # reference: face pixels of the full-res image, augmented, CLIP-normed
        img01 = img.astype(np.float32) / 255.0
        face_full = _resize(face.astype(np.float32), img.shape[0], nearest=True)
        ref01 = img01 * face_full[..., None]
        if cfg.state == "train":
            ref01 = augment_reference_np(ref01, rng)
        else:
            import cv2

            ref01 = cv2.resize(ref01, (224, 224), interpolation=cv2.INTER_LINEAR)
        ref = clip_normalize_np(ref01)

        return {
            "GT": gt.astype(np.float32),
            "inpaint_image": inpaint.astype(np.float32),
            "inpaint_mask": keep_s[..., None].astype(np.float32),
            "ref_imgs": ref.astype(np.float32),
            "index": np.int32(self.ids[index]),
        }
