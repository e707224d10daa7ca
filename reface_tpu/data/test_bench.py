"""Frozen test-bench pair datasets (CelebA-HQ / FFHQ / FF++ style).

Parity targets (semantics, not code):
  - deterministic pair lists: ldm/data/test_bench_dataset.py:179-190 (CelebA
    targets 28000-28999 x sources 29000-29999) and :505-512 (FFHQ targets
    68000-68999 x sources 69000-69999), i-th target paired with i-th source.
  - item recipe :200-368 — target side: keep-mask from remove_tar classes,
    inpaint = GT * keep-mask (no TPS at test time); reference side: source
    image x preserve_src-class mask, CLIP-normalized 224^2, no augmentation.

Produces swap-pipeline-ready dicts:
  {target_image, inpaint_image, inpaint_mask, ref_clip224, target_id, source_id}
"""

from __future__ import annotations

import dataclasses
import os.path as osp

import numpy as np

from reface_tpu.data.augment import clip_normalize_np, to_tensor_pm1
from reface_tpu.preprocess.masks import (
    DEFAULT_PRESERVE_CELEBA,
    DEFAULT_PRESERVE_CELEBA_SRC_TEST,
)

__all__ = ["TestBenchConfig", "TestBenchDataset"]


@dataclasses.dataclass(frozen=True)
class TestBenchConfig:
    dataset_dir: str
    dataset: str = "celeba"  # celeba | ffhq
    image_size: int = 512
    num_pairs: int = 1000
    remove_tar: tuple = DEFAULT_PRESERVE_CELEBA
    preserve_src: tuple = DEFAULT_PRESERVE_CELEBA_SRC_TEST
    # optional prior images to q-sample the sampler start from
    # (load_prior path, test_bench_dataset.py:357-363): a dir of
    # {target_id}.png/.jpg images; None = off
    prior_dir: str | None = None

    def pair_ids(self):
        if self.dataset == "celeba":
            t0, s0 = 28000, 29000
        elif self.dataset == "ffhq":
            t0, s0 = 68000, 69000
        elif self.dataset == "ff":
            # FaceForensics++ 500-pair protocol (test_bench_dataset.py:651-701):
            # explicit pair list shipped with the prepared data.
            pairs_file = osp.join(self.dataset_dir, "pairs.txt")
            with open(pairs_file) as f:
                pairs = [tuple(map(int, line.split())) for line in f
                         if line.strip()]
            return pairs[: self.num_pairs]
        else:
            raise ValueError(f"unknown test bench dataset {self.dataset!r}")
        return [(t0 + i, s0 + i) for i in range(self.num_pairs)]

    def img_path(self, idx: int) -> str:
        if self.dataset == "celeba":
            return osp.join(self.dataset_dir, "CelebA-HQ-img", f"{idx}.jpg")
        if self.dataset == "ff":
            return osp.join(self.dataset_dir, "images", f"{idx:05d}.png")
        return osp.join(self.dataset_dir, "images512", f"{idx:05d}.png")

    def mask_path(self, idx: int) -> str:
        if self.dataset == "celeba":
            return osp.join(
                self.dataset_dir, "CelebA-HQ-mask", "Overall_mask", f"{idx}.png"
            )
        if self.dataset == "ff":
            return osp.join(self.dataset_dir, "masks", f"{idx:05d}.png")
        return osp.join(self.dataset_dir, "BiSeNet_mask", f"{idx:05d}.png")


class TestBenchDataset:
    def __init__(self, config: TestBenchConfig):
        self.cfg = config
        self.pairs = config.pair_ids()

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, index: int) -> dict:
        import cv2

        cfg = self.cfg
        tid, sid = self.pairs[index]
        s = cfg.image_size

        timg = cv2.cvtColor(cv2.imread(cfg.img_path(tid)), cv2.COLOR_BGR2RGB)
        tmask = cv2.imread(cfg.mask_path(tid), cv2.IMREAD_GRAYSCALE)
        simg = cv2.cvtColor(cv2.imread(cfg.img_path(sid)), cv2.COLOR_BGR2RGB)
        smask = cv2.imread(cfg.mask_path(sid), cv2.IMREAD_GRAYSCALE)

        keep = 1.0 - np.isin(tmask, cfg.remove_tar).astype(np.float32)
        keep = cv2.resize(keep, (s, s), interpolation=cv2.INTER_LINEAR)
        gt = to_tensor_pm1(cv2.resize(timg, (s, s)))
        inpaint = gt * keep[..., None]

        sface = np.isin(smask, cfg.preserve_src).astype(np.float32)
        simg01 = simg.astype(np.float32) / 255.0
        if sface.shape[:2] != simg01.shape[:2]:
            sface = cv2.resize(
                sface, simg01.shape[1::-1], interpolation=cv2.INTER_NEAREST
            )
        ref01 = simg01 * sface[..., None]
        ref = clip_normalize_np(
            cv2.resize(ref01, (224, 224), interpolation=cv2.INTER_LINEAR)
        )

        item = {
            "target_image": gt.astype(np.float32),
            "inpaint_image": inpaint.astype(np.float32),
            "inpaint_mask": keep[..., None].astype(np.float32),
            "ref_clip224": ref.astype(np.float32),
            "target_id": np.int32(tid),
            "source_id": np.int32(sid),
        }
        if cfg.prior_dir is not None:
            item["prior_image"] = self._load_prior(tid, s)
        return item

    def _load_prior(self, tid: int, s: int) -> np.ndarray:
        """Prior image in [-1,1] at image_size (test_bench_dataset.py:357-360:
        PIL RGB resize to 512 + get_tensor)."""
        import cv2

        for name in (f"{tid}.png", f"{tid}.jpg", f"{tid:05d}.png",
                     f"{str(tid).zfill(12)}.jpg"):
            p = osp.join(self.cfg.prior_dir, name)
            if osp.exists(p):
                img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
                return to_tensor_pm1(cv2.resize(img, (s, s))).astype(np.float32)
        raise FileNotFoundError(
            f"no prior image for target {tid} in {self.cfg.prior_dir}"
        )
