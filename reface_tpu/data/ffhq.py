"""FFHQ train/val dataset — same recipe as CelebA-HQ over the FFHQ layout.

Parity target: ldm/data/ffhq.py:382-538 — images at {dir}/images512/{i:05d}.png
with BiSeNet 19-class masks at {dir}/BiSeNet_mask/{i:05d}.png, 68k/2k split,
seg lists in face-parsing.PyTorch ordering.
"""

from __future__ import annotations

import dataclasses
import os.path as osp

from reface_tpu.data.celeba import CelebAHQDataset, CelebAHQConfig

__all__ = ["FFHQConfig", "FFHQDataset"]

# face-parsing.PyTorch ids for the shipped FFHQ preserve recipe (skin, brows,
# eyes, ears, nose, mouth, lips, neck — project.yaml:205-224 seg12 equivalent
# expressed in the 19-class source vocabulary)
DEFAULT_PRESERVE_FFHQ_19 = (1, 2, 3, 4, 5, 7, 8, 10, 11, 12, 13, 14)


@dataclasses.dataclass(frozen=True)
class FFHQConfig:
    dataset_dir: str
    state: str = "train"
    image_size: int = 512
    preserve: tuple = DEFAULT_PRESERVE_FFHQ_19
    data_seed: int = 0
    train_count: int = 68000
    eval_count: int = 2000


class FFHQDataset(CelebAHQDataset):
    def __init__(self, config: FFHQConfig):
        self.cfg = CelebAHQConfig(
            dataset_dir=config.dataset_dir,
            state=config.state,
            image_size=config.image_size,
            preserve=config.preserve,
            data_seed=config.data_seed,
            train_count=config.train_count,
            eval_count=config.eval_count,
        )
        d = config.dataset_dir
        if config.state == "train":
            ids = range(config.train_count)
        else:
            ids = range(config.train_count, config.train_count + config.eval_count)
        self.ids = list(ids)
        self.imgs = [osp.join(d, "images512", f"{i:05d}.png") for i in self.ids]
        self.masks = [osp.join(d, "BiSeNet_mask", f"{i:05d}.png") for i in self.ids]
