"""Safety checker: flag/blur NSFW outputs.

Functional parity target: the reference loads the SD safety checker at
import time in its batch driver (scripts/inference_test_bench.py:48-51) and
filters generated images. Mechanism (CompVis safety_checker semantics):
CLIP ViT-L/14 image embedding -> projection -> cosine similarity against
fixed "concept" embeddings with per-concept thresholds; flagged images are
replaced by a heavily blurred version.

Runs as a batched jitted pass; without converted concept weights it is a
configurable pass-through (flag_all=False) so pipelines stay runnable.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from reface_tpu.nn.clip import CLIPVisionConfig, CLIPVisionTower

__all__ = ["SafetyCheckerConfig", "SafetyChecker"]


@dataclasses.dataclass(frozen=True)
class SafetyCheckerConfig:
    clip: CLIPVisionConfig = CLIPVisionConfig()
    n_concepts: int = 17
    n_special: int = 3
    # adjustment added to scores ("lower value => stronger filter" knob,
    # diffusers StableDiffusionSafetyChecker.forward semantics)
    adjustment: float = 0.0


class SafetyChecker:
    """checker(images01) -> (filtered01, flags). Needs converted weights
    (tower + concept/special embeds and thresholds: ckpt/convert.py::
    convert_safety_checker) for real filtering.

    Scoring parity (diffusers safety_checker.forward): cosine of the CLIP
    projection against special-care embeds first; any special hit raises the
    per-image concept adjustment by 0.01; nsfw if any concept score > 0.
    """

    def __init__(self, config: SafetyCheckerConfig = SafetyCheckerConfig(),
                 params: Optional[dict] = None):
        self.config = config
        self.params = params
        self.tower = CLIPVisionTower(config.clip)
        if params is not None:
            self._jit_check = jax.jit(self._check)

    def _check(self, params, images01):
        from reface_tpu.pipelines.swap import clip_normalize

        emb = self.tower.apply(params["tower"], clip_normalize(images01))
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

        def cos(concepts):
            c = concepts / jnp.linalg.norm(concepts, axis=-1, keepdims=True)
            return emb @ c.T

        # diffusers semantics: the global adjustment applies to the
        # special-care scores ONLY; concepts get just the per-image +0.01
        # raised by a special-care hit
        special = cos(params["special_embeds"]) \
            - params["special_thresholds"] + self.config.adjustment
        special_hit = jnp.any(special > 0, axis=-1)
        per_img_adj = jnp.where(special_hit, 0.01, 0.0)[:, None]
        concept = cos(params["concept_embeds"]) \
            - params["concept_thresholds"] + per_img_adj
        return jnp.any(concept > 0, axis=-1)

    @staticmethod
    def _blur(images01, factor: int = 16):
        b, h, w, c = images01.shape
        small = jax.image.resize(images01, (b, h // factor, w // factor, c),
                                 "bilinear")
        return jax.image.resize(small, images01.shape, "bilinear")

    def __call__(self, images01: jnp.ndarray):
        if self.params is None:
            return images01, jnp.zeros((images01.shape[0],), bool)
        flags = self._jit_check(self.params, images01)
        blurred = self._blur(images01)
        out = jnp.where(flags[:, None, None, None], blurred, images01)
        return out, flags
