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
    # adjustment applied to thresholds (diffusers exposes the same knob)
    adjustment: float = 0.0


class SafetyChecker:
    """checker(images01) -> (filtered01, flags). Needs converted weights
    (tower + concept embeds/thresholds) for real filtering."""

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
        concepts = params["concept_embeds"]
        thresholds = params["concept_thresholds"]
        cos = emb @ concepts.T  # (B, n_concepts)
        flags = jnp.any(cos > (thresholds + self.config.adjustment), axis=-1)
        return flags

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
