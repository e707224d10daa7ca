"""Prior-image generation for the test bench's Start_from_target mode.

Functional parity target: /root/reference/scripts/make_priors.py — the
reference warps the source face onto the target using DIFT diffusion-feature
correspondences, producing a "prior" image whose noised latent seeds the
DDIM chain (inference_test_bench.py:414-436). Here the correspondence comes
from 68-landmark TPS warping (source landmarks -> target landmarks), which
is the classical equivalent and runs entirely on device; the DIFT variant
can be added on top since the swap pipeline already exposes UNet features.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from reface_tpu.preprocess.tps import grid_sample_2d, tps_warp

__all__ = ["landmark_tps_prior"]


def landmark_tps_prior(
    target_image: jnp.ndarray,  # (H,W,3) in [-1,1]
    source_image: jnp.ndarray,  # (H,W,3) in [-1,1]
    target_lm: jnp.ndarray,  # (68,2) pixel coords in target
    source_lm: jnp.ndarray,  # (68,2) pixel coords in source
    face_mask: jnp.ndarray,  # (H,W,1) 1 = face region of the target
) -> jnp.ndarray:
    """Warp the source face onto the target's landmark geometry.

    Builds a TPS mapping target landmarks -> source landmarks (backward
    warp), samples the source there, and composites over the target inside
    the face mask.
    """
    h, w, _ = target_image.shape
    # grid_sample_2d half-pixel convention: pixel i center <-> (2i+1)/S - 1
    to_norm = lambda lm: (2.0 * lm + 1.0) / jnp.array([float(w), float(h)]) - 1.0
    t_n = to_norm(target_lm)
    s_n = to_norm(source_lm)

    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    pts = to_norm(jnp.stack([xx.ravel(), yy.ravel()], axis=-1))
    mapped = tps_warp(t_n, s_n, pts).reshape(h, w, 2)
    warped = grid_sample_2d(source_image[None], mapped[None])[0]
    return target_image * (1 - face_mask) + warped * face_mask
