"""Prior-image generation for the test bench's Start_from_target mode.

Functional parity target: /root/reference/scripts/make_priors.py — the
reference replaces the masked target-face pixels with source pixels found
by DIFT diffusion-feature correspondence (argmax cosine between SD-UNet
features at t=261, make_priors.py:60-151), producing a "prior" image whose
noised latent seeds the DDIM chain (inference_test_bench.py:414-436).

Two builders, both fully on-device:
  - `landmark_tps_prior`: 68-landmark TPS warping (classical equivalent)
  - `dift_prior` + `make_unet_feats_fn`: the DIFT-parity variant — the
    swap UNet's own decoder features at a noised timestep drive the
    argmax-cosine correspondence (the reference runs the full 512^2 x
    512^2 similarity; here the correspondence is computed on a `grid`^2
    lattice and upsampled, which bounds the matmul at grid^4*C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from reface_tpu.preprocess.tps import grid_sample_2d, tps_warp

__all__ = ["landmark_tps_prior", "dift_prior", "make_unet_feats_fn"]


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


def make_unet_feats_fn(modules, params, t: int = 261, ensemble: int = 4,
                       seed: int = 0):
    """Diffusion-feature extractor over the swap UNet (SDFeaturizer role,
    make_priors.py:7,18-23: features at t=261, ensemble-averaged over
    noise draws).

    modules: a SwapModules/FaceSwapper; params: its param dict. Returns
    feats_fn: (H,W,3) [-1,1] image -> (h,w,C) float32 features (the first
    decoder tap at latent/4 resolution — the DIFT up_ft_index=1 analog).
    The 9-ch inpainting UNet sees [z_t, z, ones] (nothing masked) and the
    learnable null conditioning.
    """
    from reface_tpu.core.schedules import DiffusionSchedule
    from reface_tpu.nn.conditioner import REFaceConditioner

    schedule = DiffusionSchedule.create()

    def feats_fn(image_pm1: jnp.ndarray) -> jnp.ndarray:
        z = modules.encode_latent(params, image_pm1[None])  # mode (no key)
        b, hw = 1, z.shape[1]
        tb = jnp.full((b,), t, jnp.int32)
        ctx = modules.conditioner.apply(
            params["conditioner"], b, method=REFaceConditioner.null_conditioning
        )
        acc = None
        for e in range(ensemble):
            noise = jax.random.normal(
                jax.random.key(seed * 1000 + e), z.shape, z.dtype
            )
            z_t = schedule.q_sample(z, tb, noise)
            x9 = jnp.concatenate(
                [z_t, z, jnp.ones((b, hw, hw, 1), z.dtype)], axis=-1
            )
            _, feats = modules.unet.apply(
                params["unet"], x9, tb, ctx, return_features=True
            )
            f = next(
                (f for f in feats if f.shape[1] == max(hw // 4, 1)), feats[0]
            )
            acc = f if acc is None else acc + f
        return (acc[0] / ensemble).astype(jnp.float32)

    return feats_fn


def dift_prior(
    target_image: jnp.ndarray,  # (H,W,3) in [-1,1]
    source_image: jnp.ndarray,  # (H,W,3) in [-1,1]
    face_mask: jnp.ndarray,  # (H,W,1) 1 = face region of the target
    feats_fn,  # (H,W,3) -> (h,w,C) diffusion features
    grid: int = 128,
) -> jnp.ndarray:
    """Feature-correspondence prior (make_priors.py:103-151 semantics).

    For every target cell, finds the argmax-cosine source cell between the
    two feature maps and pastes that source pixel into the target's face
    region. The correspondence runs on a grid^2 lattice (the reference
    chunks the full 512^2 pairwise matmul; cosine argmax is unchanged by
    working at feature resolution and upsampling the index field).
    """
    h, w, _ = target_image.shape
    ft = feats_fn(target_image)
    fs = feats_fn(source_image)

    def at_grid(f):
        g = jax.image.resize(f, (grid, grid, f.shape[-1]), "bilinear")
        g = g.reshape(grid * grid, -1)
        return g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-8)

    a = at_grid(ft)  # (g^2, C) target
    bmat = at_grid(fs)  # (g^2, C) source
    idx = jnp.argmax(a @ bmat.T, axis=1)  # per target cell -> source cell

    # source pixel centers of each matched cell, in grid_sample [-1,1]
    sy = (idx // grid).astype(jnp.float32)
    sx = (idx % grid).astype(jnp.float32)
    nx = (2.0 * sx + 1.0) / grid - 1.0
    ny = (2.0 * sy + 1.0) / grid - 1.0
    field = jnp.stack([nx, ny], axis=-1).reshape(grid, grid, 2)
    # nearest-upsample the correspondence field to full resolution
    field = jax.image.resize(field, (h, w, 2), "nearest")
    warped = grid_sample_2d(source_image[None], field[None])[0]
    return target_image * (1 - face_mask) + warped * face_mask
