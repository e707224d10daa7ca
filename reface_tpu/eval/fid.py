"""CLIP-FID: Fréchet distance on CLIP ViT-B/32 image features.

Behavioral parity target (semantics, not code):
  /root/reference/eval_tool/fid/fid_score.py:66-191 + inception.py:140-146 —
  despite the file names, the reference computes FID over *CLIP ViT-B/32*
  512-d image embeddings (the InceptionV3 wrapper is rewired to
  clip_model.encode_image), with CLIP preprocessing (resize 224 bicubic,
  center crop, CLIP normalization), then the standard Fréchet formula on
  per-set mean/covariance.

TPU notes: feature extraction is a batched jitted CLIP tower fwd; the
matrix sqrt runs on host in float64 via scipy (tiny 512x512).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from reface_tpu.nn.clip import CLIPVisionConfig, CLIPVisionTower

__all__ = ["CLIP_B32", "clip_features", "frechet_distance", "clip_fid"]

# openai/clip-vit-base-patch32 vision tower
CLIP_B32 = CLIPVisionConfig(
    hidden=768, layers=12, heads=12, patch=32, image_size=224,
    projection_dim=512,
)


def clip_features(params, images01: jnp.ndarray, config=CLIP_B32,
                  batch_size: int = 64) -> np.ndarray:
    """(N,H,W,3) images in [0,1] -> (N, 512) CLIP features (numpy)."""
    from reface_tpu.pipelines.swap import clip_normalize

    tower = CLIPVisionTower(config)
    fwd = jax.jit(lambda p, x: tower.apply(p, clip_normalize(x)))
    out = []
    n = images01.shape[0]
    for i in range(0, n, batch_size):
        out.append(np.asarray(fwd(params, images01[i : i + batch_size])))
    return np.concatenate(out, axis=0)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """||mu1-mu2||^2 + Tr(S1 + S2 - 2 sqrt(S1 S2)) in float64."""
    from scipy import linalg

    mu1 = np.atleast_1d(np.asarray(mu1, np.float64))
    mu2 = np.atleast_1d(np.asarray(mu2, np.float64))
    sigma1 = np.atleast_2d(np.asarray(sigma1, np.float64))
    sigma2 = np.atleast_2d(np.asarray(sigma2, np.float64))
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def clip_fid(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    """Fréchet distance between two feature sets (N_a, D), (N_b, D)."""
    mu1, s1 = feats_a.mean(0), np.cov(feats_a, rowvar=False)
    mu2, s2 = feats_b.mean(0), np.cov(feats_b, rowvar=False)
    return frechet_distance(mu1, s1, mu2, s2)
