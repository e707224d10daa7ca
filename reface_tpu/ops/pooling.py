"""Exact adaptive average pooling (torch AdaptiveAvgPool2d parity).

The reference's ArcFace extract_feats uses AdaptiveAvgPool2d((256,256)) and
((112,112)) (ddpm.py:98-104,112-124) — NOT bilinear resize. Bin i of an
n->m pool averages input[floor(i*n/m) : ceil((i+1)*n/m)], which differs from
bilinear especially on upsampling (224->256).

TPU-native formulation: the 1-D pooling is a constant (m, n) averaging
matrix, so the 2-D pool is two small matmuls (MXU work, exact, and
differentiable for the ID-loss backward path). Matrices are built in numpy
at trace time and folded as constants.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

__all__ = ["adaptive_avg_pool_matrix", "adaptive_avg_pool2d"]


@lru_cache(maxsize=64)
def adaptive_avg_pool_matrix(n: int, m: int) -> np.ndarray:
    """(m, n) matrix A with A @ x = adaptive_avg_pool1d(x, m)."""
    a = np.zeros((m, n), np.float32)
    for i in range(m):
        start = (i * n) // m
        end = -(-((i + 1) * n) // m)  # ceil
        a[i, start:end] = 1.0 / (end - start)
    return a


def adaptive_avg_pool2d(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """NHWC adaptive average pool to (out_h, out_w), exact torch semantics."""
    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    ah = jnp.asarray(adaptive_avg_pool_matrix(h, out_h))
    aw = jnp.asarray(adaptive_avg_pool_matrix(w, out_w))
    y = jnp.einsum("oh,bhwc->bowc", ah, x.astype(jnp.float32))
    y = jnp.einsum("pw,bowc->bopc", aw, y)
    return y.astype(x.dtype)
