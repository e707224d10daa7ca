"""Thin-plate-spline warping + grid sampling, pure JAX (device-batched).

Behavioral parity target (semantics, not code):
  /root/reference/thinplatespline/tps.py (U(r) = r^2 log r^2 kernel, L-matrix
  solve, [-1,1] grid convention) and the `decow` mask augmentation
  (ldm/data/celebA.py:83-95): 3x3 control grid, interior points jittered by
  U(-0.5, 0.5)*scale, bilinear grid_sample with zeros padding and
  align_corners=False.

TPU notes: the solve is a tiny (p+3) linear system -> jnp.linalg.solve; the
grid evaluation and sampling are fully vectorized and vmap/batch friendly, so
mask augmentation runs on-device inside the input pipeline's jitted collate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["tps_coefs", "tps_warp", "tps_grid", "grid_sample_2d", "random_tps_mask_warp"]


def _u_kernel(r2: jnp.ndarray) -> jnp.ndarray:
    """TPS radial kernel U(r) = r^2 log(r^2), with U(0) = 0."""
    safe = jnp.where(r2 <= 1e-12, 1.0, r2)
    return safe * jnp.log(safe) * jnp.where(r2 <= 1e-12, 0.0, 1.0)


def _pairwise_r2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    diff = a[:, None, :] - b[None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def tps_coefs(x: jnp.ndarray, y: jnp.ndarray):
    """Solve for TPS mapping control points x -> y.

    x, y: (p, 2). Returns (w, a): (p,2) non-affine and (3,2) affine weights.
    """
    p = x.shape[0]
    k = _u_kernel(_pairwise_r2(x, x))
    pm = jnp.concatenate([jnp.ones((p, 1)), x], axis=1)  # (p, 3)
    top = jnp.concatenate([k, pm], axis=1)
    bot = jnp.concatenate([pm.T, jnp.zeros((3, 3))], axis=1)
    l = jnp.concatenate([top, bot], axis=0)
    rhs = jnp.concatenate([y, jnp.zeros((3, 2))], axis=0)
    q = jnp.linalg.solve(l, rhs)
    return q[:p], q[p:]


def tps_warp(x: jnp.ndarray, y: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Map pts (m,2) through the TPS defined by control points x->y."""
    w, a = tps_coefs(x, y)
    u = _u_kernel(_pairwise_r2(pts, x))
    pm = jnp.concatenate([jnp.ones((pts.shape[0], 1)), pts], axis=1)
    return pm @ a + u @ w


def tps_grid(x: jnp.ndarray, y: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """(H, W, 2) sampling grid in [-1,1] for grid_sample_2d."""
    gy, gx = jnp.meshgrid(
        jnp.linspace(-1.0, 1.0, height), jnp.linspace(-1.0, 1.0, width),
        indexing="ij",
    )
    pts = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)
    return tps_warp(x, y, pts).reshape(height, width, 2)


def grid_sample_2d(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample NHWC `img` at `grid` (B,H,W,2) in [-1,1] (x,y order).

    Matches torch.grid_sampler_2d(mode=bilinear, padding=zeros,
    align_corners=False): pixel = ((coord + 1) * size - 1) / 2, out-of-range
    contributions are zero.
    """
    b, h, w, c = img.shape
    gx = ((grid[..., 0] + 1.0) * w - 1.0) / 2.0
    gy = ((grid[..., 1] + 1.0) * h - 1.0) / 2.0

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0

    def gather(yy, xx):
        inside = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        vals = jax.vmap(lambda im, yb, xb: im[yb, xb])(img, yi, xi)
        return vals * inside[..., None].astype(img.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = wx[..., None].astype(img.dtype)
    wy = wy[..., None].astype(img.dtype)
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def random_tps_mask_warp(
    key: jax.Array, mask: jnp.ndarray, scale_range=(0.5, 1.0), grid_n: int = 3
) -> jnp.ndarray:
    """The `decow` augmentation: jitter the interior of a grid_n x grid_n
    control grid and TPS-warp the (B,H,W,1) mask. scale ~ U(scale_range)."""
    b, h, w, _ = mask.shape
    k_scale, k_noise = jax.random.split(key)
    scale = jax.random.uniform(
        k_scale, (), minval=scale_range[0], maxval=scale_range[1]
    )
    lin = jnp.linspace(-1.0, 1.0, grid_n)
    gy, gx = jnp.meshgrid(lin, lin, indexing="ij")
    ctrl = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)  # (n*n, 2)
    noise = (jax.random.uniform(k_noise, (grid_n - 2, grid_n - 2, 2)) - 0.5) * scale
    full_noise = jnp.zeros((grid_n, grid_n, 2)).at[1:-1, 1:-1].set(noise)
    warped_ctrl = ctrl + full_noise.reshape(-1, 2)
    grid = tps_grid(ctrl, warped_ctrl, h, w)
    grid = jnp.broadcast_to(grid[None], (b, h, w, 2))
    return grid_sample_2d(mask, grid)
