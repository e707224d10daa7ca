"""Overlapping spatial tiling (fold/unfold) for large-resolution latents.

Behavioral parity target (semantics, not code):
  /root/reference/ldm/models/diffusion/ddpm.py:1138-1188 (border weighting),
  :1286-1337 / :1401-1434 / :1530-1608 (tiled decode/encode/UNet apply) —
  the inactive `split_input_params` machinery: split the latent into
  overlapping patches, run the network per patch, fold back with smooth
  border weights. This is the reference's only "scale the spatial dim"
  mechanism (SURVEY.md §5).

TPU-native: tiles are gathered into a single batched tensor (one big MXU
program instead of a per-patch Python loop) and can be sharded over the
`data` mesh axis — the sharded spatial-tile map from SURVEY.md §2.7.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["unfold", "fold", "tiled_apply", "border_weights"]


def _starts(size: int, tile: int, stride: int) -> np.ndarray:
    if size <= tile:
        return np.array([0])
    s = np.arange(0, size - tile + 1, stride)
    if s[-1] != size - tile:
        s = np.append(s, size - tile)
    return s


def border_weights(tile: int, power: float = 1.0) -> np.ndarray:
    """Smooth weighting that decays toward tile borders (clip-normalized
    triangular profile, matching the reference's default weighting mode)."""
    ramp = np.minimum(np.arange(1, tile + 1), np.arange(tile, 0, -1)).astype(
        np.float64
    )
    ramp = (ramp / ramp.max()) ** power
    w = np.outer(ramp, ramp)
    return (w / w.max()).astype(np.float32)


def unfold(x: jnp.ndarray, tile: int, stride: int):
    """(B,H,W,C) -> (B*T, tile, tile, C) overlapping tiles + fold metadata."""
    b, h, w, c = x.shape
    ys = _starts(h, tile, stride)
    xs = _starts(w, tile, stride)
    tiles = []
    for y0 in ys:
        for x0 in xs:
            tiles.append(x[:, y0 : y0 + tile, x0 : x0 + tile, :])
    out = jnp.concatenate(tiles, axis=0)  # (T*B, t, t, C) grouped by tile
    meta = dict(ys=ys, xs=xs, batch=b, h=h, w=w, tile=tile)
    return out, meta


def fold(tiles: jnp.ndarray, meta: dict, out_channels: int | None = None,
         scale: float = 1) -> jnp.ndarray:
    """Weighted fold of (T*B, t*s, t*s, C) tiles back to (B, H*s, W*s, C).

    scale may be fractional (e.g. 1/8 for a VAE encode) as long as every
    tile start and the tile size stay integral after scaling."""
    b = meta["batch"]
    tile = int(round(meta["tile"] * scale))
    h, w = int(round(meta["h"] * scale)), int(round(meta["w"] * scale))
    c = out_channels or tiles.shape[-1]
    weights = jnp.asarray(border_weights(tile))[None, :, :, None]
    acc = jnp.zeros((b, h, w, c), tiles.dtype)
    norm = jnp.zeros((b, h, w, 1), tiles.dtype)
    i = 0
    for y0 in meta["ys"]:
        for x0 in meta["xs"]:
            y, x = int(round(y0 * scale)), int(round(x0 * scale))
            patch = tiles[i * b : (i + 1) * b] * weights
            acc = acc.at[:, y : y + tile, x : x + tile, :].add(patch)
            norm = norm.at[:, y : y + tile, x : x + tile, :].add(weights)
            i += 1
    return acc / jnp.maximum(norm, 1e-8)


def tiled_apply(fn, x: jnp.ndarray, tile: int, stride: int,
                out_channels: int | None = None, scale: float = 1) -> jnp.ndarray:
    """Apply fn to overlapping tiles as ONE batched call and fold back.

    fn: (N, tile, tile, C) -> (N, tile*scale, tile*scale, C') — e.g. a VAE
    decode (scale=8) or a UNet eps prediction (scale=1).
    """
    tiles, meta = unfold(x, tile, stride)
    out = fn(tiles)
    return fold(out, meta, out_channels=out_channels, scale=scale)
