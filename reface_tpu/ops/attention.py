"""Fused multi-head attention dispatch (Pallas flash kernel on TPU).

The UNet's hot attention layers run over 4096 spatial tokens (64x64 latents
at ds=1); materializing (B*h, 4096, 4096) logits is pure HBM traffic. On TPU
we route to the Pallas flash-attention kernel (tiled online-softmax, logits
never leave VMEM); elsewhere (CPU tests) we fall back to a fp32-softmax
einsum that XLA fuses.

Head dims here are 40/80/160 (ch/8 at each UNet level) — below the 128-lane
tile, so q/k/v are zero-padded up to 128 lanes for the kernel; padding
columns contribute nothing to logits (zeros) and are sliced off the output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["multi_head_attention", "attention_bhnd"]

_LANE = 128


def _einsum_attention(q, k, v, scale):
    logits = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
    ) * scale
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", w, v)


def _flash_attention(q, k, v, scale):
    import os

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    b, h, n, d = q.shape
    m = k.shape[2]
    dp = max(_LANE, ((d + _LANE - 1) // _LANE) * _LANE)
    if dp != d:
        pad = ((0, 0), (0, 0), (0, 0), (0, dp - d))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    # block sizes: n is 1024/4096, kv seq may be tiny (cross-attn).
    # REFACE_FLASH_BLOCK="bq,bkv" overrides for kernel A/B benchmarking.
    bq0, bkv0 = 512, 1024
    env = os.environ.get("REFACE_FLASH_BLOCK")
    if env:
        bq0, bkv0 = (int(s) for s in env.split(","))
    bq = min(bq0, n)
    bkv = min(bkv0, m)
    sizes = BlockSizes(
        block_q=bq, block_k_major=bkv, block_k=bkv, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bkv, block_k_dkv=bkv,
        block_q_dkv=bq, block_k_major_dq=bkv, block_k_dq=bkv, block_q_dq=bq,
    )
    out = flash_attention(q, k, v, sm_scale=scale, block_sizes=sizes)
    return out[..., :d]


def attention_bhnd(q, k, v, scale: float | None = None, use_flash: bool | None = None):
    """Attention over (B, H, N, D) tensors. Returns (B, H, N, D)."""
    d = q.shape[-1]
    scale = d**-0.5 if scale is None else scale
    if use_flash is None:
        use_flash = (
            jax.default_backend() == "tpu"
            and q.shape[2] >= 1024
            and k.shape[2] >= 128
        )
    if use_flash:
        return _flash_attention(q, k, v, scale)
    return _einsum_attention(q, k, v, scale)


def multi_head_attention(q, k, v, num_heads: int, use_flash: bool | None = None):
    """(B, N, H*D) x (B, M, H*D) -> (B, N, H*D) with fp32-softmax."""
    b, n, inner = q.shape
    m = k.shape[1]
    d = inner // num_heads
    qh = q.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, m, num_heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, m, num_heads, d).transpose(0, 2, 1, 3)
    out = attention_bhnd(qh, kh, vh, use_flash=use_flash)
    return out.transpose(0, 2, 1, 3).reshape(b, n, inner)
