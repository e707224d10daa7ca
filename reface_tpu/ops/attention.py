"""Fused multi-head attention dispatch (Pallas kernels on TPU).

The UNet's hot self-attention runs 8 heads of d=40/80/160 over 4096/1024/256
spatial tokens. Generic flash attention pads d to the 128-lane tile and pays
online-softmax bookkeeping; the specialized ops/attention_smalld kernel keeps
the whole K/V in VMEM, does one single-pass softmax per q-tile, and (at 4096
tokens) uses sublane-contraction gemm layouts — measured on v5e at CFG-batch
8 (tools/bench_attn.py, ms per level-1 attention):

    einsum fp32-softmax   (baseline)   |  flash   6.11
    smalld nn exact 5.55 / fast 4.70   |  tn exact 4.46 / tn fast 3.86

Routing (impl="auto"): self-attention n>=2048 -> smalld tn; n>=512 ->
smalld nn; otherwise (and on CPU, and under differentiation via
impl="flash") the einsum/flash paths. impl="fast" additionally skips the
row-max shift and emits bf16 probs (serving mode; fp32 exp2 cannot
overflow for sane logits).

The smalld kernels have no custom VJP — training keeps impl="flash"
(pipelines/train.py forces it), inference uses the scan samplers where no
grads flow.
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


def _smalld_attention(q, k, v, scale, fast: bool):
    from reface_tpu.ops.attention_smalld import self_attention_smalld

    b, h, n, d = q.shape
    m = k.shape[2]
    layout = "tn" if n >= 2048 else "nn"
    out = self_attention_smalld(
        q.reshape(b * h, n, d), k.reshape(b * h, m, d),
        v.reshape(b * h, m, d), scale=scale, fast=fast, layout=layout,
    )
    return out.reshape(b, h, n, d)


def attention_bhnd(q, k, v, scale: float | None = None,
                   use_flash: bool | None = None, impl: str = "auto"):
    """Attention over (B, H, N, D) tensors. Returns (B, H, N, D)."""
    d = q.shape[-1]
    n, m = q.shape[2], k.shape[2]
    scale = d**-0.5 if scale is None else scale
    if use_flash is not None:  # legacy/test toggle
        impl = "flash" if use_flash else "einsum"
    on_tpu = jax.default_backend() == "tpu"
    if impl in ("auto", "fast") and on_tpu and n == m and n >= 512 and d <= 256:
        return _smalld_attention(q, k, v, scale, fast=(impl == "fast"))
    if impl != "einsum" and on_tpu and n >= 1024 and m >= 128:
        return _flash_attention(q, k, v, scale)
    return _einsum_attention(q, k, v, scale)


def multi_head_attention(q, k, v, num_heads: int,
                         use_flash: bool | None = None, impl: str = "auto"):
    """(B, N, H*D) x (B, M, H*D) -> (B, N, H*D) with fp32-softmax."""
    b, n, inner = q.shape
    m = k.shape[1]
    d = inner // num_heads
    qh = q.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, m, num_heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, m, num_heads, d).transpose(0, 2, 1, 3)
    out = attention_bhnd(qh, kh, vh, use_flash=use_flash, impl=impl)
    return out.transpose(0, 2, 1, 3).reshape(b, n, inner)
