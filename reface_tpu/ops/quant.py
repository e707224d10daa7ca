"""Int8 serving-mode matmul helpers (v5e MXU runs int8 at 2x bf16 rate).

Symmetric quantization: per-output-channel weight scales, dynamic
per-tensor activation scale, int8 x int8 -> int32 dot via XLA
(preferred_element_type), dequantized into the requested output dtype.

This is a SERVING numerics mode (like ops/attention "fast"): outputs match
bf16 within ~1e-2 relative — quantify end-to-end deltas with
tools/compare_modes.py. Exact-protocol paths never route here.

Weight quantization happens inside jit from the live weights; within a
sampler's lax.scan the weights are loop-invariant so XLA hoists the
quantization out of the loop (verify per-config with the chain bench —
if hoisting regresses, pre-quantize outside the scan).

No reference counterpart (the reference serves fp16 torch); TPU-first
design per the scaling-book int8 recipe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["quant_int8", "int8_dense", "int8_conv"]


def quant_int8(w: jnp.ndarray, axis=0):
    """Symmetric per-channel int8 quantization.

    axis: the CONTRACTION axis of the weight — scales are computed per
    output channel (max over `axis`), so dequantization broadcasts over
    the output features.
    Returns (q int8, scale f32 with `axis` reduced but kept as size 1).
    """
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_dense(x: jnp.ndarray, w: jnp.ndarray,
               out_dtype=None) -> jnp.ndarray:
    """x @ w with both sides int8-quantized on the fly.

    x: (..., K) activations — dynamic PER-ROW (per-token) symmetric scales:
    an outlier token then only degrades its own row, and the dequant
    rescale is a rank-1 broadcast the MXU epilogue absorbs.
    w: (K, N) weights — per-output-channel scales.
    """
    out_dtype = out_dtype or x.dtype
    wq, w_scale = quant_int8(w, axis=0)  # (K,N) int8, (1,N) f32
    x32 = x.astype(jnp.float32)
    x_amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)  # (..., 1)
    x_scale = jnp.maximum(x_amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x32 / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * (x_scale * w_scale)).astype(out_dtype)


def int8_conv(x: jnp.ndarray, w: jnp.ndarray, *, strides=(1, 1),
              padding="SAME", out_dtype=None) -> jnp.ndarray:
    """NHWC conv with both sides int8-quantized on the fly.

    x: (B, H, W, I) activations — dynamic PER-SAMPLE symmetric scales
    (max over H/W/I): an outlier pixel then only degrades its own image,
    and the dequant rescale stays a rank-1 broadcast over the batch.
    (Per-pixel scales would be wrong here: one output pixel mixes kh*kw
    input pixels, so the scale must be constant across the window.)
    w: (kh, kw, I, O) HWIO kernel — per-output-channel scales (max over
    kh/kw/I), so dequantization broadcasts over O.
    """
    out_dtype = out_dtype or x.dtype
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=(0, 1, 2), keepdims=True)  # (1,1,1,O)
    w_scale = jnp.maximum(amax, 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w32 / w_scale), -127, 127).astype(jnp.int8)
    x32 = x.astype(jnp.float32)
    x_amax = jnp.max(jnp.abs(x32), axis=(1, 2, 3), keepdims=True)  # (B,1,1,1)
    x_scale = jnp.maximum(x_amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x32 / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, wq, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    scale = x_scale * w_scale.reshape(1, 1, 1, -1)  # (B,1,1,O)
    return (acc.astype(jnp.float32) * scale).astype(out_dtype)
