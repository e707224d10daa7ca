"""Pallas self-attention specialized for the UNet's small head dims.

The SD UNet's self-attention runs 8 heads of d=40/80/160 over 4096/1024/256
spatial tokens. The generic flash kernel pads d to 128 lanes and pays
online-softmax bookkeeping per kv block; here K and V for one (batch, head)
are small enough to sit WHOLE in VMEM (4096 x 40 bf16 = 320 KB), so each
program computes a q-tile's full score row, one single-pass softmax, and
the PV gemm — no running-max rescaling, fewer VPU passes.

exp2 trick: softmax uses exp2((s - max) * log2(e)) — the VPU's pow2 is the
native transcendental; the scale fold is free inside the q preprocessing.

Numerics: scores accumulate in fp32, softmax in fp32, PV in bf16 inputs /
fp32 accumulation — same precision story as the flash kernel and the
fp32-softmax einsum reference path (tested against it).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

__all__ = ["self_attention_smalld"]

_LOG2E = math.log2(math.e)
_SHIFT_COLS = 256


def _shift(s):
    """Cheap softmax shift: row max over the first kv block (exact — softmax
    is shift-invariant; headroom to overflow is ~2^120)."""
    cols = min(_SHIFT_COLS, s.shape[1])
    return jnp.max(s[:, :cols], axis=1, keepdims=True)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, fast: bool):
    q = q_ref[0]  # (bq, d)
    k = k_ref[0]  # (m, d)
    v = v_ref[0]  # (m, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, m)
    s = s * (scale * _LOG2E)
    if fast:
        # fp32 exp2 has ~2^127 of headroom, so the row-max shift exists only
        # for fp16-era safety — skip it in fast mode.
        p = jnp.exp2(s).astype(v.dtype)
    else:
        # bf16 probs = the fp32-softmax-then-cast numerics of the einsum
        # reference path. Softmax is shift-invariant, so ANY shift is exact;
        # the max over one kv block bounds the true max within the logit
        # spread (<< the fp32/bf16 exponent range) at 1/16 the VPU cost.
        p = jnp.exp2(s - _shift(s)).astype(v.dtype)
    # row-sum folded into the PV gemm as a trailing ones-column
    ones = jnp.ones((v.shape[0], 1), v.dtype)
    vo = jnp.concatenate([v, ones], axis=1)  # (m, d+1)
    ol = jax.lax.dot_general(
        p, vo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, d+1)
    d = v.shape[1]
    o_ref[0] = (ol[:, :d] / ol[:, d:]).astype(o_ref.dtype)


def _kernel_tn(qt_ref, kt_ref, vo_ref, ot_ref, *, scale: float, fast: bool):
    """Transpose-friendly variant: contraction rides sublanes.

    qt: (d, bq), kt: (d, m) -> TN gemm s=(bq, m) with K=d on sublanes of
    both operands (pad 40->48 instead of ->128 lanes); PV emitted
    transposed ot=(d+1, bq) so the small output dim rides sublanes too.
    """
    qt = qt_ref[0]  # (d, bq)
    kt = kt_ref[0]  # (d, m)
    vo = vo_ref[0]  # (m, d+1)  [v | ones]
    s = jax.lax.dot_general(
        qt, kt, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, m)
    s = s * (scale * _LOG2E)
    if fast:
        p = jnp.exp2(s).astype(vo.dtype)
    else:
        # bf16 probs = the fp32-softmax-then-cast numerics of the einsum
        # reference path; exact mode uses the cheap one-block shift (see
        # _shift — softmax is shift-invariant, so this is exact)
        p = jnp.exp2(s - _shift(s)).astype(vo.dtype)
    # ot = vo^T @ p^T as dot_general contracting m on sublanes/lanes; the
    # trailing ones-column folds the row-sum into the same gemm
    ot = jax.lax.dot_general(
        vo, p, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (d+1, bq)
    d = vo.shape[1] - 1
    ot_ref[0] = (ot[:d] / ot[d:]).astype(ot_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("scale", "block_q", "fast", "layout"))
def self_attention_smalld(q, k, v, scale: float | None = None,
                          block_q: int = 256, fast: bool = False,
                          layout: str = "nn"):
    """(BH, N, D) self-attention with whole-KV-in-VMEM single-pass softmax.

    q/k/v: (BH, N, D) with D <= 128 and N*D small enough for VMEM
    (N=4096, D<=160 comfortably fits). Returns (BH, N, D) in q.dtype.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, n, d = q.shape
    m = k.shape[1]
    scale = d**-0.5 if scale is None else scale
    bq = min(block_q, n)
    grid = (bh, pl.cdiv(n, bq))
    if layout == "nn":
        kern = functools.partial(_kernel, scale=scale, fast=fast)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m, d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m, d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        )(q, k, v)

    # layout == "tn": transposed operands, contraction on sublanes
    qt = jnp.swapaxes(q, 1, 2)  # (bh, d, n)
    kt = jnp.swapaxes(k, 1, 2)  # (bh, d, m)
    vo = jnp.concatenate(
        [v, jnp.ones((bh, m, 1), v.dtype)], axis=2
    )  # (bh, m, d+1)
    kern = functools.partial(_kernel_tn, scale=scale, fast=fast)
    ot = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, d, bq), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, m), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d + 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, bq), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, d, n), q.dtype),
    )(qt, kt, vo)
    return jnp.swapaxes(ot, 1, 2)
