"""Shared NN building blocks (flax.linen), NHWC layout, TPU-first.

Conventions:
  - All image tensors are NHWC (TPU-native conv layout).
  - Params live in float32; `dtype` controls compute/activation precision
    (bfloat16 by default on TPU). GroupNorm always reduces in float32
    (parity with the reference's GroupNorm32, dm/util.py:203-215 semantics).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["GroupNorm32", "CrossAttention", "FeedForwardGEGLU", "QDense",
           "zeros_init"]


class QDense(nn.Module):
    """nn.Dense-compatible layer (same param tree: kernel fp32 lecun-normal
    + bias zeros) whose matmul optionally runs int8 x int8 -> int32 on the
    MXU (ops/quant.py) — the serving-mode quantization path. quant="none"
    reproduces nn.Dense exactly; quant="int8conv" also keeps the matmul in
    the requested dtype (the conv-only quantization mode: the round-4 chain
    ablation measured the int8 TRANSFORMER side ~1.4 ms/fwd SLOWER than
    bf16 — quantize/dequantize VPU cost exceeds the MXU gain there — while
    the conv side saves 2.37 ms, see BENCH_LOG 'Round-4 conv-side
    attribution')."""

    features: int
    dtype: jnp.dtype = jnp.float32
    use_bias: bool = True
    quant: str = "none"

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        if self.quant == "int8":
            from reface_tpu.ops.quant import int8_dense

            y = int8_dense(x, kernel, out_dtype=self.dtype)
        else:
            y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y

zeros_init = nn.initializers.zeros


class QConv(nn.Module):
    """nn.Conv-compatible NHWC conv (same param tree: HWIO kernel
    lecun-normal + bias zeros) whose conv optionally runs int8 x int8 ->
    int32 on the MXU (ops/quant.py int8_conv) — the serving-mode
    quantization path for the UNet's ResBlock convs."""

    features: int
    kernel_size: tuple = (3, 3)
    padding: int = 1
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"
    kernel_init: object = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        pad = [(self.padding, self.padding)] * 2
        if self.quant in ("int8", "int8conv"):
            from reface_tpu.ops.quant import int8_conv

            y = int8_conv(x, kernel, padding=pad, out_dtype=self.dtype)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype), (1, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return y + bias.astype(y.dtype)


class _FusedGroupNormSiLU(nn.GroupNorm):
    """nn.GroupNorm param layout, fused Pallas GN+SiLU forward."""

    @nn.compact
    def __call__(self, x):
        from reface_tpu.ops.groupnorm import group_norm_silu

        feats = x.shape[-1]
        scale = self.param("scale", self.scale_init, (feats,),
                           self.param_dtype)
        bias = self.param("bias", self.bias_init, (feats,), self.param_dtype)
        return group_norm_silu(x, scale, bias, groups=self.num_groups,
                               eps=self.epsilon, silu=True)


class GroupNorm32(nn.Module):
    """GroupNorm(32) computed in float32 regardless of input dtype.

    Parity with the reference's GroupNorm32 (dm/util.py:203-215). Measured
    note: upcast-GN-downcast is FASTER on TPU than GN(dtype=bf16) (79 vs
    92 ms UNet fwd) — XLA fuses the fp32 island cleanly — so this stays the
    fp32 form while the transformer LayerNorms run in the compute dtype.

    fuse_silu=True returns SiLU(GroupNorm(x)) through the fused Pallas
    kernel (ops/groupnorm.py) with the SAME param tree (GroupNorm_0/scale,
    bias); callers then skip their own nn.silu.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    fuse_silu: bool = False

    @nn.compact
    def __call__(self, x):
        groups = min(self.num_groups, x.shape[-1])  # tiny test configs
        if self.fuse_silu:
            return _FusedGroupNormSiLU(
                num_groups=groups,
                epsilon=self.epsilon,
                param_dtype=jnp.float32,
                name="GroupNorm_0",
            )(x)
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        out = nn.GroupNorm(
            num_groups=groups,
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x)
        return out.astype(orig_dtype)


class _ProjKernel(nn.Module):
    """Declares a bias-free Dense kernel (same scope/name/init as
    nn.Dense(use_bias=False)) and returns it, so several projections can be
    fused into one gemm without changing the checkpoint layout."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_features, self.features),
        )


def _attention(q, k, v, num_heads: int, impl: str = "auto"):
    """Multi-head attention over (B, N, H*D); specialized Pallas kernels on
    TPU (see ops/attention.py routing), fp32-softmax einsum otherwise."""
    from reface_tpu.ops.attention import multi_head_attention

    return multi_head_attention(q, k, v, num_heads, impl=impl)


class CrossAttention(nn.Module):
    """Q from x, K/V from context (self-attention when context is None).

    Parity: ldm/modules/attention.py:152-222 including the 1536-d split-context
    path that routes CLIP/ID features to heads [:6] and landmark features to
    heads [6:] (head_splits=[6,2]).
    """

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    head_splits: tuple = (6, 2)
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"  # auto | fast | flash | einsum (ops/attention)
    quant: str = "none"  # "int8": serving-mode MXU int8 for the self-attn
    #                      QKV gemm + output projection (ops/quant.py)

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.heads * self.dim_head
        ctx_dim = self.context_dim or self.query_dim
        dense = lambda feat, name: nn.Dense(
            feat, use_bias=False, dtype=self.dtype, name=name
        )
        ctx = x if context is None else context
        if context is None:
            # self-attention: one fused (N, C) @ (C, 3*inner) gemm instead of
            # three — identical math (each output column depends on exactly
            # one weight column), same param tree (to_q/to_k/to_v kernels)
            wq = _ProjKernel(inner, name="to_q")(ctx_dim)
            wk = _ProjKernel(inner, name="to_k")(ctx_dim)
            wv = _ProjKernel(inner, name="to_v")(ctx_dim)
            if self.quant == "int8":
                from reface_tpu.ops.quant import int8_dense

                w = jnp.concatenate([wq, wk, wv], axis=1)
                qkv = int8_dense(x, w, out_dtype=self.dtype)
            else:
                w = jnp.concatenate([wq, wk, wv], axis=1).astype(self.dtype)
                qkv = jnp.dot(x.astype(self.dtype), w)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            out = _attention(q, k, v, self.heads, impl=self.attn_impl)
            return QDense(self.query_dim, dtype=self.dtype,
                          quant=self.quant, name="to_out")(out)

        to_k = dense(inner, "to_k")
        to_v = dense(inner, "to_v")

        if context is not None and ctx.shape[-2] == 1:
            # Single-token context: softmax over one key is identically 1, so
            # attention output == V broadcast over queries. Skip Q/K/logits
            # entirely (exact, not an approximation). to_q/to_k params still
            # exist for checkpoint parity.
            dense(inner, "to_q")(x[..., :1, :])  # materialize params (DCE'd)
            if ctx.shape[-1] == 2 * ctx_dim:
                c1, c2 = jnp.split(ctx, 2, axis=-1)
                s0 = self.head_splits[0] * self.dim_head
                s1 = self.head_splits[1] * self.dim_head
                to_k(c1)  # materialize to_k params
                v = jnp.concatenate(
                    [to_v(c1)[..., :s0], to_v(c2)[..., inner - s1:]], -1
                )
            else:
                to_k(ctx)
                v = to_v(ctx)
            # to_out on the ONE token, then broadcast: every query row of the
            # broadcast value is identical, so projecting first is bitwise
            # the same as projecting the (B,N,inner) broadcast — and skips an
            # N-token matmul (~1.3% of the UNet fwd) plus its HBM write. The
            # residual add downstream fuses the broadcast.
            out1 = nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(v)
            return jnp.broadcast_to(out1, x.shape[:-1] + (self.query_dim,))

        q = dense(inner, "to_q")(x)
        if context is not None and ctx.shape[-1] == 2 * ctx_dim:
            # Split context: first half -> heads[:s0], second half -> heads[s0:].
            c1, c2 = jnp.split(ctx, 2, axis=-1)
            s0 = self.head_splits[0] * self.dim_head
            s1 = self.head_splits[1] * self.dim_head
            k = jnp.concatenate([to_k(c1)[..., :s0], to_k(c2)[..., inner - s1:]], -1)
            v = jnp.concatenate([to_v(c1)[..., :s0], to_v(c2)[..., inner - s1:]], -1)
        else:
            k = to_k(ctx)
            v = to_v(ctx)
        out = _attention(q, k, v, self.heads, impl=self.attn_impl)
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)


class FeedForwardGEGLU(nn.Module):
    """GEGLU feed-forward: proj to 2*4d, gate with gelu, project back."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        h = QDense(inner * 2, dtype=self.dtype, quant=self.quant,
                   name="proj_in")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate)
        return QDense(self.dim, dtype=self.dtype, quant=self.quant,
                      name="proj_out")(h)
