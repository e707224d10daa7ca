"""Fused GroupNorm(+SiLU) Pallas kernel.

One of the two named hot ops in the rebuild plan (BASELINE.json north star:
"Pallas fused cross-attention and GroupNorm+SiLU kernels"). The UNet/VAE
apply GroupNorm32 -> SiLU before almost every conv; fusing the fp32
statistics, normalization, affine, and activation into one VMEM-resident
kernel avoids materializing the fp32 intermediate in HBM.

Grid: one program per batch item; the (H*W, C) activation block lives in
VMEM (<= ~5 MB at the UNet's largest 64x64x320 bf16 level). Statistics are
computed in fp32 over (H*W, C/G) per group; output returns in the input
dtype. Falls back to the plain XLA path off-TPU (tests compare the two).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["group_norm_silu"]


def _reference_impl(x, scale, bias, groups: int, eps: float, silu: bool):
    b = x.shape[0]
    c = x.shape[-1]
    x32 = x.astype(jnp.float32).reshape(b, -1, groups, c // groups)
    mean = x32.mean(axis=(1, 3), keepdims=True)
    var = jnp.mean((x32 - mean) ** 2, axis=(1, 3), keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(x.shape) * scale + bias
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _kernel(x_ref, scale_ref, bias_ref, out_ref, *, groups: int, eps: float,
            silu: bool):
    x = x_ref[0].astype(jnp.float32)  # (HW, C)
    hw, c = x.shape
    cg = c // groups
    # channel -> group one-hot matrix (C, G), built from 2D iotas (Mosaic
    # forbids >2D reshapes over the lane dim, so stats go through matmuls)
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cg
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    m = (ch == gr).astype(jnp.float32)

    s1 = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
    s2 = jnp.sum(x * x, axis=0, keepdims=True)
    n = float(hw * cg)
    gmean = jnp.dot(s1, m, preferred_element_type=jnp.float32) / n  # (1, G)
    gsq = jnp.dot(s2, m, preferred_element_type=jnp.float32) / n
    gvar = gsq - gmean * gmean
    mean_c = jnp.dot(gmean, m.T, preferred_element_type=jnp.float32)  # (1, C)
    rstd_c = jnp.dot(jax.lax.rsqrt(gvar + eps), m.T,
                     preferred_element_type=jnp.float32)
    y = (x - mean_c) * rstd_c * scale_ref[:] + bias_ref[:]
    if silu:
        y = y * jax.nn.sigmoid(y)
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "silu"))
def group_norm_silu(x, scale, bias, groups: int = 32, eps: float = 1e-5,
                    silu: bool = True):
    """NHWC GroupNorm (+SiLU). scale/bias: (C,) fp32. Returns x.dtype."""
    b, h, w, c = x.shape
    # fp32 working set per program: x, x^2, y (+ in/out blocks). Beyond the
    # VMEM budget the XLA path wins anyway (it fuses the cast/norm/silu
    # epilogue into neighboring ops), so fall back rather than tile.
    vmem_bytes = h * w * c * 4 * 3
    if jax.default_backend() != "tpu" or vmem_bytes > 4 * 1024 * 1024:
        return _reference_impl(x, scale, bias, groups, eps, silu)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    xf = x.reshape(b, h * w, c)
    kern = functools.partial(_kernel, groups=groups, eps=eps, silu=silu)
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
    )(xf, scale.astype(jnp.float32), bias.astype(jnp.float32))
    return out.reshape(b, h, w, c)
