"""PatchGAN discriminator for VAE first-stage training, flax (NHWC).

Behavioral parity target (semantics, not code): the `NLayerDiscriminator`
that `ldm/modules/losses/contperceptual.py:22-25` instantiates from the
taming-transformers dependency (pix2pix PatchGAN: 4x4 convs, stride-2
pyramid to min(2^n, 8)*ndf channels, BatchNorm + LeakyReLU(0.2), a
stride-1 level, then a 1-channel head), including its `weights_init`
(conv kernels ~ N(0, 0.02); norm scale ~ N(1.0, 0.02), bias 0) and the
bias-free convs under BatchNorm.

TPU notes: training-loss-only network — BatchNorm here normalizes by the
*batch statistics* (torch train-mode math) and tracks no running averages,
so the module is stateless/pure and the whole discriminator fuses into the
training step's XLA program. It is never used at inference.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["NLayerDiscriminator"]


class _BatchStatNorm(nn.Module):
    """BatchNorm2d train-mode math without running-stat state."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x32 = x.astype(jnp.float32)
        mean = x32.mean(axis=(0, 1, 2))
        var = x32.var(axis=(0, 1, 2))
        scale = self.param(
            "scale", nn.initializers.normal(0.02, jnp.float32), (c,)
        ) + 1.0  # N(1.0, 0.02) parity without a custom initializer
        bias = self.param("bias", nn.initializers.zeros, (c,))
        y = (x32 - mean) / jnp.sqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)


class NLayerDiscriminator(nn.Module):
    """(B,H,W,C) image -> (B,h,w,1) patch logits."""

    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw_init = nn.initializers.normal(0.02, jnp.float32)
        h = nn.Conv(self.ndf, (4, 4), strides=2, padding=1,
                    kernel_init=kw_init, dtype=self.dtype, name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        mult = 1
        for n in range(1, self.n_layers + 1):
            mult = min(2 ** n, 8)
            stride = 2 if n < self.n_layers else 1
            h = nn.Conv(self.ndf * mult, (4, 4), strides=stride, padding=1,
                        use_bias=False, kernel_init=kw_init,
                        dtype=self.dtype, name=f"conv{n}")(h)
            h = _BatchStatNorm(name=f"norm{n}")(h)
            h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4), strides=1, padding=1, kernel_init=kw_init,
                       dtype=self.dtype, name="head")(h).astype(jnp.float32)
