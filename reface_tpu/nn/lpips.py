"""LPIPS perceptual distance (AlexNet features + linear calibration), flax.

Behavioral parity target (semantics, not code):
  /root/reference/eval_tool/lpips/lpips.py:8-35 and networks.py — AlexNet
  conv stack (5 feature taps after each ReLU), per-tap channel-unit-normalize,
  squared diff, 1x1 linear calibration weights, spatial mean, sum over taps.
  Input is [-1,1] RGB, normalized with LPIPS's shift/scale constants.
  Used as a *training loss* at scales 512/256/128 (ddpm.py:1779-1797).

TPU notes: AlexNet's convs are tiny; the whole distance fuses into one XLA
program and is differentiable for the LPIPS training term.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["AlexNetFeatures", "LPIPS"]

# LPIPS input scaling constants (from the official implementation)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_ALEX = [
    # (out_ch, kernel, stride, padding, pool_before)
    (64, 11, 4, 2, False),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, True),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
]


class AlexNetFeatures(nn.Module):
    """Returns the 5 post-ReLU feature maps of torchvision AlexNet.features."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = []
        h = x
        for i, (ch, k, s, p, pool) in enumerate(_ALEX):
            if pool:
                h = nn.max_pool(h, (3, 3), strides=(2, 2))
            h = nn.Conv(ch, (k, k), strides=s, padding=p, dtype=self.dtype,
                        name=f"conv{i}")(h)
            h = nn.relu(h)
            feats.append(h)
        return feats


def _unit_normalize(f):
    # exact eps semantics of the reference's normalize_activation
    # (eval_tool/lpips/utils.py:6-8): x / (sqrt(sum x^2 + 1e-16) + 1e-10)
    norm = jnp.sqrt(
        jnp.sum(f.astype(jnp.float32) ** 2, axis=-1, keepdims=True) + 1e-16
    )
    return f / (norm + 1e-10)


class LPIPS(nn.Module):
    """lpips(x, y) for NHWC images in [-1,1]; returns (B,) distances."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        net = AlexNetFeatures(dtype=self.dtype, name="alex")
        xin = (x - _SHIFT) / _SCALE
        yin = (y - _SHIFT) / _SCALE
        fx = net(xin)
        fy = net(yin)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
            w = nn.Conv(1, (1, 1), use_bias=False, dtype=jnp.float32,
                        name=f"lin{i}")(d.astype(jnp.float32))
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total
