"""Pose error metric: Hopenet yaw/pitch/roll L2 between target and swap.

Behavioral parity target (semantics, not code):
  /root/reference/eval_tool/Pose/pose_compare.py:101-326 — Hopenet
  (ResNet-50, 66 bins) on ImageNet-normalized 224^2 crops of target vs swap;
  angles decoded by expectation (softmax * idx * 3 - 99); metric = mean L2
  over the (yaw, pitch, roll) triplet.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from reface_tpu.eval.backbones import Hopenet, decode_hopenet_angles

__all__ = ["pose_angles", "pose_l2"]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def pose_angles(params, images01: jnp.ndarray, batch_size: int = 64) -> np.ndarray:
    """(N,224,224,3) in [0,1] -> (N,3) degrees (yaw, pitch, roll)."""
    model = Hopenet()

    def fwd(p, x):
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        yaw, pitch, roll = model.apply(p, x)
        return jnp.stack(
            [decode_hopenet_angles(l) for l in (yaw, pitch, roll)], axis=-1
        )

    fwd = jax.jit(fwd)
    out = []
    for i in range(0, images01.shape[0], batch_size):
        out.append(np.asarray(fwd(params, images01[i : i + batch_size])))
    return np.concatenate(out, axis=0)


def pose_l2(angles_target: np.ndarray, angles_swap: np.ndarray) -> float:
    """Mean L2 distance over (yaw, pitch, roll) triplets, in degrees."""
    d = np.linalg.norm(angles_target - angles_swap, axis=1)
    return float(d.mean())
