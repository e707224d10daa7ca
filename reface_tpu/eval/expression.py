"""Expression error metric: D3DFR expression-coefficient L2.

Behavioral parity target (semantics, not code):
  /root/reference/eval_tool/Expression/expression_compare_face_recon.py:196-386
  — Deep3DFaceRecon's ResNet-50 regressor on target vs swap crops; metric is
  the mean L2 over the 64 expression coefficients (coeffs[80:144]). The CUDA
  rasterizer is not needed for coefficient extraction (SURVEY.md §2.6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from reface_tpu.eval.backbones import FaceReconCoeffNet

__all__ = ["expression_coeffs", "expression_l2"]


def expression_coeffs(params, images01: jnp.ndarray,
                      batch_size: int = 64) -> np.ndarray:
    """(N,224,224,3) in [0,1] -> (N,64) expression coefficients."""
    model = FaceReconCoeffNet()
    fwd = jax.jit(
        lambda p, x: FaceReconCoeffNet.split_coeffs(model.apply(p, x))["exp"]
    )
    out = []
    for i in range(0, images01.shape[0], batch_size):
        out.append(np.asarray(fwd(params, images01[i : i + batch_size])))
    return np.concatenate(out, axis=0)


def expression_l2(exp_target: np.ndarray, exp_swap: np.ndarray) -> float:
    return float(np.linalg.norm(exp_target - exp_swap, axis=1).mean())
