"""ID retrieval + similarity metric (ArcFace IR-SE-50).

Behavioral parity target (semantics, not code):
  /root/reference/eval_tool/ID_retrieval/ID_retrieval.py:104-390 —
  embed all true sources and all swap results with ArcFace (masked crop per
  dataset rules), compute the (n_swaps, n_sources) cosine matrix, report
  Top-1 / Top-5 retrieval accuracy of each swap's true source and the mean
  cosine to the true source.

TPU notes: embedding is one jitted batched IRSE50 fwd; the retrieval matmul
is a single (N x 512)(512 x N) MXU gemm.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from reface_tpu.nn.arcface import ArcFaceConfig, IRSE50

__all__ = ["embed_identities", "id_retrieval_metrics"]


def embed_identities(params, images: jnp.ndarray, batch_size: int = 64,
                     config: ArcFaceConfig | None = None) -> np.ndarray:
    """(N,112,112,3) ArcFace-ready crops in [-1,1] -> (N,512) l2-normed."""
    model = IRSE50(config or ArcFaceConfig())
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    out = []
    for i in range(0, images.shape[0], batch_size):
        out.append(np.asarray(fwd(params, images[i : i + batch_size])))
    return np.concatenate(out, axis=0)


def id_retrieval_metrics(swap_feats: np.ndarray, source_feats: np.ndarray,
                         true_idx: np.ndarray | None = None) -> dict:
    """Cosine retrieval of each swap's source.

    swap_feats: (N, D) l2-normed; source_feats: (M, D) l2-normed;
    true_idx: (N,) index of each swap's true source (default arange).
    """
    n = swap_feats.shape[0]
    if true_idx is None:
        true_idx = np.arange(n)
    sim = swap_feats @ source_feats.T  # (N, M) cosines
    order = np.argsort(-sim, axis=1)
    top1 = (order[:, 0] == true_idx).mean()
    top5 = np.any(order[:, :5] == true_idx[:, None], axis=1).mean()
    mean_cos = sim[np.arange(n), true_idx].mean()
    return {
        "top1": float(top1),
        "top5": float(top5),
        "mean_id_cosine": float(mean_cos),
    }
