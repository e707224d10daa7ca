"""Ready-made guidance losses for the gradient-guided DDIM sampler.

Behavioral parity target (semantics, not code):
  /root/reference/ldm/models/diffusion/ddim_guided.py:380-609 — the
  experimental guidance terms on the differentiably-decoded pred_x0 image
  (the ID and 3DMM terms use the inpaint-region-MASKED decode,
  ddim_guided.py:419-424; the segmentation term uses the full decode,
  ddim_guided.py:434-437):
    - ID cosine loss vs the source through the ArcFace IDLoss protocol
      (active for 5 < t < 500; ddim_guided.py:545-549)
    - segmentation consistency: L1 between BiSeNet 19-class logit maps of
      pred and target over classes [skin, mouth, u_lip, l_lip] = [1,11,12,13]
      at 256px, weight 10 (ddim_guided.py:434-456)
    - 3DMM expression: 1 - cosine between D3DFR exp coeffs (80:144) of pred
      and target, weight 100 (ddim_guided.py:460-508)

Each builder returns fn(pred_x0_latent, t) -> scalar, composable via
`combine_guidance`, and pluggable into
reface_tpu.diffusion.ddim_guided.guided_ddim_sample.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp

__all__ = [
    "make_id_guidance",
    "make_seg_guidance",
    "make_expression_guidance",
    "combine_guidance",
]

GuidanceFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _masked_decode(decode_fn, pred_x0, inpaint_region):
    """Decode the latent and keep only the inpainted region
    (ddim_guided.py:419-424: masks = 1 - resize(mask); im * masks)."""
    img = decode_fn(pred_x0)  # (B, S, S, 3) in [-1, 1]
    if inpaint_region is not None:
        region = inpaint_region
        if region.shape[1] != img.shape[1]:
            import jax

            region = jax.image.resize(
                region, (region.shape[0], img.shape[1], img.shape[2], 1),
                "bilinear",
            )
        img = img * region
    return img


def make_id_guidance(decode_fn, embed_id_fn, source_pm1,
                     inpaint_region=None, weight: float = 1.0,
                     t_range: tuple[int, int] = (5, 500)) -> GuidanceFn:
    """ID cosine guidance: 1 - <f(pred_masked), f(source)>.

    decode_fn: latent (B,h,w,4) -> image (B,S,S,3) [-1,1] (differentiable)
    embed_id_fn: image [-1,1] -> (B,512) l2-normed ArcFace features (the
                 IDLoss pool/crop protocol, ddpm.py:112-124)
    inpaint_region: (B,*,*,1) 1 = region being generated (1 - keep mask)
    t_range: active timestep window (ddim_guided.py:545: 5 < t < 500)
    """
    src_feats = embed_id_fn(source_pm1)

    def fn(pred_x0, t):
        img = _masked_decode(decode_fn, pred_x0, inpaint_region)
        f = embed_id_fn(img)
        loss = jnp.mean(1.0 - jnp.sum(f * src_feats, axis=-1))
        gate = jnp.logical_and(t > t_range[0], t < t_range[1])
        return weight * jnp.where(gate, loss, 0.0)

    return fn


def make_seg_guidance(decode_fn, seg_logits_fn, target_pm1,
                      classes: Sequence[int] = (1, 11, 12, 13),
                      weight: float = 10.0) -> GuidanceFn:
    """Segmentation-consistency guidance: L1 between BiSeNet logit maps of
    pred and target over `classes` (ddim_guided.py:434-456; 19-class
    face-parsing vocabulary: 1=skin, 11=mouth, 12=u_lip, 13=l_lip).

    seg_logits_fn: image [-1,1] -> (B, H, W, 19) logits.
    """
    tgt_logits = seg_logits_fn(target_pm1)
    idx = jnp.asarray(tuple(classes))

    def fn(pred_x0, t):
        img = decode_fn(pred_x0)
        logits = seg_logits_fn(img)
        diff = jnp.abs(
            jnp.take(logits, idx, axis=-1) - jnp.take(tgt_logits, idx, axis=-1)
        )
        return weight * jnp.mean(diff) * len(classes)

    return fn


def make_expression_guidance(decode_fn, coeff_fn, target_pm1,
                             inpaint_region=None,
                             weight: float = 100.0) -> GuidanceFn:
    """3DMM expression guidance: 1 - cos(exp(pred), exp(target)) summed over
    the batch (ddim_guided.py:460-508; the reference evaluates the
    inpaint-region-MASKED decode, im_rec = (pred_x0_im_masked + 1)/2).

    coeff_fn: [0,1] image -> (B, 64) D3DFR expression coefficients
              (coeffs[80:144]).
    inpaint_region: (B,*,*,1) 1 = generated region (1 - keep mask).
    """
    tgt_exp = coeff_fn((target_pm1 + 1.0) / 2.0)

    def fn(pred_x0, t):
        img = _masked_decode(decode_fn, pred_x0, inpaint_region)
        img01 = (img + 1.0) / 2.0
        exp = coeff_fn(img01)
        cos = jnp.sum(exp * tgt_exp, axis=-1) / (
            jnp.linalg.norm(exp, axis=-1) * jnp.linalg.norm(tgt_exp, axis=-1)
            + 1e-8
        )
        return weight * jnp.sum(1.0 - cos)

    return fn


def combine_guidance(*fns: GuidanceFn) -> GuidanceFn:
    def fn(pred_x0, t):
        total = jnp.zeros(())
        for g in fns:
            total = total + g(pred_x0, t)
        return total

    return fn
