"""Gradient-guided DDIM sampler (the reference's experimental variant).

Behavioral parity target (semantics, not code):
  /root/reference/ldm/models/diffusion/ddim_guided.py:380-609 — at each DDIM
  step, differentiably decode pred_x0, compute guidance losses (ID cosine to
  the source; optionally segmentation/3DMM terms), and shift the eps by
  -sqrt(1 - a_t) * grad before the usual update. Unimported by any reference
  script (SURVEY.md §2.2) but part of the inventory; exposed here as an
  optional sampler.

TPU-native: the guidance gradient is jax.grad through the decoder + loss
towers inside the same scan step — one compiled program, no re-tracing.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from reface_tpu.core.schedules import DDIMTables
from reface_tpu.diffusion.ddim import ModelFn, cfg_eps, ddim_step

__all__ = ["guided_ddim_sample"]


def guided_ddim_sample(
    model_fn: ModelFn,
    guidance_loss_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x_T: jnp.ndarray,
    context: jnp.ndarray,
    uncond_context: Optional[jnp.ndarray],
    inpaint_latent: jnp.ndarray,
    mask_latent: jnp.ndarray,
    tables: DDIMTables,
    cfg_scale: float = 3.0,
    guidance_scale: float = 1.0,
) -> jnp.ndarray:
    """DDIM chain with per-step gradient guidance on pred_x0's latent.

    guidance_loss_fn: (pred_x0 latent (B,h,w,4), t scalar) -> scalar loss
    (it should internally decode and evaluate ID/seg/3DMM towers as needed;
    ready-made builders live in reface_tpu.diffusion.guidance).
    """
    use_cfg = uncond_context is not None and cfg_scale != 1.0
    b = x_T.shape[0]
    ctx = (
        jnp.concatenate([uncond_context, context], axis=0) if use_cfg else context
    )
    rest = jnp.concatenate([inpaint_latent, mask_latent], axis=-1)
    rev = lambda a: a[::-1]
    xs = (
        rev(tables.timesteps),
        rev(tables.alphas),
        rev(tables.alphas_prev),
        rev(tables.sqrt_one_minus_alphas),
    )

    def body(x, scan_in):
        t, a_t, a_prev, s1m = scan_in
        x9 = jnp.concatenate([x, rest], axis=-1)
        tb = jnp.full((b,), t, jnp.int32)
        if use_cfg:
            eps = cfg_eps(model_fn, x9, tb, ctx, cfg_scale)
        else:
            eps = model_fn(x9, tb, ctx)

        def loss_of_x(xx):
            pred_x0 = (xx - s1m * eps) / jnp.sqrt(a_t)
            return guidance_loss_fn(pred_x0, t)

        grad = jax.grad(loss_of_x)(x)
        eps = eps + jnp.sqrt(1.0 - a_t) * guidance_scale * grad
        x_prev, _ = ddim_step(x, eps, a_t, a_prev, s1m, 0.0)
        return x_prev, None

    x_final, _ = jax.lax.scan(body, x_T, xs)
    return x_final
