"""PLMS (pseudo linear multistep) sampler as a jitted lax.scan.

Behavioral parity target (semantics, not code):
  /root/reference/ldm/models/diffusion/plms.py:118-238 —
  Adams-Bashforth multistep on eps with order ramp-up:
    step 0: pseudo improved Euler, e' = (e_t + e(x_prev, t_next)) / 2
    step 1: e' = (3 e_t - e_{t-1}) / 2
    step 2: e' = (23 e_t - 16 e_{t-1} + 5 e_{t-2}) / 12
    step 3+: e' = (55 e_t - 59 e_{t-1} + 37 e_{t-2} - 9 e_{t-3}) / 24
  with the same 9-ch concat / CFG batch-doubling / DDIM x_prev formula.

TPU-first: the eps history rides in the scan carry as a fixed (3, B, h, w, 4)
buffer; order selection is a branch-free weighted sum driven by the step
counter (lax.switch on 4 tiny combinators), so one compiled program covers
the whole ramp-up.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from reface_tpu.core.schedules import DDIMTables
from reface_tpu.diffusion.ddim import ModelFn, cfg_eps, ddim_step

__all__ = ["plms_sample"]


def plms_sample(
    model_fn: ModelFn,
    x_T: jnp.ndarray,
    context: jnp.ndarray,
    uncond_context: jnp.ndarray,
    inpaint_latent: jnp.ndarray,
    mask_latent: jnp.ndarray,
    tables: DDIMTables,
    cfg_scale: float = 3.0,
) -> jnp.ndarray:
    """Run the full reverse PLMS chain (eta=0); returns the final 4-ch latent."""
    use_cfg = uncond_context is not None and cfg_scale != 1.0
    b = x_T.shape[0]
    ctx = (
        jnp.concatenate([uncond_context, context], axis=0) if use_cfg else context
    )
    rest = jnp.concatenate([inpaint_latent, mask_latent], axis=-1)

    def eps_at(x, t_scalar):
        x9 = jnp.concatenate([x, rest], axis=-1)
        tb = jnp.full((b,), t_scalar, jnp.int32)
        if use_cfg:
            return cfg_eps(model_fn, x9, tb, ctx, cfg_scale)
        return model_fn(x9, tb, ctx)

    rev = lambda a: a[::-1]
    ts = rev(tables.timesteps)
    # t_next for the improved-Euler warmup step: the following (smaller) t.
    ts_next = jnp.concatenate([ts[1:], ts[-1:]])
    xs = (
        ts,
        ts_next,
        rev(tables.alphas),
        rev(tables.alphas_prev),
        rev(tables.sqrt_one_minus_alphas),
        jnp.arange(tables.num_steps),
    )

    def combine(step_idx, e_t, hist):
        """Adams-Bashforth combination; hist[0] is the newest old eps."""
        branches = [
            lambda: e_t,  # unused at step 0 (improved Euler handled outside)
            lambda: (3 * e_t - hist[0]) / 2,
            lambda: (23 * e_t - 16 * hist[0] + 5 * hist[1]) / 12,
            lambda: (55 * e_t - 59 * hist[0] + 37 * hist[1] - 9 * hist[2]) / 24,
        ]
        return jax.lax.switch(jnp.minimum(step_idx, 3), branches)

    def body(carry, scan_in):
        x, hist = carry
        t, t_next, a_t, a_prev, s1m, step_idx = scan_in
        e_t = eps_at(x, t)

        def euler_warmup():
            x_prev0, _ = ddim_step(x, e_t, a_t, a_prev, s1m, 0.0)
            e_next = eps_at(x_prev0, t_next)
            return (e_t + e_next) / 2

        e_prime = jax.lax.cond(
            step_idx == 0, euler_warmup, lambda: combine(step_idx, e_t, hist)
        )
        x_prev, _ = ddim_step(x, e_prime, a_t, a_prev, s1m, 0.0)
        hist = jnp.concatenate([e_t[None], hist[:-1]], axis=0)
        return (x_prev, hist), None

    hist0 = jnp.zeros((3,) + x_T.shape, x_T.dtype)
    (x_final, _), _ = jax.lax.scan(body, (x_T, hist0), xs)
    return x_final
