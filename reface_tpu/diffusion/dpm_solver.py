"""DPM-Solver++(2M) sampler as a single fused lax.scan.

Beyond-parity component: the reference ships only DDIM and PLMS
(/root/reference/ldm/models/diffusion/{ddim.py,plms.py}); this adds a
2nd-order multistep solver in the data-prediction (x0) parameterization
(DPM-Solver++, Lu et al. 2022, arXiv:2211.01095). It discretizes the SAME
probability-flow ODE that eta=0 DDIM solves to 1st order — DDIM's update is
exactly the order-1 special case of this scheme (tests/test_dpm_solver.py
asserts the 2nd-order accuracy gain against a closed-form ODE solution) —
so it reaches DDIM-50-grade trajectories at materially fewer UNet
evaluations, training-free. It complements the distilled student schedule
(diffusion/distill.py), which reaches further but needs a training run.

TPU-first: same shape as ddim_sample — one lax.scan per CFG regime, all
per-step scalars precomputed as scan xs, the one-step x0 history riding in
the carry. The first-step order-1 fallback is a branch-free jnp.where (both
combinations are elementwise-cheap next to the UNet eval), so one compiled
program covers warmup and steady state.

Update rule (half-log-SNR lam = 0.5*log(a/(1-a)), a = alpha_cumprod;
alpha = sqrt(a), sigma = sqrt(1-a); stepping the noise level a_t -> a_tgt):

    h   = lam(a_tgt) - lam(a_t)            (> 0 going toward data)
    x0  = (x - sigma_t * eps) / alpha_t
    D   = x0                                          (first step)
        = (1 + h_prev^-1 h/2 ... ) see below          (later steps)
    D   = (1 + 1/(2r)) x0 - (1/(2r)) x0_prev,  r = h_prev / h
    x'  = (sigma_tgt / sigma_t) * x - alpha_tgt * expm1(-h) * D

which is the exact variation-of-constants solution
x' = (sigma_tgt/sigma_t) x + sigma_tgt * int_{lam_t}^{lam_tgt} e^l x0(l) dl
with x0(l) approximated by the linear extrapolation through the last two
model evaluations (Algorithm 2 of the paper, "multistep 2M").
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from reface_tpu.core.schedules import DDIMTables
from reface_tpu.diffusion.ddim import ModelFn, cfg_eps

__all__ = ["dpm_solver_sample"]


def _half_log_snr(a: jnp.ndarray) -> jnp.ndarray:
    """lam = log(alpha/sigma) = 0.5*(log a - log(1-a)) for a = alphacum."""
    return 0.5 * (jnp.log(a) - jnp.log1p(-a))


def dpm_solver_sample(
    model_fn: ModelFn,
    x_T: jnp.ndarray,
    context: jnp.ndarray,
    uncond_context: jnp.ndarray,
    inpaint_latent: jnp.ndarray,
    mask_latent: jnp.ndarray,
    tables: DDIMTables,
    cfg_scale: float = 3.0,
    cfg_steps: Optional[int] = None,
    dedup_model_fn: Optional[ModelFn] = None,
    lower_order_final: Optional[bool] = None,
) -> jnp.ndarray:
    """Run the reverse DPM-Solver++(2M) chain; returns the final 4-ch latent.

    Drop-in for ddim_sample (same 9-ch concat / uncond-first CFG
    batch-doubling / cfg_steps guidance-interval / prefix-dedup hooks;
    deterministic, the eta=0 regime). `tables` is the standard DDIMTables
    subset; the solver only consumes `timesteps` and the alphacum pairs.

    lower_order_final: drop to order 1 on the terminal step, matching the
    official DPM-Solver / diffusers safeguard — 2M extrapolation through the
    last two x0 estimates is unstable near t=0 with real x-dependent models
    at low step counts (analytic tests can't see this: their x0 is
    x-independent). None = auto (on when num_steps < 15, the diffusers
    threshold).
    """
    use_cfg = uncond_context is not None and cfg_scale != 1.0
    b = x_T.shape[0]
    ctx = (
        jnp.concatenate([uncond_context, context], axis=0) if use_cfg else context
    )
    rest = jnp.concatenate([inpaint_latent, mask_latent], axis=-1)

    rev = lambda a: a[::-1]
    n_steps = tables.num_steps
    if lower_order_final is None:
        lower_order_final = n_steps < 15
    # order-1 mask: the global first step (no history yet) and, under the
    # lower_order_final safeguard, the terminal step. Static per position,
    # so it rides the scan xs and stays one compiled program.
    order1 = jnp.arange(n_steps) == 0
    if lower_order_final:
        order1 = order1 | (jnp.arange(n_steps) == n_steps - 1)
    xs = (
        jnp.asarray(rev(tables.timesteps)),
        jnp.asarray(rev(tables.alphas)),
        jnp.asarray(rev(tables.alphas_prev)),
        order1,
    )
    n_cfg = n_steps
    if use_cfg and cfg_steps is not None:
        n_cfg = max(0, min(int(cfg_steps), n_steps))

    def make_body(with_cfg: bool):
        def body(carry, scan_in):
            x, x0_prev, h_prev = carry
            t, a_t, a_tgt, order1 = scan_in
            x9 = jnp.concatenate([x, rest], axis=-1)
            tb = jnp.full((b,), t, jnp.int32)
            if with_cfg and dedup_model_fn is not None:
                eps2 = dedup_model_fn(x9, tb, ctx)
                e_uncond, e_cond = eps2[:b], eps2[b:]
                eps = e_uncond + cfg_scale * (e_cond - e_uncond)
            elif with_cfg:
                eps = cfg_eps(model_fn, x9, tb, ctx, cfg_scale)
            else:
                eps = model_fn(x9, tb, context)
            alpha_t = jnp.sqrt(a_t)
            sigma_t = jnp.sqrt(1.0 - a_t)
            x0 = (x - sigma_t * eps) / alpha_t
            h = _half_log_snr(a_tgt) - _half_log_snr(a_t)
            r = h_prev / h
            d2 = (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * x0_prev
            d = jnp.where(order1, x0, d2)
            alpha_tgt = jnp.sqrt(a_tgt)
            sigma_tgt = jnp.sqrt(1.0 - a_tgt)
            x_next = (sigma_tgt / sigma_t) * x - alpha_tgt * jnp.expm1(-h) * d
            return (x_next, x0, h), None

        return body

    # h_prev=1 is a dummy: the `first` flag routes step 0 to order-1 before
    # the carry's h is ever real, and jnp.where keeps d2's div well-defined.
    carry = (x_T, jnp.zeros_like(x_T), jnp.asarray(1.0, x_T.dtype))
    if n_cfg > 0:
        head = tuple(a[:n_cfg] for a in xs)
        carry, _ = jax.lax.scan(make_body(use_cfg), carry, head)
    if n_cfg < n_steps:
        tail = tuple(a[n_cfg:] for a in xs)
        carry, _ = jax.lax.scan(make_body(False), carry, tail)
    return carry[0]
