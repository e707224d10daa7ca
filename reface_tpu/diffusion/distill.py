"""Progressive step-count distillation for the DDIM swap chain.

The quality-preserving route to the >=10 swaps/s serving target (VERDICT r2
missing #4): instead of truncating the reference protocol (DDIM-8), train a
student UNet whose K-step DDIM chain reproduces the exact teacher protocol
(/root/reference/ldm/models/diffusion/ddim.py:338-346 — DDIM-50, CFG 3 by
batch-doubling). Two standard mechanisms, composed:

  - progressive distillation (Salimans & Ho 2022): the student learns to
    cover two consecutive teacher DDIM steps in one; step counts halve per
    round (50 -> 25 -> 13 ... is not representable with uniform-stride
    tables, so rounds use divisor step counts 50 -> 25 -> 10 directly
    against a multi-step teacher window, see `steps_per_call`);
  - guidance folding (Meng et al. 2023): round 1 distills the CFG-COMBINED
    teacher eps (scale 3, uncond-first batch-doubling) into a student that
    runs a single conditional forward — removing the 2x CFG cost.

Everything is eps-parameterized so the student drops into the existing
`ddim_sample` scan unchanged: serving with a distilled student is just
SwapConfig(ddim_steps=K, cfg_scale=1.0) + the student params.

The distillation target is the closed-form eps* that makes ONE eta=0 DDIM
step land exactly where the teacher's window ends:
    x' = sqrt(a'/a) x + (sqrt(1-a') - sqrt(a'/a) sqrt(1-a)) eps*
(from the update in ddim.py:352-374), solved for eps*. The regression loss
is in x0 space with the max(SNR, 1) truncated weighting of Salimans & Ho.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from reface_tpu.core.schedules import DDIMTables, DiffusionSchedule
from reface_tpu.diffusion.ddim import ModelFn, cfg_eps, ddim_step

__all__ = [
    "DistillConfig",
    "distill_eps_target",
    "teacher_window",
    "make_distill_loss",
    "distill_schedule_plan",
]


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    teacher_steps: int = 50
    student_steps: int = 25  # per-round target (divisor of teacher_steps)
    cfg_scale: float = 3.0  # teacher guidance scale (0/1 = teacher unguided)
    fold_cfg: bool = True  # student runs unguided (guidance folding)
    snr_loss_weight: bool = True  # max(SNR, 1) x0-space weighting
    num_timesteps: int = 1000

    @property
    def steps_per_call(self) -> int:
        """Teacher steps covered by one student step."""
        if self.teacher_steps % self.student_steps:
            raise ValueError(
                f"student_steps {self.student_steps} must divide "
                f"teacher_steps {self.teacher_steps} (uniform-stride tables)"
            )
        return self.teacher_steps // self.student_steps


def distill_schedule_plan(start: int = 50, target: int = 10) -> list[int]:
    """Per-round student step counts from `start` down to `target`.

    Uniform-stride table alignment needs each round's student count to
    divide its teacher count, and (to be able to continue) the target to
    divide the student count. Prefers the gentlest such reduction per
    round: 50->10 target gives [10] (one round, window 5); target 5 gives
    [25, 5]."""
    plan = []
    s = start
    while s > target:
        divs = [d for d in range(target, s // 2 + 1) if s % d == 0]
        good = [d for d in divs if d % target == 0]
        if good:
            nxt = max(good)
        elif divs:
            nxt = max(divs)
        else:
            raise ValueError(f"no divisor path from {s} to {target}")
        plan.append(nxt)
        s = nxt
    return plan


def distill_eps_target(
    x: jnp.ndarray, x_end: jnp.ndarray, a_t: jnp.ndarray, a_tgt: jnp.ndarray
) -> jnp.ndarray:
    """Closed-form eps* whose single eta=0 DDIM step maps x@a_t -> x_end@a_tgt."""
    r = jnp.sqrt(a_tgt / a_t)
    denom = jnp.sqrt(1.0 - a_tgt) - r * jnp.sqrt(1.0 - a_t)
    return (x_end - r * x) / denom


def teacher_window(
    model_fn: ModelFn,
    x: jnp.ndarray,  # (B,h,w,4) latent at level alphas[j_hi]
    rest: jnp.ndarray,  # (B,h,w,5) [z_inpaint, mask] concat
    j_hi: jnp.ndarray,  # (B,) int32 teacher table index of the start level
    k: int,  # window length (teacher steps to run)
    tables: DDIMTables,
    context: jnp.ndarray,
    uncond_context: Optional[jnp.ndarray],
    cfg_scale: float,
) -> jnp.ndarray:
    """Run k exact teacher DDIM steps from table index j_hi downward.

    Per-sample indices (j_hi may differ across the batch); indices below 0
    clamp to a degenerate identity step (a_prev == a), so a uniform
    fori_loop covers the final window too.
    """
    use_cfg = uncond_context is not None and cfg_scale not in (0.0, 1.0)
    ctx = (
        jnp.concatenate([uncond_context, context], axis=0) if use_cfg else context
    )
    b = x.shape[0]
    shape = (-1,) + (1,) * (x.ndim - 1)

    def step(s, x):
        j = j_hi - s
        jc = jnp.maximum(j, 0)
        t = tables.timesteps[jc]
        a_t = tables.alphas[jc].reshape(shape)
        a_prev = tables.alphas_prev[jc].reshape(shape)
        s1m = tables.sqrt_one_minus_alphas[jc].reshape(shape)
        # j < 0 -> identity (window ran past the end of the chain)
        a_prev = jnp.where((j < 0).reshape(shape), a_t, a_prev)
        x9 = jnp.concatenate([x, rest], axis=-1)
        if use_cfg:
            eps = cfg_eps(model_fn, x9, t, ctx, cfg_scale)
        else:
            eps = model_fn(x9, t, context)
        x_prev, _ = ddim_step(x, eps, a_t, a_prev, s1m, 0.0)
        return x_prev

    return jax.lax.fori_loop(0, k, step, x)


def make_distill_loss(
    cfg: DistillConfig,
    schedule: Optional[DiffusionSchedule] = None,
):
    """Returns (loss_fn, teacher_tables, student_tables).

    loss_fn(student_fn, teacher_fn, z0, rest, context, uncond_context, key)
      -> (loss, metrics); both fns are eps-models on the 9-ch input.
      z0: (B,h,w,4) clean data latents (VAE-encoded swaps/targets);
      rest: (B,h,w,5) [z_inpaint, mask_latent].
    """
    schedule = schedule or DiffusionSchedule.create(timesteps=cfg.num_timesteps)
    tt = DDIMTables.create(schedule, cfg.teacher_steps)
    ts = DDIMTables.create(schedule, cfg.student_steps)
    k = cfg.steps_per_call
    # student table index i starts at teacher index k*i + (k-1)... check:
    # uniform stride: ts_teacher[j] = 1 + j*(T/S_t), ts_student[i] =
    # 1 + i*(T/S_s) = ts_teacher[k*i]; the student step at index i moves
    # level alphas_s[i] -> alphas_prev_s[i], which the teacher covers with
    # its window j = k*i, k*i-1, ..., k*(i-1)+1  (k steps).
    assert bool(
        jnp.all(ts.timesteps == tt.timesteps[:: k])
    ), "teacher/student table misalignment"

    def loss_fn(student_fn, teacher_fn, z0, rest, context, uncond_context, key):
        b = z0.shape[0]
        k_i, k_n = jax.random.split(key)
        i = jax.random.randint(k_i, (b,), 0, cfg.student_steps)
        j_hi = i * k  # teacher index of the start level
        shape = (-1,) + (1,) * (z0.ndim - 1)
        a_t = ts.alphas[i].reshape(shape)
        a_tgt = ts.alphas_prev[i].reshape(shape)
        noise = jax.random.normal(k_n, z0.shape, z0.dtype)
        x = jnp.sqrt(a_t) * z0 + jnp.sqrt(1.0 - a_t) * noise

        x_end = jax.lax.stop_gradient(teacher_window(
            teacher_fn, x, rest, j_hi, k, tt, context, uncond_context,
            cfg.cfg_scale,
        ))
        eps_star = distill_eps_target(x, x_end, a_t, a_tgt)

        t = ts.timesteps[i]
        x9 = jnp.concatenate([x, rest], axis=-1)
        if cfg.fold_cfg or uncond_context is None:
            eps_s = student_fn(x9, t, context)
        else:
            ctx = jnp.concatenate([uncond_context, context], axis=0)
            eps_s = cfg_eps(student_fn, x9, t, ctx, cfg.cfg_scale)

        # x0-space loss with truncated-SNR weighting (Salimans & Ho eq. 9):
        # ||x0_s - x0*||^2 * max(SNR, 1), where x0 = (x - sqrt(1-a) e)/sqrt(a)
        # equals ||e_s - e*||^2 * (1-a)/a * max(a/(1-a), 1).
        d2 = jnp.mean((eps_s - eps_star) ** 2, axis=(1, 2, 3))
        if cfg.snr_loss_weight:
            a = a_t.reshape(-1)
            w = (1.0 - a) / a * jnp.maximum(a / (1.0 - a), 1.0)
            loss = jnp.mean(w * d2)
        else:
            loss = jnp.mean(d2)
        return loss, {
            "distill_loss": loss,
            "eps_mse": jnp.mean(d2),
        }

    return loss_fn, tt, ts
