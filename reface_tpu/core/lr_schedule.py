"""Lambda-warmup LR schedule family.

Behavioral parity target (semantics, not code):
  /root/reference/ldm/lr_scheduler.py:1-98 — LambdaWarmUpCosineScheduler and
  LambdaLinearScheduler (the shipped config: 10k-step linear warmup from
  f_start=1e-6 to f_max=1.0, then flat at f_min=1.0 over an effectively
  infinite cycle; configs/train.yaml:22-29). Multipliers on the base LR,
  stepped per optimizer step.

Expressed as optax-compatible schedules (step -> multiplier)."""

from __future__ import annotations

import math
import jax.numpy as jnp

__all__ = ["lambda_linear", "lambda_warmup_cosine", "scale_lr"]


def lambda_linear(
    warm_up_steps: int = 10_000,
    f_start: float = 1e-6,
    f_max: float = 1.0,
    f_min: float = 1.0,
    cycle_length: float = 1e13,
):
    """Linear warmup f_start -> f_max, then linear decay toward f_min over
    the (effectively infinite) cycle — flat at f_max for the shipped config."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = f_start + (f_max - f_start) * step / max(warm_up_steps, 1)
        after = f_min + (f_max - f_min) * (cycle_length - step) / cycle_length
        return jnp.where(step < warm_up_steps, warm, after)

    return schedule


def lambda_warmup_cosine(
    warm_up_steps: int,
    lr_start: float,
    lr_max: float,
    lr_min: float,
    max_decay_steps: int,
):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr_start + (lr_max - lr_start) * step / max(warm_up_steps, 1)
        t = (step - warm_up_steps) / max(max_decay_steps - warm_up_steps, 1)
        t = jnp.clip(t, 0.0, 1.0)
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(t * math.pi))
        return jnp.where(step < warm_up_steps, warm, cos)

    return schedule


def scale_lr(base_lr: float, batch_size: int, n_devices: int,
             accumulate: int = 1, n_nodes: int = 1) -> float:
    """The reference's LR scaling rule (main.py:719-723):
    lr = accumulate * nodes * devices * batch * base_lr."""
    return accumulate * n_nodes * n_devices * batch_size * base_lr
