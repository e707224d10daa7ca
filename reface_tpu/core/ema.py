"""Exponential moving average of parameters (LitEma equivalent).

Behavioral parity target (semantics, not code):
  /root/reference/ldm/modules/ema.py:5-76 — shadow copies with
  decay = min(decay, (1 + updates) / (10 + updates)) warmup ramp, update
  shadow += (1-d) * (param - shadow), plus store/restore for the
  `ema_scope` pattern (ddpm.py:309-320) that wraps all inference.

TPU-native: the EMA state is a plain pytree updated inside the jitted train
step (no name-mapping buffers); `swap`/context management is functional.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["EmaState", "ema_update"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EmaState:
    shadow: Any
    decay: jnp.ndarray  # scalar, the configured max decay
    updates: jnp.ndarray  # int32 update counter (warmup ramp)

    @staticmethod
    def create(params, decay: float = 0.9999, warmup: bool = True):
        return EmaState(
            shadow=jax.tree.map(jnp.asarray, params),
            decay=jnp.asarray(decay, jnp.float32),
            updates=jnp.asarray(0 if warmup else -1, jnp.int32),
        )


def ema_update(state: EmaState, params) -> EmaState:
    """One EMA step with the reference's warmup ramp."""
    updates = jnp.where(state.updates >= 0, state.updates + 1, state.updates)
    ramp = (1.0 + updates) / (10.0 + updates)
    d = jnp.where(updates >= 0, jnp.minimum(state.decay, ramp), state.decay)
    shadow = jax.tree.map(
        lambda s, p: s + (1.0 - d) * (p.astype(s.dtype) - s),
        state.shadow, params,
    )
    return EmaState(shadow=shadow, decay=state.decay, updates=updates)
