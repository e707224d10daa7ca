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
    def create(params, decay: float = 0.9999, warmup: bool = True,
               dtype=None):
        """dtype: shadow dtype override. None keeps the param dtypes
        (fp32 shadows, LitEma parity). bfloat16 halves the shadow's HBM
        (-1.7G at 860M trainable params) — what lets EMA run at real size
        on a single 16G v5e (fp32 shadows OOM there, BENCH_LOG.md); the
        cost is bf16 rounding of the shadow average, ~1e-3 relative, far
        below the ~1e-4/step EMA drift it tracks."""
        # copy=True: a same-dtype shadow must NOT alias the param buffers —
        # the train step donates its state (cli/train.py), and a shadow leaf
        # sharing a params leaf would be donated twice
        cast = lambda x: jnp.array(x, dtype=dtype or x.dtype, copy=True)
        return EmaState(
            shadow=jax.tree.map(cast, params),
            decay=jnp.asarray(decay, jnp.float32),
            updates=jnp.asarray(0 if warmup else -1, jnp.int32),
        )


def ema_update(state: EmaState, params) -> EmaState:
    """One EMA step with the reference's warmup ramp."""
    updates = jnp.where(state.updates >= 0, state.updates + 1, state.updates)
    ramp = (1.0 + updates) / (10.0 + updates)
    d = jnp.where(updates >= 0, jnp.minimum(state.decay, ramp), state.decay)
    shadow = jax.tree.map(
        # math in fp32, storage in the shadow's dtype: exact for fp32
        # shadows (LitEma parity), and for bf16 shadows only the final
        # store rounds (transient fp32 temps, XLA fuses them away)
        lambda s, p: (
            s.astype(jnp.float32)
            + (1.0 - d) * (p.astype(jnp.float32) - s.astype(jnp.float32))
        ).astype(s.dtype),
        state.shadow, params,
    )
    return EmaState(shadow=shadow, decay=state.decay, updates=updates)
