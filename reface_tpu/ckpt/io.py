"""Orbax save/load for reface_tpu param trees and train state.

Reference equivalent: single-file pickled Lightning checkpoints
(main.py:598-616, SURVEY.md §5). Here: orbax sharded checkpoints (async-safe,
multi-host-ready) with a tiny metadata sidecar.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["save_params", "load_params", "save_train_state", "load_train_state"]


def _ckptr():
    return ocp.PyTreeCheckpointer()


def save_params(path: str, params: Any, metadata: Optional[dict] = None) -> None:
    path = os.path.abspath(path)
    _ckptr().save(path, params, force=True)
    if metadata is not None:
        with open(os.path.join(path, "reface_meta.json"), "w") as f:
            json.dump(metadata, f, indent=2, default=str)


def load_params(path: str, target: Any = None) -> Any:
    path = os.path.abspath(path)
    if target is not None:
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), target
        )
        return _ckptr().restore(path, item=target, restore_args=restore_args)
    return _ckptr().restore(path)


def save_train_state(path: str, state, step: int | None = None) -> None:
    """Full-resume checkpoint: params + optimizer state + step (+ EMA)."""
    tree = {"params": state.params, "opt_state": state.opt_state,
            "step": state.step}
    if getattr(state, "ema", None) is not None:
        tree["ema"] = state.ema
    save_params(path, tree,
                metadata={"step": int(step if step is not None else state.step)})


def load_train_state(path: str, target_state):
    target = {
        "params": target_state.params,
        "opt_state": target_state.opt_state,
        "step": target_state.step,
    }
    if getattr(target_state, "ema", None) is not None:
        target["ema"] = target_state.ema
    tree = load_params(path, target=target)
    return type(target_state)(
        tree["params"], tree["opt_state"], tree["step"],
        tree.get("ema", getattr(target_state, "ema", None)),
    )
