"""Diffusion noise schedules and DDIM sampling tables.

Behavioral parity targets (semantics, not code) in /root/reference:
  - beta schedules:      ldm/modules/diffusionmodules/util.py:21-43
  - ddim timesteps:      ldm/modules/diffusionmodules/util.py:46-61 (the +1 offset)
  - ddim sigma/alpha:    ldm/modules/diffusionmodules/util.py:64-75
  - DDPM buffer set:     ldm/models/diffusion/ddpm.py:255-307
  - timestep embedding:  ldm/modules/diffusionmodules/util.py:151-171 (cos first)

All tables are computed in float64 numpy at trace time (they are tiny) and
materialized as jnp arrays, so the jitted samplers only ever index into
precomputed per-step stacks — no data-dependent math inside the scan body.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "make_beta_schedule",
    "DiffusionSchedule",
    "DDIMTables",
    "make_ddim_timesteps",
    "timestep_embedding",
]


def make_beta_schedule(
    schedule: str = "linear",
    n_timestep: int = 1000,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Return float64 betas of shape (n_timestep,).

    "linear" is the SD/REFace schedule: linspace in sqrt-space then squared.
    """
    if schedule == "linear":
        betas = (
            np.linspace(
                linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64
            )
            ** 2
        )
    elif schedule == "cosine":
        steps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(steps / (1 + cosine_s) * math.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1.0 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0.0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = (
            np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
        )
    else:
        raise ValueError(f"unknown beta schedule {schedule!r}")
    return betas


def make_ddim_timesteps(
    num_ddim_steps: int,
    num_ddpm_steps: int = 1000,
    method: str = "uniform",
    alphas_cumprod: "np.ndarray | None" = None,
) -> np.ndarray:
    """DDIM timestep subset, including the reference's +1 offset.

    "uniform"/"quad" are the reference's discretizations (ddim.py /
    util.make_ddim_timesteps semantics). "lam_uniform" spaces the subset
    uniformly in half-log-SNR lam = 0.5*log(a/(1-a)) — the grid the
    DPM-Solver++ error analysis assumes (arXiv:2211.01095 §4). The shipped
    t-uniform grid has a huge terminal lam-jump (t=101 -> 1 spans lam 1.06
    -> 3.19 on the SD schedule) where multistep extrapolation loses its
    order advantage; lam-uniform restores clean 2nd-order convergence
    (tests/test_dpm_solver.py measures both). Requires `alphas_cumprod`.
    """
    if method == "uniform":
        c = num_ddpm_steps // num_ddim_steps
        ts = np.arange(0, num_ddpm_steps, c)
    elif method == "quad":
        ts = (np.linspace(0, math.sqrt(num_ddpm_steps * 0.8), num_ddim_steps) ** 2).astype(int)
    elif method == "lam_uniform":
        if alphas_cumprod is None:
            raise ValueError("lam_uniform discretization needs alphas_cumprod")
        acp = np.asarray(alphas_cumprod, np.float64)
        lam = 0.5 * (np.log(acp) - np.log1p(-acp))
        if num_ddim_steps > len(lam) - 1:
            # index 0 is reserved (the +1 offset convention), so at most
            # T-1 unique indices exist; the greedy all-inf argmin below
            # would otherwise silently claim index 0 repeatedly
            raise ValueError(
                f"lam_uniform needs num_ddim_steps <= {len(lam) - 1}, "
                f"got {num_ddim_steps}"
            )
        # same high-noise anchor as "uniform" at this step count
        t_hi = num_ddpm_steps - num_ddpm_steps // num_ddim_steps + 1
        targets = np.linspace(lam[t_hi], lam[1], num_ddim_steps)
        # Greedy nearest-UNUSED-index assignment: a plain per-target argmin
        # collapses duplicates where the lam grid is dense relative to the
        # target spacing (SD schedule: S=50 -> 49, S=100 -> 94 under
        # np.unique), silently running fewer UNet evals than requested.
        # Claiming the nearest free neighbor instead guarantees exactly
        # num_ddim_steps unique indices (lam is strictly monotonic in t, so
        # in-order assignment stays monotonic and the sort is a formality).
        used = np.zeros(len(lam), bool)
        used[0] = True  # keep the +1 offset convention: indices in [1, T-1]
        idx = np.empty(num_ddim_steps, np.int64)
        for i, tgt in enumerate(targets):
            d = np.abs(lam - tgt)
            d[used] = np.inf
            j = int(d.argmin())
            idx[i] = j
            used[j] = True
        idx = np.sort(idx)
        if len(np.unique(idx)) != num_ddim_steps:  # exactly-S guarantee
            raise RuntimeError(
                "lam_uniform produced duplicate timestep indices "
                f"({len(np.unique(idx))} unique of {num_ddim_steps})"
            )
        return idx
    else:
        raise ValueError(f"unknown ddim discretization {method!r}")
    # +1 so the final step's alpha is the one that scales to data. Clipped so
    # non-divisor step counts stay in range (reference only uses divisors).
    return np.minimum(ts + 1, num_ddpm_steps - 1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Full-resolution (T-step) DDPM tables, all shape (T,) float32."""

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]

    @staticmethod
    def create(
        schedule: str = "linear",
        timesteps: int = 1000,
        linear_start: float = 0.00085,
        linear_end: float = 0.0120,
        cosine_s: float = 8e-3,
        v_posterior: float = 0.0,
    ) -> "DiffusionSchedule":
        betas = make_beta_schedule(
            schedule, timesteps, linear_start, linear_end, cosine_s
        )
        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.append(1.0, acp[:-1])
        post_var = (1 - v_posterior) * betas * (1.0 - acp_prev) / (1.0 - acp) + (
            v_posterior * betas
        )
        f32 = lambda x: jnp.asarray(x, jnp.float32)
        return DiffusionSchedule(
            betas=f32(betas),
            alphas_cumprod=f32(acp),
            alphas_cumprod_prev=f32(acp_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(acp)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - acp)),
            log_one_minus_alphas_cumprod=f32(np.log(1.0 - acp)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / acp)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / acp - 1.0)),
            posterior_variance=f32(post_var),
            posterior_log_variance_clipped=f32(
                np.log(np.maximum(post_var, 1e-20))
            ),
            posterior_mean_coef1=f32(betas * np.sqrt(acp_prev) / (1.0 - acp)),
            posterior_mean_coef2=f32(
                (1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)
            ),
        )

    def q_sample(self, x0: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        """Forward diffusion x_t = sqrt(acp_t) x0 + sqrt(1-acp_t) eps, t: (B,) int."""
        shape = (-1,) + (1,) * (x0.ndim - 1)
        a = self.sqrt_alphas_cumprod[t].reshape(shape).astype(x0.dtype)
        s = self.sqrt_one_minus_alphas_cumprod[t].reshape(shape).astype(x0.dtype)
        return a * x0 + s * noise

    def predict_x0_from_eps(
        self, x_t: jnp.ndarray, t: jnp.ndarray, eps: jnp.ndarray
    ) -> jnp.ndarray:
        shape = (-1,) + (1,) * (x_t.ndim - 1)
        r = self.sqrt_recip_alphas_cumprod[t].reshape(shape).astype(x_t.dtype)
        rm1 = self.sqrt_recipm1_alphas_cumprod[t].reshape(shape).astype(x_t.dtype)
        return r * x_t - rm1 * eps


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DDIMTables:
    """Per-DDIM-step tables, all shape (S,) float32, ordered t ascending.

    The sampler scans these in *reverse* (largest t first). Stacked so a
    lax.scan can consume them directly as xs.
    """

    timesteps: jnp.ndarray  # int32 (S,) — DDPM timestep fed to the UNet
    alphas: jnp.ndarray  # acp[ts]
    alphas_prev: jnp.ndarray  # acp at previous ddim step (acp[0] for the first)
    sqrt_one_minus_alphas: jnp.ndarray
    sigmas: jnp.ndarray

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]

    @staticmethod
    def create(
        schedule: DiffusionSchedule,
        num_steps: int,
        eta: float = 0.0,
        method: str = "uniform",
    ) -> "DDIMTables":
        acp = np.asarray(schedule.alphas_cumprod, np.float64)
        ts = make_ddim_timesteps(
            num_steps, schedule.num_timesteps, method, alphas_cumprod=acp
        )
        alphas = acp[ts]
        alphas_prev = np.concatenate([[acp[0]], acp[ts[:-1]]])
        sigmas = eta * np.sqrt(
            (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev)
        )
        f32 = lambda x: jnp.asarray(x, jnp.float32)
        return DDIMTables(
            timesteps=jnp.asarray(ts, jnp.int32),
            alphas=f32(alphas),
            alphas_prev=f32(alphas_prev),
            sqrt_one_minus_alphas=f32(np.sqrt(1.0 - alphas)),
            sigmas=f32(sigmas),
        )


@partial(jax.jit, static_argnames=("dim", "max_period"))
def timestep_embedding(
    timesteps: jnp.ndarray, dim: int, max_period: int = 10000
) -> jnp.ndarray:
    """Sinusoidal embeddings, (B,) -> (B, dim). cos-first (OpenAI convention)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb
