from reface_tpu.core.schedules import (
    DDIMTables,
    DiffusionSchedule,
    make_beta_schedule,
    make_ddim_timesteps,
    timestep_embedding,
)
from reface_tpu.core.distributions import DiagonalGaussian, normal_kl

__all__ = [
    "DDIMTables",
    "DiffusionSchedule",
    "make_beta_schedule",
    "make_ddim_timesteps",
    "timestep_embedding",
    "DiagonalGaussian",
    "normal_kl",
]
