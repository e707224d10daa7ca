from reface_tpu.diffusion.ddim import cfg_eps, ddim_sample, ddim_step
from reface_tpu.diffusion.ddim_guided import guided_ddim_sample
from reface_tpu.diffusion.guidance import (
    combine_guidance,
    make_expression_guidance,
    make_id_guidance,
    make_seg_guidance,
)
from reface_tpu.diffusion.dpm_solver import dpm_solver_sample
from reface_tpu.diffusion.plms import plms_sample

__all__ = [
    "cfg_eps",
    "ddim_sample",
    "ddim_step",
    "dpm_solver_sample",
    "plms_sample",
    "guided_ddim_sample",
    "combine_guidance",
    "make_id_guidance",
    "make_seg_guidance",
    "make_expression_guidance",
]
