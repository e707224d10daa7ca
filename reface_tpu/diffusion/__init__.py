from reface_tpu.diffusion.ddim import cfg_eps, ddim_sample, ddim_step
from reface_tpu.diffusion.plms import plms_sample

__all__ = ["cfg_eps", "ddim_sample", "ddim_step", "plms_sample"]
