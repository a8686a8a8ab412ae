from tcdiff_tpu.diffusion.schedules import DiffusionBuffers, make_beta_schedule
from tcdiff_tpu.diffusion.gaussian import GaussianDiffusion

__all__ = ["DiffusionBuffers", "make_beta_schedule", "GaussianDiffusion"]
