from diffusion_pruning_tpu.schedulers.ddpm import DiffusionSchedule
from diffusion_pruning_tpu.schedulers.ddim import DDIMSampler
from diffusion_pruning_tpu.schedulers.dpm import DPMSolverPPSampler
from diffusion_pruning_tpu.schedulers.pndm import PNDMSampler

__all__ = ["DiffusionSchedule", "DDIMSampler", "DPMSolverPPSampler",
           "PNDMSampler"]
