from diffusion_pruning_tpu.training.pruner import PrunerConfig, PrunerModules, make_pruner_step

__all__ = ["PrunerConfig", "PrunerModules", "make_pruner_step"]
