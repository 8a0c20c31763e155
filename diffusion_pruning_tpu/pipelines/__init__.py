from diffusion_pruning_tpu.pipelines.pruning_pipeline import PruningPipeline

__all__ = ["PruningPipeline"]
