from diffusion_pruning_tpu.parallel.mesh import data_mesh, shard_batch

__all__ = ["data_mesh", "shard_batch"]
