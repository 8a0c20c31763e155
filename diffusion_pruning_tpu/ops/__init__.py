from diffusion_pruning_tpu.ops.gates import (
    channel_gate,
    depth_lerp,
    head_gate,
    match_batch,
)

__all__ = ["channel_gate", "depth_lerp", "head_gate", "match_batch"]
