from diffusion_pruning_tpu.core.estimators import (
    FIXED_KEY,
    gumbel_sigmoid_sample,
    hard_concrete,
    importance_gumbel_sigmoid_sample,
    sample_gumbel,
)
from diffusion_pruning_tpu.core.resource import ResourceModel
from diffusion_pruning_tpu.core.sinkhorn import sinkhorn, sinkhorn_assign
from diffusion_pruning_tpu.core.structure import GateSite, StructureSpec, SubBlock, build_structure

__all__ = [
    "FIXED_KEY",
    "GateSite",
    "ResourceModel",
    "StructureSpec",
    "SubBlock",
    "build_structure",
    "gumbel_sigmoid_sample",
    "hard_concrete",
    "importance_gumbel_sigmoid_sample",
    "sample_gumbel",
    "sinkhorn",
    "sinkhorn_assign",
]
