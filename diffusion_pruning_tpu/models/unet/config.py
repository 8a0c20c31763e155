"""Static configuration of the gated U-Net.

Mirrors the configuration surface of the reference's
`UNet2DConditionModelGated` (/root/reference/pdm/models/unet/
unet_2d_conditional.py:628-1063) — block-type lists, channel plan, head
counts — as a frozen dataclass so the whole architecture is known at trace
time. The gate layout (`StructureSpec`) and the analytic MAC table are both
derived purely from this config; nothing is discovered by module traversal.

Note on `attention_head_dim`: following the upstream diffusers quirk the
values in this list are the *number of attention heads* per level (5/10/20/20
for SD-2.1 with head size 64), which is what the reference passes as
`num_attention_heads` into its blocks.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

# Block-type vocabulary (the reference registry names, kept as the config
# compatibility surface — unet_2d_conditional.py:92-344, 384-627).
DOWN_BLOCK_TYPES = (
    "CrossAttnDownBlock2D",
    "CrossAttnDownBlock2DGated",
    "CrossAttnDownBlock2DHalfGated",
    "DownBlock2D",
    "DownBlock2DGated",
    "DownBlock2DHalfGated",
)
UP_BLOCK_TYPES = (
    "CrossAttnUpBlock2D",
    "CrossAttnUpBlock2DGated",
    "CrossAttnUpBlock2DHalfGated",
    "UpBlock2D",
    "UpBlock2DGated",
    "UpBlock2DHalfGated",
)
MID_BLOCK_TYPES = ("UNetMidBlock2DCrossAttn", "UNetMidBlock2DCrossAttnWidthGated")


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    sample_size: int = 32                # latent spatial size (256px / 8)
    in_channels: int = 4
    out_channels: int = 4
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2DHalfGated",
        "CrossAttnDownBlock2DHalfGated",
        "CrossAttnDownBlock2DHalfGated",
        "DownBlock2DHalfGated",
    )
    mid_block_type: str = "UNetMidBlock2DCrossAttnWidthGated"
    up_block_types: Tuple[str, ...] = (
        "UpBlock2DHalfGated",
        "CrossAttnUpBlock2DHalfGated",
        "CrossAttnUpBlock2DHalfGated",
        "CrossAttnUpBlock2DHalfGated",
    )
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # number of heads per level (diffusers naming quirk preserved)
    attention_head_dim: Tuple[int, ...] = (5, 10, 20, 20)
    cross_attention_dim: int = 1024
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    use_linear_projection: bool = True
    max_text_len: int = 77
    freq_shift: int = 0
    flip_sin_to_cos: bool = True
    gated_ff: bool = True
    ff_gate_width: int = 32
    ff_mult: int = 4
    # TPU: route attention through the Pallas flash kernel with the head
    # gate folded in (ops/flash_attention.py); False = XLA SDPA + masking
    use_flash_attention: bool = False
    # rematerialise each subblock in the backward pass (the reference's
    # `gradient_checkpointing` flag) — trades ~30% step time for activation
    # memory, enabling larger per-device batches
    remat: bool = False
    # one-pass Pallas GroupNorm+SiLU (ops/group_norm.py) — normalization
    # reductions are ~34% of the XLA forward (see PERFORMANCE.md)
    fused_norms: bool = False
    # fuse resnet GroupNorm(+gate)+SiLU into the consumer conv3x3's input
    # read (ops/norm_conv.py): 2 HBM passes instead of 4 per norm→conv pair
    fused_norm_conv: bool = False

    @property
    def num_levels(self) -> int:
        return len(self.block_out_channels)

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    def heads_at(self, level: int) -> int:
        return self.attention_head_dim[level]

    @classmethod
    def sd21(cls, resolution: int = 256, **overrides) -> "UNetConfig":
        """Stable Diffusion 2.1 U-Net at a given pixel resolution.

        Flash attention defaults ON at production scale: parity at 256px,
        2.5× end-to-end at 512px (PERFORMANCE.md)."""
        overrides.setdefault("use_flash_attention", True)
        return cls(sample_size=resolution // 8, **overrides)

    @classmethod
    def tiny(cls, **overrides) -> "UNetConfig":
        """Small config with the SD topology, for tests."""
        defaults = dict(
            sample_size=8,
            block_out_channels=(32, 64),
            layers_per_block=2,
            attention_head_dim=(2, 4),
            cross_attention_dim=32,
            norm_num_groups=8,
            ff_gate_width=4,
            down_block_types=("CrossAttnDownBlock2DHalfGated", "DownBlock2DHalfGated"),
            up_block_types=("UpBlock2DHalfGated", "CrossAttnUpBlock2DHalfGated"),
        )
        defaults.update(overrides)
        return cls(**defaults)
