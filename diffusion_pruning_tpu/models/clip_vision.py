"""CLIP vision tower (ViT) in flax — image embeddings for CLIP-score, CMMD
and the safety checker.

The reference runs OpenAI CLIP ViT-B/32 for CLIP-score
(pdm/utils/clip_utils.py:141-170) and CLIP ViT-L/14-336 for CMMD
(cmmd-pytorch/embedding.py:22-71) through torch; this is the same
architecture in flax (NHWC patches → class token + learned positions →
pre-LN ViT → post-LN → visual projection), sized by config so tiny random
versions drive tests and the converter loads real HF checkpoints
(models/convert.convert_clip_vision_state_dict).

Note the two GELU flavours: OpenAI CLIP checkpoints use quick_gelu
(x·σ(1.702x)); some later ports use exact GELU — configurable, matching HF's
`hidden_act`.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    image_size: int = 224
    patch_size: int = 32
    projection_dim: int = 512
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"     # OpenAI CLIP default

    @property
    def num_positions(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1

    @classmethod
    def vit_b32(cls) -> "CLIPVisionConfig":
        """openai/clip-vit-base-patch32 — the CLIP-score reference tower."""
        return cls()

    @classmethod
    def vit_l14_336(cls) -> "CLIPVisionConfig":
        """openai/clip-vit-large-patch14-336 — the CMMD reference tower."""
        return cls(hidden_size=1024, num_layers=24, num_heads=16,
                   intermediate_size=4096, image_size=336, patch_size=14,
                   projection_dim=768)

    @classmethod
    def tiny(cls) -> "CLIPVisionConfig":
        return cls(hidden_size=32, num_layers=2, num_heads=2,
                   intermediate_size=64, image_size=32, patch_size=8,
                   projection_dim=16)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    return lambda x: nn.gelu(x, approximate=False)


class CLIPVisionEncoder(nn.Module):
    """Returns (pooled_embedding (B, D), projected (B, proj_dim)).

    Input: (B, H, W, 3) pixel values, ALREADY CLIP-normalised
    (models/safety.clip_preprocess)."""
    cfg: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jax.Array):
        cfg = self.cfg
        b = pixels.shape[0]
        act = _act(cfg.hidden_act)
        # patch embedding: conv stride=patch, no bias (HF patch_embedding)
        patches = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                          strides=(cfg.patch_size, cfg.patch_size),
                          use_bias=False, padding="VALID", dtype=self.dtype,
                          name="patch_embedding")(pixels.astype(self.dtype))
        patches = patches.reshape(b, -1, cfg.hidden_size)
        cls_tok = self.param("class_embedding", nn.initializers.normal(0.02),
                             (cfg.hidden_size,))
        h = jnp.concatenate(
            [jnp.broadcast_to(cls_tok.astype(self.dtype),
                              (b, 1, cfg.hidden_size)), patches], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (cfg.num_positions, cfg.hidden_size))
        h = h + pos[None, : h.shape[1]].astype(self.dtype)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="pre_layernorm")(h)

        s = h.shape[1]
        hd = cfg.hidden_size // cfg.num_heads
        for i in range(cfg.num_layers):
            ln1 = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                               name=f"layers_{i}_ln1")(h)
            q = nn.Dense(cfg.hidden_size, dtype=self.dtype, name=f"layers_{i}_q")(ln1)
            k = nn.Dense(cfg.hidden_size, dtype=self.dtype, name=f"layers_{i}_k")(ln1)
            v = nn.Dense(cfg.hidden_size, dtype=self.dtype, name=f"layers_{i}_v")(ln1)
            q = q.reshape(b, s, cfg.num_heads, hd)
            k = k.reshape(b, s, cfg.num_heads, hd)
            v = v.reshape(b, s, cfg.num_heads, hd)
            o = jax.nn.dot_product_attention(q, k, v)
            o = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                         name=f"layers_{i}_out")(o.reshape(b, s, cfg.hidden_size))
            h = h + o
            ln2 = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                               name=f"layers_{i}_ln2")(h)
            m = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                         name=f"layers_{i}_fc1")(ln2)
            m = act(m)
            m = nn.Dense(cfg.hidden_size, dtype=self.dtype, name=f"layers_{i}_fc2")(m)
            h = h + m

        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                              name="post_layernorm")(h[:, 0])
        projected = nn.Dense(self.cfg.projection_dim, use_bias=False,
                             dtype=self.dtype, name="visual_projection")(pooled)
        return pooled, projected
