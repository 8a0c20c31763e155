"""Safety checker + CLIP feature extractor for the generation pipeline.

The reference pipeline carries diffusers' `StableDiffusionSafetyChecker` and
a CLIP `feature_extractor` (/root/reference/pdm/pipelines/
pruning_pipelines.py:160-178) and runs them on decoded images
(:826-839): flagged images are replaced with black. Re-implemented here as

  * `clip_preprocess` — the feature-extractor transform (resize 224, CLIP
    mean/std normalisation), jit-safe;
  * `SafetyChecker` — cosine screening of CLIP image embeddings against
    concept embeddings with per-concept thresholds (the diffusers
    architecture), parameterised by an embed function so any CLIP vision
    tower (or a stub in tests) plugs in.

With no safety checker configured the pipeline behaves exactly as before
(the reference also supports `requires_safety_checker=False`).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# OpenAI CLIP image normalisation (the feature extractor's constants)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_preprocess(images: jax.Array, size: int = 224) -> jax.Array:
    """Images (B, H, W, 3) in [0, 1] → CLIP pixel_values (B, size, size, 3).
    Bilinear resize + mean/std normalisation, matching the HF
    CLIPImageProcessor the reference's feature_extractor uses."""
    b = images.shape[0]
    x = jax.image.resize(images.astype(jnp.float32),
                         (b, size, size, images.shape[-1]), method="bilinear")
    mean = jnp.asarray(CLIP_IMAGE_MEAN)
    std = jnp.asarray(CLIP_IMAGE_STD)
    return (x - mean) / std


@dataclasses.dataclass
class SafetyChecker:
    """Concept-cosine screening (diffusers StableDiffusionSafetyChecker
    semantics): embed images, compare against `concept_embeds` with
    per-concept `concept_thresholds`; any exceedance flags the image.

    embed_fn: (B, 224, 224, 3) preprocessed pixels → (B, D) image embeddings
    (a CLIP vision tower; tests use stubs)."""
    embed_fn: Callable[[jax.Array], jax.Array]
    concept_embeds: np.ndarray          # (C, D)
    concept_thresholds: np.ndarray      # (C,)

    def flags(self, images: jax.Array) -> jax.Array:
        emb = self.embed_fn(clip_preprocess(images))
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        ce = jnp.asarray(self.concept_embeds)
        ce = ce / jnp.linalg.norm(ce, axis=-1, keepdims=True)
        cos = emb @ ce.T                                    # (B, C)
        return jnp.any(cos > jnp.asarray(self.concept_thresholds)[None, :], axis=-1)

    def __call__(self, images: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Returns (screened_images, nsfw_flags); flagged images are blacked
        out, as the reference pipeline does."""
        f = self.flags(images)
        return jnp.where(f[:, None, None, None], jnp.zeros_like(images), images), f
