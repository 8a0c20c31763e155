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
    image_size: int = 224               # the vision tower's input size

    def flags(self, images: jax.Array) -> jax.Array:
        emb = self.embed_fn(clip_preprocess(images, self.image_size))
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

    @classmethod
    def from_diffusers(cls, safety_dir: str, dtype=None) -> "SafetyChecker":
        """Build from a local diffusers `safety_checker/` subfolder
        (StableDiffusionSafetyChecker: CLIP ViT-L/14 vision tower +
        concept/special-care embeddings). The screening follows the
        diffusers logic: cosine vs concept embeds with per-concept
        thresholds, tightened by 0.01 when any special-care concept fires."""
        import json
        import os

        import jax.numpy as jnp_

        from diffusion_pruning_tpu.models.clip_vision import (
            CLIPVisionConfig, CLIPVisionEncoder,
        )
        from diffusion_pruning_tpu.models.convert import (
            convert_clip_vision_state_dict, load_torch_state_dict,
        )

        with open(os.path.join(safety_dir, "config.json")) as f:
            conf = json.load(f)
        v = conf.get("vision_config", {})
        vcfg = CLIPVisionConfig(
            hidden_size=v.get("hidden_size", 1024),
            num_layers=v.get("num_hidden_layers", 24),
            num_heads=v.get("num_attention_heads", 16),
            intermediate_size=v.get("intermediate_size", 4096),
            image_size=v.get("image_size", 224),
            patch_size=v.get("patch_size", 14),
            projection_dim=conf.get("projection_dim", 768),
            hidden_act=v.get("hidden_act", "quick_gelu"),
        )
        sd = load_torch_state_dict(safety_dir)
        params = convert_clip_vision_state_dict(sd, vcfg)
        enc = CLIPVisionEncoder(vcfg, dtype=dtype or jnp_.float32)
        concept = np.asarray(sd["concept_embeds"], dtype=np.float32)
        thresholds = np.asarray(sd["concept_embeds_weights"], dtype=np.float32)
        special = np.asarray(sd.get("special_care_embeds", np.zeros((0, concept.shape[1]))),
                             dtype=np.float32)
        special_t = np.asarray(sd.get("special_care_embeds_weights", np.zeros((0,))),
                               dtype=np.float32)

        fwd = jax.jit(lambda p, px: enc.apply({"params": p}, px)[1])

        checker = cls(embed_fn=lambda px: fwd(params, px),
                      concept_embeds=concept, concept_thresholds=thresholds,
                      image_size=vcfg.image_size)
        checker.special_embeds = special
        checker.special_thresholds = special_t
        checker.flags = checker._diffusers_flags          # type: ignore
        return checker

    def _diffusers_flags(self, images: jax.Array) -> jax.Array:
        emb = self.embed_fn(clip_preprocess(images, self.image_size))
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

        def cos(table):
            t = jnp.asarray(table)
            t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
            return emb @ t.T

        adjustment = jnp.zeros((images.shape[0],))
        if getattr(self, "special_embeds", None) is not None and len(self.special_embeds):
            special_hit = jnp.any(
                cos(self.special_embeds)
                > jnp.asarray(self.special_thresholds)[None, :], axis=-1)
            adjustment = jnp.where(special_hit, 0.01, 0.0)
        scores = cos(self.concept_embeds) - (
            jnp.asarray(self.concept_thresholds)[None, :] - adjustment[:, None])
        return jnp.any(scores > 0, axis=-1)
