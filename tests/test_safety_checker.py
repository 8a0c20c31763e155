"""SafetyChecker.from_diffusers: load a (locally constructed) diffusers
StableDiffusionSafetyChecker checkpoint — CLIP vision tower + concept
embeddings — and match the diffusers screening semantics computed in torch."""
import json

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
st = pytest.importorskip("safetensors.torch")

from diffusion_pruning_tpu.models.clip_vision import CLIPVisionConfig
from diffusion_pruning_tpu.models.safety import SafetyChecker, clip_preprocess


def _make_safety_dir(tmp_path, cfg: CLIPVisionConfig, n_concepts=3, n_special=1):
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=cfg.hidden_size, intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        projection_dim=cfg.projection_dim, hidden_act=cfg.hidden_act)
    torch.manual_seed(0)
    vision = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
    g = torch.Generator().manual_seed(1)
    concept = torch.randn(n_concepts, cfg.projection_dim, generator=g)
    thresholds = torch.full((n_concepts,), 0.2)
    special = torch.randn(n_special, cfg.projection_dim, generator=g)
    special_t = torch.full((n_special,), 0.3)

    sd = {}
    for k, v in vision.state_dict().items():
        if k.startswith("vision_model."):
            sd[f"vision_model.{k}"] = v          # diffusers double-nesting
        else:
            sd[k] = v                            # visual_projection.weight
    sd["concept_embeds"] = concept
    sd["concept_embeds_weights"] = thresholds
    sd["special_care_embeds"] = special
    sd["special_care_embeds_weights"] = special_t

    d = tmp_path / "safety_checker"
    d.mkdir()
    st.save_file({k: v.contiguous() for k, v in sd.items()},
                 str(d / "model.safetensors"))
    with open(d / "config.json", "w") as f:
        json.dump({"projection_dim": cfg.projection_dim,
                   "vision_config": {
                       "hidden_size": cfg.hidden_size,
                       "intermediate_size": cfg.intermediate_size,
                       "num_hidden_layers": cfg.num_layers,
                       "num_attention_heads": cfg.num_heads,
                       "image_size": cfg.image_size,
                       "patch_size": cfg.patch_size,
                       "hidden_act": cfg.hidden_act,
                   }}, f)
    return d, vision, (concept, thresholds, special, special_t)


def test_from_diffusers_matches_torch_screening(tmp_path):
    cfg = CLIPVisionConfig.tiny()
    d, vision, (concept, thresholds, special, special_t) = _make_safety_dir(
        tmp_path, cfg)
    checker = SafetyChecker.from_diffusers(str(d))

    images = jnp.asarray(np.random.RandomState(2).rand(4, 24, 24, 3), jnp.float32)
    flags = np.asarray(checker.flags(images))

    # torch reference of the diffusers screening
    px = np.asarray(clip_preprocess(images, cfg.image_size)).transpose(0, 3, 1, 2)
    with torch.no_grad():
        emb = vision(torch.from_numpy(px)).image_embeds
    emb = emb / emb.norm(dim=-1, keepdim=True)
    cn = concept / concept.norm(dim=-1, keepdim=True)
    sn = special / special.norm(dim=-1, keepdim=True)
    special_hit = ((emb @ sn.T) > special_t[None]).any(dim=-1)
    adj = torch.where(special_hit, 0.01, 0.0)
    want = ((emb @ cn.T) - (thresholds[None] - adj[:, None]) > 0).any(dim=-1)
    np.testing.assert_array_equal(flags, want.numpy())

    imgs, nsfw = checker(images)
    np.testing.assert_array_equal(np.asarray(nsfw), want.numpy())
    blacked = np.asarray(imgs)[want.numpy()]
    if blacked.size:
        assert np.abs(blacked).max() == 0.0
