"""Checkpoint converters: diffusers/transformers torch weights → flax params.

The reference loads SD-2.1 weights through diffusers `from_pretrained` into
its gated module tree (unet_2d_conditional.py:1729-2117). Here the same
checkpoints (local paths — this framework does no network egress) are
converted once into our NHWC flax pytrees:

  convert_unet_state_dict   diffusers UNet2DConditionModel → GatedUNet
  convert_vae_state_dict    diffusers AutoencoderKL        → AutoencoderKL
  convert_clip_text_state_dict  HF CLIPTextModel           → CLIPTextEncoder
  convert_mpnet_state_dict  HF MPNetModel                  → MPNetEncoder

Layout rules: torch conv (O,I,kh,kw) → flax (kh,kw,I,O); linear (O,I) → (I,O);
norm weight→scale. All outputs are numpy float32 pytrees.
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().float().numpy() if hasattr(t, "detach") else t,
                      dtype=np.float32)


def _conv(sd, key):
    return {"kernel": _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd[f"{key}.bias"])}


def _linear(sd, key, bias=True):
    out = {"kernel": _np(sd[f"{key}.weight"]).T}
    if bias and f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _norm(sd, key):
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def load_torch_state_dict(path: str) -> Dict[str, "object"]:
    """Load a .safetensors / .bin state dict from a local file or a diffusers
    model subfolder."""
    if os.path.isdir(path):
        for name in ("diffusion_pytorch_model.safetensors", "model.safetensors",
                     "diffusion_pytorch_model.bin", "pytorch_model.bin"):
            p = os.path.join(path, name)
            if os.path.exists(p):
                path = p
                break
    if path.endswith(".safetensors"):
        from safetensors.torch import load_file
        return load_file(path)
    import torch
    return torch.load(path, map_location="cpu", weights_only=True)


# ---------------------------------------------------------------- U-Net

def _resnet_params(sd, p):
    out = {
        "norm1": _norm(sd, f"{p}.norm1"),
        "conv1": _conv(sd, f"{p}.conv1"),
        "time_emb_proj": _linear(sd, f"{p}.time_emb_proj"),
        "norm2": _norm(sd, f"{p}.norm2"),
        "conv2": _conv(sd, f"{p}.conv2"),
    }
    if f"{p}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{p}.conv_shortcut")
    return out


def _attn_params(sd, p):
    return {
        "to_q": _linear(sd, f"{p}.to_q", bias=False),
        "to_k": _linear(sd, f"{p}.to_k", bias=False),
        "to_v": _linear(sd, f"{p}.to_v", bias=False),
        "to_out_0": _linear(sd, f"{p}.to_out.0"),
    }


def _transformer_params(sd, p, use_linear_projection=True):
    proj = _linear if use_linear_projection else _conv
    tb = f"{p}.transformer_blocks.0"
    return {
        "norm": _norm(sd, f"{p}.norm"),
        "proj_in": proj(sd, f"{p}.proj_in"),
        "proj_out": proj(sd, f"{p}.proj_out"),
        "transformer_blocks_0": {
            "norm1": _norm(sd, f"{tb}.norm1"),
            "attn1": _attn_params(sd, f"{tb}.attn1"),
            "norm2": _norm(sd, f"{tb}.norm2"),
            "attn2": _attn_params(sd, f"{tb}.attn2"),
            "norm3": _norm(sd, f"{tb}.norm3"),
            "ff": {
                "act": {"proj": _linear(sd, f"{tb}.ff.net.0.proj")},
                "out": _linear(sd, f"{tb}.ff.net.2"),
            },
        },
    }


def convert_unet_state_dict(sd: dict, cfg) -> dict:
    """cfg: UNetConfig (for block layout)."""
    out = {
        "conv_in": _conv(sd, "conv_in"),
        "time_embedding_linear_1": _linear(sd, "time_embedding.linear_1"),
        "time_embedding_linear_2": _linear(sd, "time_embedding.linear_2"),
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }
    L = cfg.num_levels
    for i, bt in enumerate(cfg.down_block_types):
        cross = bt.startswith("CrossAttn")
        for j in range(cfg.layers_per_block):
            out[f"down_blocks_{i}_resnets_{j}"] = _resnet_params(
                sd, f"down_blocks.{i}.resnets.{j}")
            if cross:
                out[f"down_blocks_{i}_attentions_{j}"] = _transformer_params(
                    sd, f"down_blocks.{i}.attentions.{j}", cfg.use_linear_projection)
        if i < L - 1:
            out[f"down_blocks_{i}_downsamplers_0"] = {
                "conv": _conv(sd, f"down_blocks.{i}.downsamplers.0.conv")}
    out["mid_block_resnets_0"] = _resnet_params(sd, "mid_block.resnets.0")
    out["mid_block_resnets_1"] = _resnet_params(sd, "mid_block.resnets.1")
    out["mid_block_attentions_0"] = _transformer_params(
        sd, "mid_block.attentions.0", cfg.use_linear_projection)
    for i, bt in enumerate(cfg.up_block_types):
        cross = bt.startswith("CrossAttn")
        for j in range(cfg.layers_per_block + 1):
            out[f"up_blocks_{i}_resnets_{j}"] = _resnet_params(
                sd, f"up_blocks.{i}.resnets.{j}")
            if cross:
                out[f"up_blocks_{i}_attentions_{j}"] = _transformer_params(
                    sd, f"up_blocks.{i}.attentions.{j}", cfg.use_linear_projection)
        if i < L - 1:
            out[f"up_blocks_{i}_upsamplers_0"] = {
                "conv": _conv(sd, f"up_blocks.{i}.upsamplers.0.conv")}
    return out


# ---------------------------------------------------------------- VAE

def _vae_resnet(sd, p):
    out = {
        "norm1": _norm(sd, f"{p}.norm1"), "conv1": _conv(sd, f"{p}.conv1"),
        "norm2": _norm(sd, f"{p}.norm2"), "conv2": _conv(sd, f"{p}.conv2"),
    }
    if f"{p}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{p}.conv_shortcut")
    return out


def _vae_attn(sd, p):
    return {
        "group_norm": _norm(sd, f"{p}.group_norm"),
        "to_q": _linear(sd, f"{p}.to_q"), "to_k": _linear(sd, f"{p}.to_k"),
        "to_v": _linear(sd, f"{p}.to_v"), "to_out_0": _linear(sd, f"{p}.to_out.0"),
    }


def convert_vae_state_dict(sd: dict, cfg) -> dict:
    enc = {"conv_in": _conv(sd, "encoder.conv_in"),
           "conv_norm_out": _norm(sd, "encoder.conv_norm_out"),
           "conv_out": _conv(sd, "encoder.conv_out"),
           "quant_conv": _conv(sd, "quant_conv"),
           "mid_resnet_0": _vae_resnet(sd, "encoder.mid_block.resnets.0"),
           "mid_resnet_1": _vae_resnet(sd, "encoder.mid_block.resnets.1"),
           "mid_attn": _vae_attn(sd, "encoder.mid_block.attentions.0")}
    n = len(cfg.block_out_channels)
    for i in range(n):
        for j in range(cfg.layers_per_block):
            enc[f"down_{i}_resnet_{j}"] = _vae_resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}")
        if i < n - 1:
            enc[f"down_{i}_downsample"] = _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
    dec = {"post_quant_conv": _conv(sd, "post_quant_conv"),
           "conv_in": _conv(sd, "decoder.conv_in"),
           "conv_norm_out": _norm(sd, "decoder.conv_norm_out"),
           "conv_out": _conv(sd, "decoder.conv_out"),
           "mid_resnet_0": _vae_resnet(sd, "decoder.mid_block.resnets.0"),
           "mid_resnet_1": _vae_resnet(sd, "decoder.mid_block.resnets.1"),
           "mid_attn": _vae_attn(sd, "decoder.mid_block.attentions.0")}
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            dec[f"up_{i}_resnet_{j}"] = _vae_resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}")
        if i < n - 1:
            dec[f"up_{i}_upsample"] = _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
    return {"encoder": enc, "decoder": dec}


# ---------------------------------------------------------------- text encoders

def convert_clip_text_state_dict(sd: dict, cfg) -> dict:
    pre = "text_model." if any(k.startswith("text_model.") for k in sd) else ""
    out = {
        "token_embedding": {"embedding": _np(sd[f"{pre}embeddings.token_embedding.weight"])},
        "position_embedding": _np(sd[f"{pre}embeddings.position_embedding.weight"])[: cfg.max_positions],
        "final_layer_norm": _norm(sd, f"{pre}final_layer_norm"),
    }
    for i in range(cfg.num_layers):
        p = f"{pre}encoder.layers.{i}"
        out[f"layers_{i}_ln1"] = _norm(sd, f"{p}.layer_norm1")
        out[f"layers_{i}_q"] = _linear(sd, f"{p}.self_attn.q_proj")
        out[f"layers_{i}_k"] = _linear(sd, f"{p}.self_attn.k_proj")
        out[f"layers_{i}_v"] = _linear(sd, f"{p}.self_attn.v_proj")
        out[f"layers_{i}_out"] = _linear(sd, f"{p}.self_attn.out_proj")
        out[f"layers_{i}_ln2"] = _norm(sd, f"{p}.layer_norm2")
        out[f"layers_{i}_fc1"] = _linear(sd, f"{p}.mlp.fc1")
        out[f"layers_{i}_fc2"] = _linear(sd, f"{p}.mlp.fc2")
    return out


def convert_clip_vision_state_dict(sd: dict, cfg) -> dict:
    """HF CLIPVisionModel(WithProjection) / the vision_model inside a
    diffusers StableDiffusionSafetyChecker → models/clip_vision.py params.
    Handles the `vision_model.` prefix and HF's `pre_layrnorm` typo."""
    pre = ""
    # diffusers StableDiffusionSafetyChecker nests CLIPVisionModel, whose own
    # state dict is itself prefixed → "vision_model.vision_model."
    for cand in ("vision_model.vision_model.", "vision_model.",
                 "clip.vision_model."):
        if any(k.startswith(cand + "embeddings.") for k in sd):
            pre = cand
            break
    def g(key):
        return sd[f"{pre}{key}"]

    out = {
        "class_embedding": _np(g("embeddings.class_embedding")).reshape(-1),
        "patch_embedding": {
            "kernel": _np(g("embeddings.patch_embedding.weight")).transpose(2, 3, 1, 0)},
        "position_embedding": _np(g("embeddings.position_embedding.weight")),
        "post_layernorm": {"scale": _np(g("post_layernorm.weight")),
                           "bias": _np(g("post_layernorm.bias"))},
    }
    # HF spells it "pre_layrnorm"
    for name in ("pre_layrnorm", "pre_layernorm"):
        if f"{pre}{name}.weight" in sd:
            out["pre_layernorm"] = {"scale": _np(g(f"{name}.weight")),
                                    "bias": _np(g(f"{name}.bias"))}
            break
    for i in range(cfg.num_layers):
        p = f"{pre}encoder.layers.{i}"
        out[f"layers_{i}_ln1"] = _norm(sd, f"{p}.layer_norm1")
        out[f"layers_{i}_q"] = _linear(sd, f"{p}.self_attn.q_proj")
        out[f"layers_{i}_k"] = _linear(sd, f"{p}.self_attn.k_proj")
        out[f"layers_{i}_v"] = _linear(sd, f"{p}.self_attn.v_proj")
        out[f"layers_{i}_out"] = _linear(sd, f"{p}.self_attn.out_proj")
        out[f"layers_{i}_ln2"] = _norm(sd, f"{p}.layer_norm2")
        out[f"layers_{i}_fc1"] = _linear(sd, f"{p}.mlp.fc1")
        out[f"layers_{i}_fc2"] = _linear(sd, f"{p}.mlp.fc2")
    proj_key = "visual_projection.weight"
    if proj_key in sd:
        out["visual_projection"] = {"kernel": _np(sd[proj_key]).T}
    else:  # random projection when the checkpoint carries none
        rng = np.random.RandomState(0)
        out["visual_projection"] = {"kernel": rng.randn(
            cfg.hidden_size, cfg.projection_dim).astype(np.float32)
            / np.sqrt(cfg.hidden_size)}
    return out


def convert_mpnet_state_dict(sd: dict, cfg) -> dict:
    pre = "mpnet." if any(k.startswith("mpnet.") for k in sd) else ""
    out = {
        "word_embeddings": {"embedding": _np(sd[f"{pre}embeddings.word_embeddings.weight"])},
        "position_embeddings": {"embedding": _np(sd[f"{pre}embeddings.position_embeddings.weight"])},
        "embeddings_ln": _norm(sd, f"{pre}embeddings.LayerNorm"),
        "relative_attention_bias": _np(sd[f"{pre}encoder.relative_attention_bias.weight"]),
    }
    for i in range(cfg.num_layers):
        p = f"{pre}encoder.layer.{i}"
        out[f"layers_{i}_q"] = _linear(sd, f"{p}.attention.attn.q")
        out[f"layers_{i}_k"] = _linear(sd, f"{p}.attention.attn.k")
        out[f"layers_{i}_v"] = _linear(sd, f"{p}.attention.attn.v")
        out[f"layers_{i}_out"] = _linear(sd, f"{p}.attention.attn.o")
        out[f"layers_{i}_ln1"] = _norm(sd, f"{p}.attention.LayerNorm")
        out[f"layers_{i}_fc1"] = _linear(sd, f"{p}.intermediate.dense")
        out[f"layers_{i}_fc2"] = _linear(sd, f"{p}.output.dense")
        out[f"layers_{i}_ln2"] = _norm(sd, f"{p}.output.LayerNorm")
    return out
