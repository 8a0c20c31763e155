"""Reference-format (diffusers-style) checkpoint export.

The reference's checkpoint dirs contain `hypernet/`, `quantizer/` and
`unet/` subfolders written by diffusers `save_pretrained`
(/root/reference/pdm/training/trainer.py:253-313): each holds a
`config.json` (ConfigMixin kwargs) and a `diffusion_pytorch_model.safetensors`
state dict. Those subfolders are what the reference's own downstream tooling
loads (`filter_dataset.py:51-52`, `FineTuner.init_models` trainer.py:1421-1450),
so this module converts our flax pytrees into byte-compatible exports:

  export_hypernet   flax HyperStructure params → reference HyperStructure
                    state dict (incl. torch weight-norm parametrisation keys)
  export_quantizer  codebook params + embedding_gs snapshot → reference
                    StructureVectorQuantizer state dict
  export_unet       GatedUNet flax params → diffusers UNet2DConditionModel
                    state dict (exact inverse of models/convert.py)

All writers are host-side numpy; no JAX tracing.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

_DIFFUSERS_VERSION = "0.23.1"   # the reference's pin (env.yaml:110)
_WEIGHTS_NAME = "diffusion_pytorch_model.safetensors"


def _save(out_dir: str, class_name: str, config: dict, sd: Dict[str, np.ndarray]) -> None:
    os.makedirs(out_dir, exist_ok=True)
    full = {"_class_name": class_name, "_diffusers_version": _DIFFUSERS_VERSION}
    full.update(config)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(full, f, indent=2, default=lambda o: list(o) if hasattr(o, "__iter__") else o)
    import torch
    from safetensors.torch import save_file
    tensors = {k: torch.from_numpy(np.ascontiguousarray(np.asarray(v, dtype=np.float32)))
               for k, v in sd.items()}
    save_file(tensors, os.path.join(out_dir, _WEIGHTS_NAME))


def reference_structure(spec) -> dict:
    """The reference's nested `structure` dict (hypernet.py:38-39,
    quantizer.py:45-66): one width sublist per subblock (site widths in
    order) and one [0]/[1] depth sublist per subblock."""
    return {"width": [list(ws) for ws in spec.subblock_widths],
            "depth": [[d] for d in spec.depth_list]}


# ---------------------------------------------------------------- hypernet

def export_hypernet(out_dir: str, hypernet, params: dict) -> None:
    """Flax HyperStructure params → reference HyperStructure save_pretrained
    layout. Weight-norm heads are exported through torch's parametrisation
    keys (`mh_fc.{i}.parametrizations.weight.original{0,1}`) such that
    g·v/||v|| reconstructs our effective kernel exactly."""
    spec = hypernet.spec
    config = {
        "structure": reference_structure(spec),
        "input_dim": hypernet.input_dim,
        "wn_flag": bool(hypernet.weight_norm),
        "linear_bias": bool(hypernet.linear_bias),
        "single_arch_param": bool(hypernet.single_arch_param),
    }
    sd: Dict[str, np.ndarray] = {}
    if hypernet.single_arch_param:
        sd["arch"] = np.asarray(params["arch"])
    else:
        widths = list(spec.width_list) + [spec.num_depth]
        for i, w in enumerate(widths):
            k = np.asarray(params[f"head_{i}_kernel"])        # (in, w)
            if hypernet.weight_norm:
                g = np.asarray(params[f"head_{i}_g"])         # (w,)
                k = k / (np.linalg.norm(k, axis=0, keepdims=True) + 1e-12) * g
            weight = k.T                                      # torch (out, in)
            if hypernet.weight_norm:
                norms = np.linalg.norm(weight, axis=1, keepdims=True)  # (w, 1)
                sd[f"mh_fc.{i}.parametrizations.weight.original0"] = norms
                sd[f"mh_fc.{i}.parametrizations.weight.original1"] = weight
            else:
                sd[f"mh_fc.{i}.weight"] = weight
            if hypernet.linear_bias:
                sd[f"mh_fc.{i}.bias"] = np.asarray(params[f"head_{i}_bias"])
    _save(out_dir, "HyperStructure", config, sd)


# ---------------------------------------------------------------- quantizer

def export_quantizer(out_dir: str, quantizer, params: dict,
                     state: Optional[dict] = None) -> None:
    """Codebook + embedding_gs snapshot → reference StructureVectorQuantizer
    save_pretrained layout (state dict keys `embedding.weight`,
    `embedding_gs` — quantizer.py:81-84)."""
    spec = quantizer.spec
    nd = spec.num_depth
    depth_order = (list(quantizer.depth_order) if quantizer.depth_order is not None
                   else list(range(nd)))
    config = {
        "n_e": quantizer.n_e,
        "structure": reference_structure(spec),
        "beta": 0.25,
        "remap": None,
        "unknown_index": "random",
        "sane_index_shape": True,
        "temperature": quantizer.temperature,
        "base": quantizer.base,
        "depth_order": depth_order,
        "non_zero_width": bool(quantizer.non_zero_width),
        "sinkhorn_epsilon": quantizer.sinkhorn_epsilon,
        "sinkhorn_iterations": quantizer.sinkhorn_iterations,
        "resource_aware_normalization": bool(quantizer.resource_aware_normalization),
        "optimal_transport": bool(quantizer.optimal_transport),
    }
    emb = np.asarray(params["embedding"])
    gs = np.asarray(state["embedding_gs"]) if state is not None else emb
    _save(out_dir, "StructureVectorQuantizer", config,
          {"embedding.weight": emb, "embedding_gs": gs})


# ---------------------------------------------------------------- U-Net

def _conv_t(p):
    # flax (kh, kw, I, O) → torch (O, I, kh, kw)
    return {"weight": np.asarray(p["kernel"]).transpose(3, 2, 0, 1),
            "bias": np.asarray(p["bias"])}


def _linear_t(p):
    out = {"weight": np.asarray(p["kernel"]).T}
    if "bias" in p:
        out["bias"] = np.asarray(p["bias"])
    return out


def _norm_t(p):
    return {"weight": np.asarray(p["scale"]), "bias": np.asarray(p["bias"])}


def _put(sd, prefix, tensors):
    for k, v in tensors.items():
        sd[f"{prefix}.{k}"] = v


def _resnet_t(sd, p, params):
    _put(sd, f"{p}.norm1", _norm_t(params["norm1"]))
    _put(sd, f"{p}.conv1", _conv_t(params["conv1"]))
    _put(sd, f"{p}.time_emb_proj", _linear_t(params["time_emb_proj"]))
    _put(sd, f"{p}.norm2", _norm_t(params["norm2"]))
    _put(sd, f"{p}.conv2", _conv_t(params["conv2"]))
    if "conv_shortcut" in params:
        _put(sd, f"{p}.conv_shortcut", _conv_t(params["conv_shortcut"]))


def _attn_t(sd, p, params):
    _put(sd, f"{p}.to_q", _linear_t(params["to_q"]))
    _put(sd, f"{p}.to_k", _linear_t(params["to_k"]))
    _put(sd, f"{p}.to_v", _linear_t(params["to_v"]))
    _put(sd, f"{p}.to_out.0", _linear_t(params["to_out_0"]))


def _transformer_t(sd, p, params, use_linear_projection=True):
    proj = _linear_t if use_linear_projection else _conv_t
    _put(sd, f"{p}.norm", _norm_t(params["norm"]))
    _put(sd, f"{p}.proj_in", proj(params["proj_in"]))
    _put(sd, f"{p}.proj_out", proj(params["proj_out"]))
    tb = params["transformer_blocks_0"]
    q = f"{p}.transformer_blocks.0"
    _put(sd, f"{q}.norm1", _norm_t(tb["norm1"]))
    _attn_t(sd, f"{q}.attn1", tb["attn1"])
    _put(sd, f"{q}.norm2", _norm_t(tb["norm2"]))
    _attn_t(sd, f"{q}.attn2", tb["attn2"])
    _put(sd, f"{q}.norm3", _norm_t(tb["norm3"]))
    _put(sd, f"{q}.ff.net.0.proj", _linear_t(tb["ff"]["act"]["proj"]))
    _put(sd, f"{q}.ff.net.2", _linear_t(tb["ff"]["out"]))


def unet_flax_to_torch(params: dict, cfg) -> Dict[str, np.ndarray]:
    """Exact inverse of models/convert.convert_unet_state_dict."""
    sd: Dict[str, np.ndarray] = {}
    _put(sd, "conv_in", _conv_t(params["conv_in"]))
    _put(sd, "time_embedding.linear_1", _linear_t(params["time_embedding_linear_1"]))
    _put(sd, "time_embedding.linear_2", _linear_t(params["time_embedding_linear_2"]))
    _put(sd, "conv_norm_out", _norm_t(params["conv_norm_out"]))
    _put(sd, "conv_out", _conv_t(params["conv_out"]))
    L = cfg.num_levels
    for i, bt in enumerate(cfg.down_block_types):
        cross = bt.startswith("CrossAttn")
        for j in range(cfg.layers_per_block):
            _resnet_t(sd, f"down_blocks.{i}.resnets.{j}",
                      params[f"down_blocks_{i}_resnets_{j}"])
            if cross:
                _transformer_t(sd, f"down_blocks.{i}.attentions.{j}",
                               params[f"down_blocks_{i}_attentions_{j}"],
                               cfg.use_linear_projection)
        if i < L - 1:
            _put(sd, f"down_blocks.{i}.downsamplers.0.conv",
                 _conv_t(params[f"down_blocks_{i}_downsamplers_0"]["conv"]))
    _resnet_t(sd, "mid_block.resnets.0", params["mid_block_resnets_0"])
    _resnet_t(sd, "mid_block.resnets.1", params["mid_block_resnets_1"])
    _transformer_t(sd, "mid_block.attentions.0", params["mid_block_attentions_0"],
                   cfg.use_linear_projection)
    for i, bt in enumerate(cfg.up_block_types):
        cross = bt.startswith("CrossAttn")
        for j in range(cfg.layers_per_block + 1):
            _resnet_t(sd, f"up_blocks.{i}.resnets.{j}",
                      params[f"up_blocks_{i}_resnets_{j}"])
            if cross:
                _transformer_t(sd, f"up_blocks.{i}.attentions.{j}",
                               params[f"up_blocks_{i}_attentions_{j}"],
                               cfg.use_linear_projection)
        if i < L - 1:
            _put(sd, f"up_blocks.{i}.upsamplers.0.conv",
                 _conv_t(params[f"up_blocks_{i}_upsamplers_0"]["conv"]))
    return sd


def export_unet(out_dir: str, cfg, params: dict) -> None:
    """GatedUNet flax params → diffusers-format unet/ subfolder (config.json
    carries the gated block-type names, as the reference's
    UNet2DConditionModelGated.save_pretrained does)."""
    config = {
        "sample_size": cfg.sample_size,
        "in_channels": cfg.in_channels,
        "out_channels": cfg.out_channels,
        "down_block_types": list(cfg.down_block_types),
        "mid_block_type": cfg.mid_block_type,
        "up_block_types": list(cfg.up_block_types),
        "block_out_channels": list(cfg.block_out_channels),
        "layers_per_block": cfg.layers_per_block,
        "attention_head_dim": list(cfg.attention_head_dim),
        "cross_attention_dim": cfg.cross_attention_dim,
        "norm_num_groups": cfg.norm_num_groups,
        "norm_eps": cfg.norm_eps,
        "use_linear_projection": cfg.use_linear_projection,
        "flip_sin_to_cos": cfg.flip_sin_to_cos,
        "freq_shift": cfg.freq_shift,
        "act_fn": "silu",
        "center_input_sample": False,
        "downsample_padding": 1,
        "mid_block_scale_factor": 1,
        "gated_ff": cfg.gated_ff,
        "ff_gate_width": cfg.ff_gate_width,
    }
    _save(out_dir, "UNet2DConditionModelGated", config, unet_flax_to_torch(params, cfg))


def export_pruning_checkpoint(ckpt_dir: str, hypernet, hypernet_params,
                              quantizer, quantizer_params, q_state,
                              unet_cfg=None, unet_params=None) -> None:
    """Write the reference's subfolder trio next to the orbax state
    (trainer.py:253-313). The unet/ export is optional — in stage 1 the
    U-Net is frozen, so its weights equal the pretrained checkpoint and
    re-writing ~3.5 GB per checkpoint is usually waste."""
    export_hypernet(os.path.join(ckpt_dir, "hypernet"), hypernet, hypernet_params)
    export_quantizer(os.path.join(ckpt_dir, "quantizer"), quantizer,
                     quantizer_params, q_state)
    if unet_cfg is not None and unet_params is not None:
        export_unet(os.path.join(ckpt_dir, "unet"), unet_cfg, unet_params)
