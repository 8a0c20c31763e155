"""Build the model zoo from a reference-style YAML config.

The reference's `Pruner.init_models` (trainer.py:697-771) pulls everything
from the HF hub. This framework does no network egress: checkpoints must be
local diffusers/transformers directories; when a path is missing the factory
falls back to randomly-initialised models of the configured shape (smoke /
CI mode) and says so.

Checkpoint directory layout expected (standard diffusers dump):
  <sd_root>/unet/diffusion_pytorch_model.safetensors + config.json
  <sd_root>/vae/...
  <sd_root>/text_encoder/model.safetensors
  <mpnet_root>/model.safetensors
"""
from __future__ import annotations

import json
import logging
import os
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from diffusion_pruning_tpu.core.structure import build_structure
from diffusion_pruning_tpu.models import convert
from diffusion_pruning_tpu.models.hypernet import HyperStructure
from diffusion_pruning_tpu.models.quantizer import StructureQuantizer
from diffusion_pruning_tpu.models.text_encoders import (
    CLIPTextConfig, CLIPTextEncoder, MPNetConfig, MPNetEncoder,
)
from diffusion_pruning_tpu.models.unet.config import UNetConfig
from diffusion_pruning_tpu.models.unet.unet import GatedUNet
from diffusion_pruning_tpu.models.vae import AutoencoderKL, VAEConfig
from diffusion_pruning_tpu.schedulers import DiffusionSchedule

logger = logging.getLogger("diffusion_pruning_tpu")


def _jit_init(fn):
    """Run a flax init inside ONE jitted program.

    Un-jitted inits dispatch op-by-op; over the remote-TPU tunnel every op
    pays the ~30 ms RTT, turning even a tiny model's init into minutes
    (measured: ~3 min/model in the replay chain before this). One jit =
    one (persistent-cached) compile + one dispatch, with the exact same
    flax initializer semantics."""
    return jax.jit(fn)()


def unet_config_from_yaml(cfg, tiny: bool = False) -> UNetConfig:
    u = cfg.model.unet
    if tiny:
        return UNetConfig.tiny(gated_ff=u.get("gated_ff", True),
                               fused_norm_conv=u.get("fused_norm_conv", False))
    return UNetConfig.sd21(
        resolution=u.get("resolution", 256),
        down_block_types=tuple(u.get("unet_down_blocks")),
        mid_block_type=u.get("unet_mid_block"),
        up_block_types=tuple(u.get("unet_up_blocks")),
        gated_ff=u.get("gated_ff", True),
        ff_gate_width=u.get("ff_gate_width", 32),
        # reference schema: training.gradient_checkpointing (trainer.py:144-160)
        # maps to per-subblock rematerialisation
        remat=bool(cfg.get_path("training.gradient_checkpointing", False)),
        # TPU extensions (default flash ON at SD scale — PERFORMANCE.md)
        use_flash_attention=u.get("use_flash_attention", True),
        fused_norm_conv=u.get("fused_norm_conv", False),
    )


def _exists(path: Optional[str]) -> bool:
    return bool(path) and os.path.exists(path)


def _cast(params, param_dtype):
    """Frozen-model mixed precision: the reference casts frozen weights to
    the accelerate weight_dtype (trainer.py:456-466) — halves their HBM
    footprint and read traffic. Trainable params stay f32."""
    if param_dtype is None:
        return jax.tree.map(jnp.asarray, params)
    return jax.tree.map(lambda x: jnp.asarray(x, param_dtype), params)


def build_unet(ucfg: UNetConfig, sd_root: Optional[str], dtype=jnp.float32,
               plan=None, param_dtype=None) -> Tuple[GatedUNet, dict]:
    model = GatedUNet(ucfg, plan=plan, dtype=dtype)
    sub = os.path.join(sd_root or "", "unet")
    if _exists(sub):
        sd = convert.load_torch_state_dict(sub)
        params = _cast(convert.convert_unet_state_dict(sd, ucfg), param_dtype)
        logger.info("loaded U-Net weights from %s", sub)
    else:
        logger.warning("U-Net checkpoint %s missing — random init", sub)
        params = _jit_init(lambda: model.init_params(jax.random.PRNGKey(0), batch=1))
        if param_dtype is not None:
            params = _cast(params, param_dtype)
    return model, params


def build_vae(sd_root: Optional[str], tiny: bool = False, dtype=jnp.float32,
              param_dtype=None):
    vcfg = VAEConfig.tiny() if tiny else VAEConfig.sd()
    model = AutoencoderKL(vcfg, dtype=dtype)
    sub = os.path.join(sd_root or "", "vae")
    if _exists(sub):
        sd = convert.load_torch_state_dict(sub)
        params = _cast(convert.convert_vae_state_dict(sd, vcfg), param_dtype)
    else:
        logger.warning("VAE checkpoint %s missing — random init", sub)
        res = 32 if tiny else 256
        params = _jit_init(lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, res, res, 3)),
            jax.random.PRNGKey(1))["params"])
        if param_dtype is not None:
            params = _cast(params, param_dtype)
    return model, params


def build_text_encoder(sd_root: Optional[str], tiny: bool = False, dtype=jnp.float32,
                       param_dtype=None):
    tcfg = CLIPTextConfig.tiny() if tiny else CLIPTextConfig.sd21()
    model = CLIPTextEncoder(tcfg, dtype=dtype)
    sub = os.path.join(sd_root or "", "text_encoder")
    if _exists(sub):
        sd = convert.load_torch_state_dict(sub)
        params = _cast(convert.convert_clip_text_state_dict(sd, tcfg), param_dtype)
    else:
        logger.warning("text encoder checkpoint %s missing — random init", sub)
        params = _jit_init(lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))["params"])
        if param_dtype is not None:
            params = _cast(params, param_dtype)
    return model, params


def build_mpnet(root: Optional[str], tiny: bool = False, dtype=jnp.float32):
    mcfg = MPNetConfig.tiny() if tiny else MPNetConfig.base()
    model = MPNetEncoder(mcfg, dtype=dtype)
    if _exists(root):
        sd = convert.load_torch_state_dict(root)
        params = jax.tree.map(jnp.asarray, convert.convert_mpnet_state_dict(sd, mcfg))
    else:
        logger.warning("MPNet checkpoint %s missing — random init", root)
        params = _jit_init(lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
            jnp.ones((1, 8), jnp.int32))["params"])
    return model, params


def build_hypernet(spec, cfg, input_dim: int = 768):
    h = cfg.model.hypernet
    model = HyperStructure(
        spec, input_dim=input_dim,
        weight_norm=h.get("weight_norm", False),
        linear_bias=h.get("linear_bias", True),
        single_arch_param=h.get("single_arch_param", False))
    params = _jit_init(lambda: model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, input_dim)))["params"])
    return model, params


def build_quantizer(spec, cfg):
    q = cfg.model.quantizer
    model = StructureQuantizer(
        spec,
        n_e=q.get("num_arch_vq_codebook_embeddings", 8),
        temperature=q.get("quantizer_T", 0.4),
        base=q.get("quantizer_base", 3),
        depth_order=tuple(q.get("depth_order")) if q.get("depth_order") else None,
        non_zero_width=q.get("non_zero_width", True),
        resource_aware_normalization=q.get("resource_aware_normalization", False),
        optimal_transport=q.get("optimal_transport", True))
    params = model.init_params(jax.random.PRNGKey(2))
    return model, params


def build_schedule(cfg) -> DiffusionSchedule:
    return DiffusionSchedule(
        prediction_type=cfg.model.unet.get("prediction_type", "v_prediction"))
