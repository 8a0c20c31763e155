"""The gated conditional U-Net (flax, NHWC, jit-first).

Functional re-implementation of the reference's `UNet2DConditionModelGated`
(/root/reference/pdm/models/unet/unet_2d_conditional.py:628-2181). The whole
per-prompt architecture is a single flat `(B, vq_dim)` array `arch`
(widths then depths, in the `StructureSpec` order); `set_structure` is just
passing a different array — no module mutation, no retraces (shapes are
static). `arch=None` runs the dense model (identical to all-ones gates,
used for the distillation teacher — trainer.py:1185-1190 — without the
pointless multiplies).

The forward optionally returns per-block activations (`return_features=True`)
replacing the reference's forward hooks for the block-distillation loss
(trainer.py:496-511): down-block outputs, mid output and up-block outputs,
keyed 'd{i}', 'm', 'u{i}' exactly like the reference's hook names.
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffusion_pruning_tpu.core.structure import StructureSpec, SubBlock, build_structure
from diffusion_pruning_tpu.models.unet.blocks import (
    Downsample,
    GatedResnetBlock,
    GatedTransformer2D,
    Upsample,
    conv3x3,
)
from diffusion_pruning_tpu.models.unet.config import UNetConfig
from diffusion_pruning_tpu.ops.gates import match_batch


def timestep_embedding(timesteps: jax.Array, dim: int, flip_sin_to_cos: bool = True,
                       freq_shift: float = 0.0, max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal timestep features (diffusers `Timesteps` semantics)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    return jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)


class _GateReader:
    """Slices width/depth gates for a subblock out of the flat arch array."""

    def __init__(self, spec: StructureSpec, arch: Optional[jax.Array]):
        self.subs = {sb.name: sb for sb in spec.subblocks}
        self.num_width = spec.num_width
        self.arch = arch

    def resnet(self, name: str):
        """(width_gate, depth_gate) for a resnet subblock (or None, None)."""
        sb = self.subs.get(name)
        if sb is None or self.arch is None:
            return None, None
        site = sb.sites[0]
        w = self.arch[:, site.start: site.start + site.width]
        d = self._depth(sb)
        return w, d

    def transformer(self, name: str):
        """((attn1, attn2, ff),) per layer gates + depth gate."""
        sb = self.subs.get(name)
        if sb is None or self.arch is None:
            return None, None
        gs = []
        for site in sb.sites:
            gs.append(self.arch[:, site.start: site.start + site.width])
        if len(gs) == 2:
            gs.append(None)  # ungated ff
        return (tuple(gs),), self._depth(sb)

    def _depth(self, sb: SubBlock):
        if sb.depth_index < 0:
            return None
        return self.arch[:, self.num_width + sb.depth_index]


class GatedUNet(nn.Module):
    """The gated U-Net. With `plan` set (a static ExpertPlan) the same
    forward builds the *physically pruned* expert: kept-only channel shapes,
    dropped subblocks elided entirely — no masking, real FLOP savings."""
    cfg: UNetConfig
    plan: Optional["ExpertPlan"] = None  # noqa: F821 (models.unet.pruned)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @property
    def spec(self) -> StructureSpec:
        return build_structure(self.cfg)

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,               # (B, H, W, C_in) NHWC latents
        timesteps: jax.Array,            # (B,)
        encoder_hidden_states: jax.Array,  # (B, 77, cross_dim)
        arch: Optional[jax.Array] = None,  # (B or B/cfg-scale, vq_dim)
        return_features: bool = False,
    ):
        cfg = self.cfg
        spec = self.spec
        if arch is not None:
            if arch.shape[-1] != spec.vq_dim:
                raise ValueError(
                    f"arch vector has {arch.shape[-1]} logits, structure expects "
                    f"{spec.vq_dim} ({spec.num_width} width + {spec.num_depth} depth)")
            arch = match_batch(arch, sample.shape[0])
        gates = _GateReader(spec, arch)
        features: Dict[str, jax.Array] = {}
        plan = self.plan.by_name if self.plan is not None else {}

        _resnet_cls = (nn.remat(GatedResnetBlock, static_argnums=())
                       if cfg.remat else GatedResnetBlock)
        _transformer_cls = (nn.remat(GatedTransformer2D, static_argnums=())
                            if cfg.remat else GatedTransformer2D)

        def resnet(cout, name, sb_name):
            p = plan.get(sb_name)
            hidden = hgroups = None
            if p is not None:
                keep = p.sites[0]
                unit = keep.channels // keep.width
                hidden, hgroups = len(keep.kept) * unit, len(keep.kept)
            return _resnet_cls(cout, cfg.norm_num_groups, cfg.norm_eps,
                               hidden, hgroups, cfg.fused_norms,
                               cfg.fused_norm_conv,
                               self.dtype, self.param_dtype, name=name)

        def transformer(c, heads, name, sb_name):
            p = plan.get(sb_name)
            h1 = h2 = ffi = None
            if p is not None:
                h1 = len(p.site("attn1").kept)
                h2 = len(p.site("attn2").kept)
                ff = p.site("ff")
                if ff is not None:
                    ffi = len(ff.kept) * (ff.channels // ff.width)
            return _transformer_cls(c, heads, cfg.cross_attention_dim, 1,
                                    cfg.norm_num_groups, cfg.use_linear_projection,
                                    h1, h2, ffi, cfg.use_flash_attention,
                                    cfg.fused_norms, cfg.fused_norm_conv,
                                    self.dtype, self.param_dtype,
                                    name=name)

        def is_dropped(sb_name):
            p = plan.get(sb_name)
            return p is not None and p.dropped

        # --- time embedding ---
        t_emb = timestep_embedding(timesteps, cfg.block_out_channels[0],
                                   cfg.flip_sin_to_cos, cfg.freq_shift)
        t_emb = t_emb.astype(self.dtype)
        temb = nn.Dense(cfg.time_embed_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="time_embedding_linear_1")(t_emb)
        temb = nn.Dense(cfg.time_embed_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="time_embedding_linear_2")(nn.silu(temb))

        encoder_hidden_states = encoder_hidden_states.astype(self.dtype)
        sample = sample.astype(self.dtype)

        # --- down path ---
        h = conv3x3(cfg.block_out_channels[0], "conv_in", self.dtype, self.param_dtype)(sample)
        res_stack = [h]
        L = cfg.num_levels
        out_ch = cfg.block_out_channels[0]
        for i, block_type in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[i]
            cross = block_type.startswith("CrossAttn")
            for j in range(cfg.layers_per_block):
                rname = f"down.{i}.resnet.{j}"
                if not is_dropped(rname):
                    wg, dg = gates.resnet(rname)
                    h = resnet(out_ch, f"down_blocks_{i}_resnets_{j}", rname)(h, temb, wg, dg)
                if cross:
                    tname = f"down.{i}.attn.{j}"
                    if not is_dropped(tname):
                        tg, tdg = gates.transformer(tname)
                        h = transformer(out_ch, cfg.heads_at(i),
                                        f"down_blocks_{i}_attentions_{j}", tname)(
                            h, encoder_hidden_states, tg, tdg)
                res_stack.append(h)
            if i < L - 1:
                h = Downsample(out_ch, self.dtype, self.param_dtype,
                               name=f"down_blocks_{i}_downsamplers_0")(h)
                res_stack.append(h)
            features[f"d{i}"] = h

        # --- mid ---
        mid_ch = cfg.block_out_channels[-1]
        wg, _ = gates.resnet("mid.resnet.0")
        h = resnet(mid_ch, "mid_block_resnets_0", "mid.resnet.0")(h, temb, wg)
        tg, _ = gates.transformer("mid.attn.0")
        h = transformer(mid_ch, cfg.heads_at(L - 1), "mid_block_attentions_0",
                        "mid.attn.0")(h, encoder_hidden_states, tg, None)
        wg, _ = gates.resnet("mid.resnet.1")
        h = resnet(mid_ch, "mid_block_resnets_1", "mid.resnet.1")(h, temb, wg)
        features["m"] = h

        # --- up path ---
        rev = list(reversed(cfg.block_out_channels))
        for i, block_type in enumerate(cfg.up_block_types):
            out_ch = rev[i]
            level = L - 1 - i
            cross = block_type.startswith("CrossAttn")
            for j in range(cfg.layers_per_block + 1):
                skip = res_stack.pop()
                rname = f"up.{i}.resnet.{j}"
                if not is_dropped(rname):
                    identity = h
                    h = jnp.concatenate([h, skip], axis=-1)
                    wg, dg = gates.resnet(rname)
                    h = resnet(out_ch, f"up_blocks_{i}_resnets_{j}", rname)(
                        h, temb, wg, dg, identity)
                if cross:
                    tname = f"up.{i}.attn.{j}"
                    if not is_dropped(tname):
                        tg, tdg = gates.transformer(tname)
                        h = transformer(out_ch, cfg.heads_at(level),
                                        f"up_blocks_{i}_attentions_{j}", tname)(
                            h, encoder_hidden_states, tg, tdg)
            if i < L - 1:
                h = Upsample(out_ch, self.dtype, self.param_dtype,
                             name=f"up_blocks_{i}_upsamplers_0")(h)
            features[f"u{i}"] = h

        # --- out ---
        if cfg.fused_norm_conv:
            from diffusion_pruning_tpu.models.unet.blocks import (
                _ConvParams, _GNParams)
            from diffusion_pruning_tpu.ops.norm_conv import group_norm_silu_conv3x3
            s_, b_ = _GNParams(self.param_dtype, name="conv_norm_out")(h.shape[-1])
            k_, cb_ = _ConvParams(cfg.out_channels, self.param_dtype,
                                  name="conv_out")(h.shape[-1])
            out = group_norm_silu_conv3x3(
                h.astype(self.dtype), s_, b_, k_.astype(self.dtype), cb_, None,
                cfg.norm_num_groups, cfg.norm_eps, True,
                jax.default_backend() != "tpu")
        else:
            h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=cfg.norm_eps,
                             dtype=self.dtype, param_dtype=self.param_dtype,
                             name="conv_norm_out")(h)
            h = nn.silu(h)
            out = conv3x3(cfg.out_channels, "conv_out", self.dtype, self.param_dtype)(h)
        if return_features:
            return out, features
        return out

    def init_params(self, rng: jax.Array, batch: int = 1):
        cfg = self.cfg
        s = cfg.sample_size
        sample = jnp.zeros((batch, s, s, cfg.in_channels), self.dtype)
        t = jnp.zeros((batch,), jnp.int32)
        ehs = jnp.zeros((batch, cfg.max_text_len, cfg.cross_attention_dim), self.dtype)
        return self.init(rng, sample, t, ehs)["params"]
