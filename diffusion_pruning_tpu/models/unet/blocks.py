"""Gated U-Net building blocks (flax, NHWC).

Functional re-implementations of the reference's gated diffusers subclasses
(/root/reference/pdm/models/unet/blocks.py): `ResnetBlock2DWidthGated` /
`...WidthDepthGated` (:283-697) and `Transformer2DModelWidthGated` /
`...WidthDepthGated` (:941-1438). Instead of mutating per-module gate state,
each block takes its gate slices as call arguments; the depth gate takes the
identity tensor explicitly (recovering the reference's concat-splitting rule
for up-blocks, blocks.py:482-498, without any shape bookkeeping).

Gate placement is bit-identical in semantics to the reference:
  * resnet width gate: after conv1 + time-emb add, before norm2 — the gate
    groups align with norm2's GroupNorm groups (blocks.py:345-353);
  * transformer: per-head gates on attn1/attn2 q,k,v and the grouped GEGLU
    gate (attention.py);
  * depth gate: out = (1-m)·identity + m·block_out (gates.py:36-42).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

import jax

from diffusion_pruning_tpu.models.unet.attention import (
    GatedTransformerBlock, dense_2d,
)
from diffusion_pruning_tpu.ops.gates import channel_gate, depth_lerp


class FusedGroupNormSiLU(nn.Module):
    """GroupNorm(+SiLU) via the one-pass Pallas kernel (ops/group_norm.py).
    Same parameter tree as nn.GroupNorm (scale/bias), so checkpoints are
    interchangeable with the unfused path."""
    groups: int
    eps: float = 1e-5
    silu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from diffusion_pruning_tpu.ops.group_norm import group_norm_silu
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return group_norm_silu(x.astype(self.dtype), scale, bias, self.groups,
                               self.eps, self.silu,
                               jax.default_backend() != "tpu")


def conv3x3(features, name, dtype, param_dtype, stride=1):
    return nn.Conv(features, (3, 3), strides=(stride, stride), padding=1,
                   dtype=dtype, param_dtype=param_dtype, name=name)


def conv1x1(features, name, dtype, param_dtype):
    return nn.Conv(features, (1, 1), dtype=dtype, param_dtype=param_dtype, name=name)


class GatedResnetBlock(nn.Module):
    """SD resnet block with an optional grouped width gate and depth gate.

    `hidden_channels`/`hidden_groups` support physically pruned experts:
    conv1 / time_emb_proj / norm2 emit only the kept groups (conv2 maps back
    to out_channels), reproducing the reference's `prune()` slicing
    (blocks.py:424-465) as static shapes."""
    out_channels: int
    groups: int = 32
    eps: float = 1e-5
    hidden_channels: Optional[int] = None
    hidden_groups: Optional[int] = None
    fused_norms: bool = False
    fused_norm_conv: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def _norm_silu(self, name, groups):
        if self.fused_norms:
            return FusedGroupNormSiLU(groups, self.eps, True, self.dtype, name=name)
        gn = nn.GroupNorm(num_groups=groups, epsilon=self.eps, dtype=self.dtype,
                          param_dtype=self.param_dtype, name=name)
        return lambda x: nn.silu(gn(x))

    def _fused_norm_conv(self, x, norm_name, conv_name, groups, cout, gate):
        """norm→SiLU→conv3x3 in one input pass (ops/norm_conv.py); the
        channel gate (if any) folds into the normalisation affine. The
        parameter tree matches the unfused nn.GroupNorm + nn.Conv exactly."""
        from diffusion_pruning_tpu.ops.norm_conv import group_norm_silu_conv3x3
        from diffusion_pruning_tpu.ops.gates import channel_mask
        cin = x.shape[-1]
        s, b = _GNParams(self.param_dtype, name=norm_name)(cin)
        k, cb = _ConvParams(cout, self.param_dtype, name=conv_name)(cin)
        gate_c = None if gate is None else channel_mask(gate, cin, x.shape[0])
        return group_norm_silu_conv3x3(
            x.astype(self.dtype), s, b, k.astype(self.dtype), cb, gate_c,
            groups, self.eps, True, jax.default_backend() != "tpu")

    @nn.compact
    def __call__(self, x, temb, gate=None, depth_gate=None, identity=None):
        """identity: tensor returned when the depth gate is closed. For
        up-blocks x is a concat [hidden, skip] and identity is the hidden
        part; defaults to x itself (down/mid blocks)."""
        cin = x.shape[-1]
        hidden = self.hidden_channels or self.out_channels
        hgroups = self.hidden_groups or self.groups
        if self.fused_norm_conv:
            h = self._fused_norm_conv(x, "norm1", "conv1", self.groups,
                                      hidden, None)
        else:
            h = self._norm_silu("norm1", self.groups)(x)
            h = conv3x3(hidden, "conv1", self.dtype, self.param_dtype)(h)
        t = nn.Dense(hidden, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        if self.fused_norm_conv:
            h = self._fused_norm_conv(h, "norm2", "conv2", hgroups,
                                      self.out_channels, gate)
        else:
            if gate is not None:
                h = channel_gate(h, gate)
            h = self._norm_silu("norm2", hgroups)(h)
            h = conv3x3(self.out_channels, "conv2", self.dtype, self.param_dtype)(h)
        shortcut = x
        if cin != self.out_channels:
            shortcut = conv1x1(self.out_channels, "conv_shortcut",
                               self.dtype, self.param_dtype)(x)
        out = shortcut + h
        if depth_gate is not None:
            out = depth_lerp(depth_gate, x if identity is None else identity, out)
        return out


class GatedTransformer2D(nn.Module):
    """Spatial transformer: GroupNorm → proj_in → transformer block(s) →
    proj_out → +residual, with optional width gates and a depth gate whose
    identity path is the block input. `active_*` build the physically
    pruned expert shapes."""
    channels: int
    heads: int
    context_dim: int
    num_layers: int = 1
    groups: int = 32
    use_linear_projection: bool = True
    active_heads1: Optional[int] = None
    active_heads2: Optional[int] = None
    active_ff_inner: Optional[int] = None
    use_flash: bool = False
    fused_norms: bool = False
    fused_norm_conv: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, gates: Optional[Tuple] = None, depth_gate=None):
        """gates: per transformer layer a tuple (attn1, attn2, ff) of gate
        slices (each possibly None)."""
        b, h, w, c = x.shape
        residual = x
        if self.fused_norm_conv and self.use_linear_projection:
            # norm (no SiLU) folded into proj_in's input read
            from diffusion_pruning_tpu.ops.norm_conv import group_norm_linear
            s_, b_ = _GNParams(self.param_dtype, name="norm")(c)
            k_, lb_ = _DenseParams(self.channels, self.param_dtype,
                                   name="proj_in")(c)
            y = group_norm_linear(
                x.reshape(b, h * w, c).astype(self.dtype), s_, b_,
                k_.astype(self.dtype), lb_, None, self.groups, 1e-6,
                jax.default_backend() != "tpu")
        else:
            if self.fused_norms:
                y = FusedGroupNormSiLU(self.groups, 1e-6, False, self.dtype,
                                       name="norm")(x)
            else:
                y = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype,
                                 param_dtype=self.param_dtype, name="norm")(x)
            y = y.reshape(b, h * w, c)
            if self.use_linear_projection:
                y = dense_2d(nn.Dense(self.channels, dtype=self.dtype,
                                      param_dtype=self.param_dtype,
                                      name="proj_in"), y)
            else:
                y = conv1x1(self.channels, "proj_in", self.dtype, self.param_dtype)(
                    y.reshape(b, h, w, c)).reshape(b, h * w, self.channels)
        for i in range(self.num_layers):
            g1, g2, gf = gates[i] if gates is not None else (None, None, None)
            y = GatedTransformerBlock(self.channels, self.heads, self.context_dim,
                                      self.active_heads1, self.active_heads2,
                                      self.active_ff_inner, self.use_flash,
                                      self.dtype, self.param_dtype,
                                      name=f"transformer_blocks_{i}")(y, context, g1, g2, gf)
        if self.use_linear_projection:
            y = dense_2d(nn.Dense(c, dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  name="proj_out"), y)
            y = y.reshape(b, h, w, c)
        else:
            y = conv1x1(c, "proj_out", self.dtype, self.param_dtype)(y.reshape(b, h, w, -1))
        out = y + residual
        if depth_gate is not None:
            out = depth_lerp(depth_gate, residual, out)
        return out


class Downsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return conv3x3(self.channels, "conv", self.dtype, self.param_dtype, stride=2)(x)


class Upsample(nn.Module):
    """nearest-2× + conv3×3, computed as four 2×2 parity convs at SOURCE
    resolution + pixel shuffle.

    Because nearest upsampling duplicates pixels, each output-parity class
    (di, dj) ∈ {0,1}² sees an effective 2×2 kernel built from row/col sums of
    the 3×3 weights: rows [W₀, W₁+W₂] for parity 0 and [W₀+W₁, W₂] for
    parity 1 (same along columns). Identical math (exact, incl. zero-pad
    borders) at 16/36 of the FLOPs and without materialising the 4× repeated
    tensor — upsampler convs are ~7% of the dense forward (profile,
    PERFORMANCE.md). The parameter tree is the plain 3×3 `conv`, so
    checkpoints are unchanged."""
    channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    subpixel: bool = True

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        if not self.subpixel:
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest 2x
            return conv3x3(self.channels, "conv", self.dtype, self.param_dtype)(x)

        kernel, bias = _ConvParams(self.channels, self.param_dtype,
                                   name="conv")(c)
        return subpixel_upsample_conv(x.astype(self.dtype),
                                      kernel.astype(self.dtype),
                                      bias.astype(self.dtype))


def subpixel_upsample_conv(x: jnp.ndarray, kernel: jnp.ndarray,
                           bias: jnp.ndarray) -> jnp.ndarray:
    """nearest-2×-then-conv3×3, as four 2×2 parity convs + pixel shuffle.

    Exact: parity-0 output rows tap source (i-1, i) with effective rows
    [W₀, W₁+W₂]; parity-1 rows tap (i, i+1) with [W₀+W₁, W₂] — likewise
    along columns. kernel: (3, 3, C_in, C_out) (the plain conv weights)."""
    b, h, w, c = x.shape
    cout = kernel.shape[-1]
    row = (jnp.stack([kernel[0], kernel[1] + kernel[2]], axis=0),
           jnp.stack([kernel[0] + kernel[1], kernel[2]], axis=0))
    pad = ((1, 0), (0, 1))
    dn = jax.lax.conv_dimension_numbers(x.shape, (2, 2, c, cout),
                                        ("NHWC", "HWIO", "NHWC"))
    ys = []
    for di in (0, 1):
        kr = row[di]
        col = (jnp.stack([kr[:, 0], kr[:, 1] + kr[:, 2]], axis=1),
               jnp.stack([kr[:, 0] + kr[:, 1], kr[:, 2]], axis=1))
        for dj in (0, 1):
            ys.append(jax.lax.conv_general_dilated(
                x, col[dj], window_strides=(1, 1),
                padding=(pad[di], pad[dj]), dimension_numbers=dn))
    y00, y01, y10, y11 = ys
    out = jnp.stack([jnp.stack([y00, y01], axis=3),
                     jnp.stack([y10, y11], axis=3)], axis=2)
    return out.reshape(b, 2 * h, 2 * w, cout) + bias


class _DenseParams(nn.Module):
    """Parameter-only holder matching nn.Dense's `kernel`/`bias` tree."""
    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        return kernel, bias


class _GNParams(nn.Module):
    """Parameter-only holder matching nn.GroupNorm's `scale`/`bias` tree, so
    the fused norm→conv path keeps the exact checkpoint layout."""
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, channels: int):
        scale = self.param("scale", nn.initializers.ones, (channels,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (channels,),
                          self.param_dtype)
        return scale, bias


class _ConvParams(nn.Module):
    """Parameter-only holder matching nn.Conv's `kernel`/`bias` tree, so the
    subpixel Upsample keeps the exact checkpoint layout of the 3×3 conv."""
    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, in_features, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        return kernel, bias
