"""AutoencoderKL (the SD VAE) in flax, NHWC.

The reference uses the frozen diffusers `AutoencoderKL`
(trainer.py:713-716) for latent encode (training) and decode (generation).
This is a from-scratch flax implementation of the same architecture
(SD-2.1: 128/256/512/512 channels, 2 resnets per encoder block, 3 per
decoder block, single mid attention at 512, latent dim 4, scale 0.18215).

The VAE is always frozen here, so there is no dropout/training logic; encode
returns the latent distribution moments so the trainer can sample with its
own PRNG key inside the jitted step.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffusion_pruning_tpu.models.unet.blocks import subpixel_upsample_conv


class _UpsampleConvParams(nn.Module):
    """Param-only holder matching nn.Conv's kernel/bias tree (same
    checkpoint layout as the plain 3×3 upsample conv it replaces)."""
    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215

    @property
    def spatial_scale(self) -> int:
        """pixels per latent cell: 2^(levels-1) (8 for the SD VAE)."""
        return 2 ** (len(self.block_out_channels) - 1)

    @classmethod
    def sd(cls) -> "VAEConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "VAEConfig":
        return cls(block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=4)


class _Resnet(nn.Module):
    out_channels: int
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        h = nn.silu(nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype, name="norm1")(x))
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = nn.silu(nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype, name="norm2")(h))
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if cin != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class _MidAttention(nn.Module):
    channels: int
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype, name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        # rank-2 view: the (B, HW, C) single-head shapes here are in the
        # class XLA:TPU lowers as batch-windowed convs (B× the MACs) — see
        # models/unet/attention.py dense_2d
        from diffusion_pruning_tpu.models.unet.attention import dense_2d
        q = dense_2d(nn.Dense(c, dtype=self.dtype, name="to_q"), y)
        k = dense_2d(nn.Dense(c, dtype=self.dtype, name="to_k"), y)
        v = dense_2d(nn.Dense(c, dtype=self.dtype, name="to_v"), y)
        o = jax.nn.dot_product_attention(q[:, :, None, :], k[:, :, None, :], v[:, :, None, :])
        o = dense_2d(nn.Dense(c, dtype=self.dtype, name="to_out_0"),
                     o.reshape(b, h * w, c))
        return x + o.reshape(b, h, w, c)


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        g = cfg.norm_num_groups
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = _Resnet(ch, g, self.dtype, name=f"down_{i}_resnet_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                # diffusers encoder downsample: pad right/bottom, VALID stride-2
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=2, padding="VALID", dtype=self.dtype,
                            name=f"down_{i}_downsample")(h)
        ch = cfg.block_out_channels[-1]
        h = _Resnet(ch, g, self.dtype, name="mid_resnet_0")(h)
        h = _MidAttention(ch, g, self.dtype, name="mid_attn")(h)
        h = _Resnet(ch, g, self.dtype, name="mid_resnet_1")(h)
        h = nn.silu(nn.GroupNorm(g, epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(h))
        h = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(h)
        h = nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=self.dtype, name="quant_conv")(h)
        mean, logvar = jnp.split(h, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        g = cfg.norm_num_groups
        h = nn.Conv(cfg.latent_channels, (1, 1), dtype=self.dtype, name="post_quant_conv")(z)
        ch = cfg.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(h)
        h = _Resnet(ch, g, self.dtype, name="mid_resnet_0")(h)
        h = _MidAttention(ch, g, self.dtype, name="mid_attn")(h)
        h = _Resnet(ch, g, self.dtype, name="mid_resnet_1")(h)
        rev = list(reversed(cfg.block_out_channels))
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                h = _Resnet(ch, g, self.dtype, name=f"up_{i}_resnet_{j}")(h)
            if i < len(rev) - 1:
                # nearest-2x + conv3x3 as subpixel parity convs (exact, 16/36
                # FLOPs, no 4x materialised tensor — unet/blocks.py); the
                # decoder's upsample convs run at full image resolution, so
                # this is the decode path's dominant cost
                kernel, bias = _UpsampleConvParams(ch, name=f"up_{i}_upsample")(h.shape[-1])
                h = subpixel_upsample_conv(h, kernel.astype(self.dtype),
                                           bias.astype(self.dtype))
        h = nn.silu(nn.GroupNorm(g, epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(h))
        return nn.Conv(cfg.in_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, self.dtype)
        self.decoder = Decoder(self.cfg, self.dtype)

    def __call__(self, x, key):
        mean, logvar = self.encoder(x)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape, mean.dtype)
        return self.decoder(z), mean, logvar

    def encode(self, x, key=None):
        """Sampled latents scaled by scaling_factor (trainer.py:1097-1098).
        key=None returns the mode (deterministic eval)."""
        mean, logvar = self.encoder(x)
        if key is not None:
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape, mean.dtype)
        return mean * self.cfg.scaling_factor

    def encode_moments(self, x):
        """UNSCALED latent distribution moments — the latent-cache format
        (data/latent_cache.py); the train step applies scaling_factor."""
        return self.encoder(x)

    def decode(self, z):
        return self.decoder(z / self.cfg.scaling_factor)
