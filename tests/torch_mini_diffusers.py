"""Minimal torch re-implementation of the diffusers modules the reference
uses (`UNet2DConditionModel` topology + `AutoencoderKL`), with state-dict
names byte-identical to diffusers', for golden parity tests.

diffusers is not installed in this image, so this hand port is the torch
ground truth the flax models and models/convert.py are checked against
(VERDICT round 1, next #2: "hand-porting a minimal torch block if diffusers
stays unavailable"). Semantics follow the diffusers 0.23 implementations the
reference builds on:
  * ResnetBlock2D: GN→SiLU→conv1 (+SiLU(temb) proj) →GN→SiLU→conv2, +shortcut
  * Transformer2DModel (use_linear_projection): GN(eps 1e-6)→linear proj_in→
    BasicTransformerBlock (preLN self-attn / cross-attn / GEGLU FF)→proj_out→+res
  * Timesteps: sin/cos, flip_sin_to_cos, freq_shift
  * VAE Down/Upsample2D: asymmetric (0,1,0,1) pad stride-2 conv / nearest-2x+conv
"""
import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(t, dim, flip_sin_to_cos=True, freq_shift=0.0):
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - freq_shift)
    emb = t.float()[:, None] * exponent.exp()[None, :]
    sin, cos = emb.sin(), emb.cos()
    return torch.cat([cos, sin] if flip_sin_to_cos else [sin, cos], dim=-1)


class MiniResnet(nn.Module):
    def __init__(self, cin, cout, temb_dim, groups, eps=1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_dim, cout)
        self.norm2 = nn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        sc = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return sc + h


class MiniAttention(nn.Module):
    def __init__(self, dim, heads, ctx_dim=None):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(ctx_dim or dim, dim, bias=False)
        self.to_v = nn.Linear(ctx_dim or dim, dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])

    def forward(self, x, ctx=None):
        c = x if ctx is None else ctx
        b, s, d = x.shape
        hd = d // self.heads
        q = self.to_q(x).view(b, s, self.heads, hd).transpose(1, 2)
        k = self.to_k(c).view(b, c.shape[1], self.heads, hd).transpose(1, 2)
        v = self.to_v(c).view(b, c.shape[1], self.heads, hd).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        return self.to_out[0](o.transpose(1, 2).reshape(b, s, d))


class MiniGEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, g = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(g)


class MiniFeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        self.net = nn.ModuleList([MiniGEGLU(dim, inner), nn.Identity(),
                                  nn.Linear(inner, dim)])

    def forward(self, x):
        return self.net[2](self.net[1](self.net[0](x)))


class MiniBasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, ctx_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = MiniAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = MiniAttention(dim, heads, ctx_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = MiniFeedForward(dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        x = x + self.ff(self.norm3(x))
        return x


class MiniTransformer2D(nn.Module):
    """use_linear_projection=True variant (SD-2.1)."""

    def __init__(self, dim, heads, ctx_dim, groups):
        super().__init__()
        self.norm = nn.GroupNorm(groups, dim, eps=1e-6)
        self.proj_in = nn.Linear(dim, dim)
        self.transformer_blocks = nn.ModuleList(
            [MiniBasicTransformerBlock(dim, heads, ctx_dim)])
        self.proj_out = nn.Linear(dim, dim)

    def forward(self, x, ctx):
        b, c, hh, ww = x.shape
        res = x
        y = self.norm(x).permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        y = self.proj_in(y)
        for blk in self.transformer_blocks:
            y = blk(y, ctx)
        y = self.proj_out(y).reshape(b, hh, ww, c).permute(0, 3, 1, 2)
        return y + res


class _NS(nn.Module):
    """Bare namespace module, for diffusers-style nesting."""


class MiniUNet(nn.Module):
    """diffusers UNet2DConditionModel for the config subset our GatedUNet
    supports (HalfGated types with all-ones gates ≡ the plain SD U-Net)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        b0 = cfg.block_out_channels[0]
        temb = cfg.time_embed_dim
        g = cfg.norm_num_groups
        self.conv_in = nn.Conv2d(cfg.in_channels, b0, 3, padding=1)
        self.time_embedding = _NS()
        self.time_embedding.linear_1 = nn.Linear(b0, temb)
        self.time_embedding.linear_2 = nn.Linear(temb, temb)

        L = cfg.num_levels
        ch = b0
        stack = [b0]
        self.down_blocks = nn.ModuleList()
        for i, bt in enumerate(cfg.down_block_types):
            out = cfg.block_out_channels[i]
            cross = bt.startswith("CrossAttn")
            blk = _NS()
            blk.resnets = nn.ModuleList()
            if cross:
                blk.attentions = nn.ModuleList()
            for _ in range(cfg.layers_per_block):
                blk.resnets.append(MiniResnet(ch, out, temb, g, cfg.norm_eps))
                ch = out
                if cross:
                    blk.attentions.append(MiniTransformer2D(
                        out, cfg.heads_at(i), cfg.cross_attention_dim, g))
                stack.append(ch)
            if i < L - 1:
                ds = _NS()
                ds.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=1)
                blk.downsamplers = nn.ModuleList([ds])
                stack.append(ch)
            self.down_blocks.append(blk)

        mid = cfg.block_out_channels[-1]
        self.mid_block = _NS()
        self.mid_block.resnets = nn.ModuleList([
            MiniResnet(mid, mid, temb, g, cfg.norm_eps),
            MiniResnet(mid, mid, temb, g, cfg.norm_eps)])
        self.mid_block.attentions = nn.ModuleList([
            MiniTransformer2D(mid, cfg.heads_at(L - 1), cfg.cross_attention_dim, g)])

        rev = list(reversed(cfg.block_out_channels))
        self.up_blocks = nn.ModuleList()
        for i, bt in enumerate(cfg.up_block_types):
            out = rev[i]
            level = L - 1 - i
            cross = bt.startswith("CrossAttn")
            blk = _NS()
            blk.resnets = nn.ModuleList()
            if cross:
                blk.attentions = nn.ModuleList()
            for _ in range(cfg.layers_per_block + 1):
                skip = stack.pop()
                blk.resnets.append(MiniResnet(ch + skip, out, temb, g, cfg.norm_eps))
                ch = out
                if cross:
                    blk.attentions.append(MiniTransformer2D(
                        out, cfg.heads_at(level), cfg.cross_attention_dim, g))
            if i < L - 1:
                us = _NS()
                us.conv = nn.Conv2d(ch, ch, 3, padding=1)
                blk.upsamplers = nn.ModuleList([us])
            self.up_blocks.append(blk)

        self.conv_norm_out = nn.GroupNorm(g, ch, eps=cfg.norm_eps)
        self.conv_out = nn.Conv2d(ch, cfg.out_channels, 3, padding=1)

    def forward(self, sample, timesteps, ehs):
        cfg = self.cfg
        t = timestep_embedding(timesteps, cfg.block_out_channels[0],
                               cfg.flip_sin_to_cos, cfg.freq_shift)
        temb = self.time_embedding.linear_2(F.silu(self.time_embedding.linear_1(t)))
        h = self.conv_in(sample)
        stack = [h]
        for i, blk in enumerate(self.down_blocks):
            cross = hasattr(blk, "attentions")
            for j, r in enumerate(blk.resnets):
                h = r(h, temb)
                if cross:
                    h = blk.attentions[j](h, ehs)
                stack.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0].conv(h)
                stack.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, ehs)
        h = self.mid_block.resnets[1](h, temb)
        for i, blk in enumerate(self.up_blocks):
            cross = hasattr(blk, "attentions")
            for j, r in enumerate(blk.resnets):
                skip = stack.pop()
                h = r(torch.cat([h, skip], dim=1), temb)
                if cross:
                    h = blk.attentions[j](h, ehs)
            if hasattr(blk, "upsamplers"):
                h = F.interpolate(h, scale_factor=2.0, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


# ------------------------------------------------------------------ VAE

class MiniVAEResnet(nn.Module):
    def __init__(self, cin, cout, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        sc = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return sc + h


class MiniVAEAttention(nn.Module):
    """Single-head VAE mid attention (diffusers Attention, heads=1)."""

    def __init__(self, ch, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        b, c, hh, ww = x.shape
        y = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        o = F.scaled_dot_product_attention(q[:, None], k[:, None], v[:, None])[:, 0]
        o = self.to_out[0](o).reshape(b, hh, ww, c).permute(0, 3, 1, 2)
        return x + o


class MiniVAE(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        g = cfg.norm_num_groups
        chs = cfg.block_out_channels
        n = len(chs)

        enc = _NS()
        enc.conv_in = nn.Conv2d(cfg.in_channels, chs[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        ch = chs[0]
        for i, out in enumerate(chs):
            blk = _NS()
            blk.resnets = nn.ModuleList()
            for _ in range(cfg.layers_per_block):
                blk.resnets.append(MiniVAEResnet(ch, out, g))
                ch = out
            if i < n - 1:
                ds = _NS()
                # diffusers VAE Downsample2D: padding=0 + asymmetric (0,1,0,1) pad
                ds.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0)
                blk.downsamplers = nn.ModuleList([ds])
            enc.down_blocks.append(blk)
        enc.mid_block = _NS()
        enc.mid_block.resnets = nn.ModuleList([MiniVAEResnet(ch, ch, g),
                                               MiniVAEResnet(ch, ch, g)])
        enc.mid_block.attentions = nn.ModuleList([MiniVAEAttention(ch, g)])
        enc.conv_norm_out = nn.GroupNorm(g, ch, eps=1e-6)
        enc.conv_out = nn.Conv2d(ch, 2 * cfg.latent_channels, 3, padding=1)
        self.encoder = enc
        self.quant_conv = nn.Conv2d(2 * cfg.latent_channels, 2 * cfg.latent_channels, 1)

        dec = _NS()
        self.post_quant_conv = nn.Conv2d(cfg.latent_channels, cfg.latent_channels, 1)
        dec.conv_in = nn.Conv2d(cfg.latent_channels, chs[-1], 3, padding=1)
        dec.mid_block = _NS()
        dec.mid_block.resnets = nn.ModuleList([MiniVAEResnet(chs[-1], chs[-1], g),
                                               MiniVAEResnet(chs[-1], chs[-1], g)])
        dec.mid_block.attentions = nn.ModuleList([MiniVAEAttention(chs[-1], g)])
        dec.up_blocks = nn.ModuleList()
        ch = chs[-1]
        for i, out in enumerate(reversed(chs)):
            blk = _NS()
            blk.resnets = nn.ModuleList()
            for _ in range(cfg.layers_per_block + 1):
                blk.resnets.append(MiniVAEResnet(ch, out, g))
                ch = out
            if i < n - 1:
                us = _NS()
                us.conv = nn.Conv2d(ch, ch, 3, padding=1)
                blk.upsamplers = nn.ModuleList([us])
            dec.up_blocks.append(blk)
        dec.conv_norm_out = nn.GroupNorm(g, ch, eps=1e-6)
        dec.conv_out = nn.Conv2d(ch, cfg.in_channels, 3, padding=1)
        self.decoder = dec

    def encode_moments(self, x):
        e = self.encoder
        h = e.conv_in(x)
        for blk in e.down_blocks:
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "downsamplers"):
                h = F.pad(h, (0, 1, 0, 1))
                h = blk.downsamplers[0].conv(h)
        h = e.mid_block.resnets[0](h)
        h = e.mid_block.attentions[0](h)
        h = e.mid_block.resnets[1](h)
        h = e.conv_out(F.silu(e.conv_norm_out(h)))
        h = self.quant_conv(h)
        mean, logvar = h.chunk(2, dim=1)
        return mean, logvar.clamp(-30.0, 20.0)

    def decode(self, z):
        d = self.decoder
        h = d.conv_in(self.post_quant_conv(z))
        h = d.mid_block.resnets[0](h)
        h = d.mid_block.attentions[0](h)
        h = d.mid_block.resnets[1](h)
        for blk in d.up_blocks:
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "upsamplers"):
                h = F.interpolate(h, scale_factor=2.0, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        return d.conv_out(F.silu(d.conv_norm_out(h)))
