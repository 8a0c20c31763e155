"""Converter tests: diffusers/transformers-named torch state dicts round-trip
into flax pytrees with identical structure, shapes, and values."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_pruning_tpu.models.convert import (
    convert_clip_text_state_dict,
    convert_mpnet_state_dict,
    convert_unet_state_dict,
    convert_vae_state_dict,
)
from diffusion_pruning_tpu.models.text_encoders import (
    CLIPTextConfig, CLIPTextEncoder, MPNetConfig, MPNetEncoder,
)
from diffusion_pruning_tpu.models.unet.config import UNetConfig
from diffusion_pruning_tpu.models.unet.unet import GatedUNet
from diffusion_pruning_tpu.models.vae import AutoencoderKL, VAEConfig


def _tree_shapes(t):
    return {jax.tree_util.keystr(k): v.shape for k, v in jax.tree_util.tree_flatten_with_path(t)[0]}


def _fake_torch_sd(keys_shapes):
    """Build a torch-named state dict of deterministic numpy arrays."""
    rng = np.random.RandomState(0)
    return {k: rng.randn(*s).astype(np.float32) for k, s in keys_shapes.items()}


def _unet_torch_keys(cfg):
    """Enumerate the diffusers UNet state-dict keys for a config."""
    ks = {}
    c0 = cfg.block_out_channels[0]
    temb = cfg.time_embed_dim
    ks["conv_in.weight"] = (c0, cfg.in_channels, 3, 3); ks["conv_in.bias"] = (c0,)
    ks["time_embedding.linear_1.weight"] = (temb, c0); ks["time_embedding.linear_1.bias"] = (temb,)
    ks["time_embedding.linear_2.weight"] = (temb, temb); ks["time_embedding.linear_2.bias"] = (temb,)
    ks["conv_norm_out.weight"] = (c0,); ks["conv_norm_out.bias"] = (c0,)
    ks["conv_out.weight"] = (cfg.out_channels, c0, 3, 3); ks["conv_out.bias"] = (cfg.out_channels,)

    def resnet(p, cin, cout):
        ks[f"{p}.norm1.weight"] = (cin,); ks[f"{p}.norm1.bias"] = (cin,)
        ks[f"{p}.conv1.weight"] = (cout, cin, 3, 3); ks[f"{p}.conv1.bias"] = (cout,)
        ks[f"{p}.time_emb_proj.weight"] = (cout, temb); ks[f"{p}.time_emb_proj.bias"] = (cout,)
        ks[f"{p}.norm2.weight"] = (cout,); ks[f"{p}.norm2.bias"] = (cout,)
        ks[f"{p}.conv2.weight"] = (cout, cout, 3, 3); ks[f"{p}.conv2.bias"] = (cout,)
        if cin != cout:
            ks[f"{p}.conv_shortcut.weight"] = (cout, cin, 1, 1)
            ks[f"{p}.conv_shortcut.bias"] = (cout,)

    def attn(p, c, ctx=None):
        d = ctx or c
        ks[f"{p}.to_q.weight"] = (c, c)
        ks[f"{p}.to_k.weight"] = (c, d); ks[f"{p}.to_v.weight"] = (c, d)
        ks[f"{p}.to_out.0.weight"] = (c, c); ks[f"{p}.to_out.0.bias"] = (c,)

    def transformer(p, c):
        ks[f"{p}.norm.weight"] = (c,); ks[f"{p}.norm.bias"] = (c,)
        ks[f"{p}.proj_in.weight"] = (c, c); ks[f"{p}.proj_in.bias"] = (c,)
        ks[f"{p}.proj_out.weight"] = (c, c); ks[f"{p}.proj_out.bias"] = (c,)
        tb = f"{p}.transformer_blocks.0"
        for n in ("norm1", "norm2", "norm3"):
            ks[f"{tb}.{n}.weight"] = (c,); ks[f"{tb}.{n}.bias"] = (c,)
        attn(f"{tb}.attn1", c)
        attn(f"{tb}.attn2", c, cfg.cross_attention_dim)
        inner = c * cfg.ff_mult
        ks[f"{tb}.ff.net.0.proj.weight"] = (2 * inner, c)
        ks[f"{tb}.ff.net.0.proj.bias"] = (2 * inner,)
        ks[f"{tb}.ff.net.2.weight"] = (c, inner); ks[f"{tb}.ff.net.2.bias"] = (c,)

    L = cfg.num_levels
    out_ch = c0
    for i, bt in enumerate(cfg.down_block_types):
        in_ch, out_ch = out_ch, cfg.block_out_channels[i]
        for j in range(cfg.layers_per_block):
            resnet(f"down_blocks.{i}.resnets.{j}", in_ch if j == 0 else out_ch, out_ch)
            if bt.startswith("CrossAttn"):
                transformer(f"down_blocks.{i}.attentions.{j}", out_ch)
        if i < L - 1:
            ks[f"down_blocks.{i}.downsamplers.0.conv.weight"] = (out_ch, out_ch, 3, 3)
            ks[f"down_blocks.{i}.downsamplers.0.conv.bias"] = (out_ch,)
    mid = cfg.block_out_channels[-1]
    resnet("mid_block.resnets.0", mid, mid)
    resnet("mid_block.resnets.1", mid, mid)
    transformer("mid_block.attentions.0", mid)
    rev = list(reversed(cfg.block_out_channels))
    out_ch = rev[0]
    for i, bt in enumerate(cfg.up_block_types):
        prev, out_ch = out_ch, rev[i]
        in_ch = rev[min(i + 1, L - 1)]
        for j in range(cfg.layers_per_block + 1):
            skip = in_ch if j == cfg.layers_per_block else out_ch
            rin = (prev if j == 0 else out_ch) + skip
            resnet(f"up_blocks.{i}.resnets.{j}", rin, out_ch)
            if bt.startswith("CrossAttn"):
                transformer(f"up_blocks.{i}.attentions.{j}", out_ch)
        if i < L - 1:
            ks[f"up_blocks.{i}.upsamplers.0.conv.weight"] = (out_ch, out_ch, 3, 3)
            ks[f"up_blocks.{i}.upsamplers.0.conv.bias"] = (out_ch,)
    return ks


def test_unet_converter_structure_and_values():
    cfg = UNetConfig.tiny()
    sd = _fake_torch_sd(_unet_torch_keys(cfg))
    params = convert_unet_state_dict(sd, cfg)

    model = GatedUNet(cfg)
    want = _tree_shapes(model.init_params(jax.random.PRNGKey(0)))
    got = _tree_shapes(params)
    assert got == want, (set(got) ^ set(want), {k: (got.get(k), want.get(k))
                                                for k in got if got.get(k) != want.get(k)})
    # spot-check a transposition: conv kernels (O,I,kh,kw) → (kh,kw,I,O)
    np.testing.assert_array_equal(
        params["conv_in"]["kernel"], sd["conv_in.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        params["time_embedding_linear_1"]["kernel"],
        sd["time_embedding.linear_1.weight"].T)

    # converted params drive a real forward
    x = jnp.zeros((1, cfg.sample_size, cfg.sample_size, cfg.in_channels))
    out = model.apply({"params": jax.tree.map(jnp.asarray, params)}, x,
                      jnp.zeros((1,), jnp.int32),
                      jnp.zeros((1, cfg.max_text_len, cfg.cross_attention_dim)))
    assert np.isfinite(np.asarray(out)).all()


def test_clip_converter_structure():
    cfg = CLIPTextConfig.tiny()
    ks = {
        "text_model.embeddings.token_embedding.weight": (cfg.vocab_size, cfg.hidden_size),
        "text_model.embeddings.position_embedding.weight": (cfg.max_positions, cfg.hidden_size),
        "text_model.final_layer_norm.weight": (cfg.hidden_size,),
        "text_model.final_layer_norm.bias": (cfg.hidden_size,),
    }
    for i in range(cfg.num_layers):
        p = f"text_model.encoder.layers.{i}"
        for n, s in [("layer_norm1", (cfg.hidden_size,)), ("layer_norm2", (cfg.hidden_size,))]:
            ks[f"{p}.{n}.weight"] = s; ks[f"{p}.{n}.bias"] = s
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            ks[f"{p}.self_attn.{n}.weight"] = (cfg.hidden_size, cfg.hidden_size)
            ks[f"{p}.self_attn.{n}.bias"] = (cfg.hidden_size,)
        ks[f"{p}.mlp.fc1.weight"] = (cfg.intermediate_size, cfg.hidden_size)
        ks[f"{p}.mlp.fc1.bias"] = (cfg.intermediate_size,)
        ks[f"{p}.mlp.fc2.weight"] = (cfg.hidden_size, cfg.intermediate_size)
        ks[f"{p}.mlp.fc2.bias"] = (cfg.hidden_size,)
    params = convert_clip_text_state_dict(_fake_torch_sd(ks), cfg)
    model = CLIPTextEncoder(cfg)
    want = _tree_shapes(model.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 8), jnp.int32))["params"])
    assert _tree_shapes(params) == want


def test_mpnet_converter_structure():
    cfg = MPNetConfig.tiny()
    H = cfg.hidden_size
    ks = {
        "embeddings.word_embeddings.weight": (cfg.vocab_size, H),
        "embeddings.position_embeddings.weight": (cfg.max_positions, H),
        "embeddings.LayerNorm.weight": (H,), "embeddings.LayerNorm.bias": (H,),
        "encoder.relative_attention_bias.weight":
            (cfg.relative_attention_num_buckets, cfg.num_heads),
    }
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}"
        for n in ("q", "k", "v", "o"):
            ks[f"{p}.attention.attn.{n}.weight"] = (H, H)
            ks[f"{p}.attention.attn.{n}.bias"] = (H,)
        ks[f"{p}.attention.LayerNorm.weight"] = (H,); ks[f"{p}.attention.LayerNorm.bias"] = (H,)
        ks[f"{p}.intermediate.dense.weight"] = (cfg.intermediate_size, H)
        ks[f"{p}.intermediate.dense.bias"] = (cfg.intermediate_size,)
        ks[f"{p}.output.dense.weight"] = (H, cfg.intermediate_size)
        ks[f"{p}.output.dense.bias"] = (H,)
        ks[f"{p}.output.LayerNorm.weight"] = (H,); ks[f"{p}.output.LayerNorm.bias"] = (H,)
    params = convert_mpnet_state_dict(_fake_torch_sd(ks), cfg)
    model = MPNetEncoder(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    want = _tree_shapes(model.init(jax.random.PRNGKey(0), ids, jnp.ones((1, 8), jnp.int32))["params"])
    assert _tree_shapes(params) == want


def test_vae_converter_structure():
    cfg = VAEConfig.tiny()
    lat = cfg.latent_channels
    ks = {"quant_conv.weight": (2 * lat, 2 * lat, 1, 1), "quant_conv.bias": (2 * lat,),
          "post_quant_conv.weight": (lat, lat, 1, 1), "post_quant_conv.bias": (lat,)}

    def resnet(p, cin, cout):
        ks[f"{p}.norm1.weight"] = (cin,); ks[f"{p}.norm1.bias"] = (cin,)
        ks[f"{p}.conv1.weight"] = (cout, cin, 3, 3); ks[f"{p}.conv1.bias"] = (cout,)
        ks[f"{p}.norm2.weight"] = (cout,); ks[f"{p}.norm2.bias"] = (cout,)
        ks[f"{p}.conv2.weight"] = (cout, cout, 3, 3); ks[f"{p}.conv2.bias"] = (cout,)
        if cin != cout:
            ks[f"{p}.conv_shortcut.weight"] = (cout, cin, 1, 1)
            ks[f"{p}.conv_shortcut.bias"] = (cout,)

    def vattn(p, c):
        ks[f"{p}.group_norm.weight"] = (c,); ks[f"{p}.group_norm.bias"] = (c,)
        for n in ("to_q", "to_k", "to_v"):
            ks[f"{p}.{n}.weight"] = (c, c); ks[f"{p}.{n}.bias"] = (c,)
        ks[f"{p}.to_out.0.weight"] = (c, c); ks[f"{p}.to_out.0.bias"] = (c,)

    chans = cfg.block_out_channels
    n = len(chans)
    ks["encoder.conv_in.weight"] = (chans[0], cfg.in_channels, 3, 3)
    ks["encoder.conv_in.bias"] = (chans[0],)
    cin = chans[0]
    for i, c in enumerate(chans):
        for j in range(cfg.layers_per_block):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", cin if j == 0 else c, c)
        cin = c
        if i < n - 1:
            ks[f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"] = (c, c, 3, 3)
            ks[f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"] = (c,)
    resnet("encoder.mid_block.resnets.0", chans[-1], chans[-1])
    resnet("encoder.mid_block.resnets.1", chans[-1], chans[-1])
    vattn("encoder.mid_block.attentions.0", chans[-1])
    ks["encoder.conv_norm_out.weight"] = (chans[-1],); ks["encoder.conv_norm_out.bias"] = (chans[-1],)
    ks["encoder.conv_out.weight"] = (2 * lat, chans[-1], 3, 3); ks["encoder.conv_out.bias"] = (2 * lat,)

    ks["decoder.conv_in.weight"] = (chans[-1], lat, 3, 3); ks["decoder.conv_in.bias"] = (chans[-1],)
    resnet("decoder.mid_block.resnets.0", chans[-1], chans[-1])
    resnet("decoder.mid_block.resnets.1", chans[-1], chans[-1])
    vattn("decoder.mid_block.attentions.0", chans[-1])
    rev = list(reversed(chans))
    cin = rev[0]
    for i, c in enumerate(rev):
        for j in range(cfg.layers_per_block + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", cin if j == 0 else c, c)
        cin = c
        if i < n - 1:
            ks[f"decoder.up_blocks.{i}.upsamplers.0.conv.weight"] = (c, c, 3, 3)
            ks[f"decoder.up_blocks.{i}.upsamplers.0.conv.bias"] = (c,)
    ks["decoder.conv_norm_out.weight"] = (chans[0],); ks["decoder.conv_norm_out.bias"] = (chans[0],)
    ks["decoder.conv_out.weight"] = (cfg.in_channels, chans[0], 3, 3)
    ks["decoder.conv_out.bias"] = (cfg.in_channels,)

    params = convert_vae_state_dict(_fake_torch_sd(ks), cfg)
    model = AutoencoderKL(cfg)
    x = jnp.zeros((1, 32, 32, 3))
    want = _tree_shapes(model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))["params"])
    assert _tree_shapes(params) == want
