"""Full-SD-2.1-topology converter round-trips (day-1 real-weights hardening).

The tiny-config tests in test_convert.py / test_export.py prove the key
grammar; real checkpoints exercise every block variant, channel width, and
key spelling of the production topology
(/root/reference/pdm/models/unet/unet_2d_conditional.py:1729-2117). These
slow tests run the converters at the REAL configs — UNetConfig.sd21(),
VAEConfig.sd(), CLIPTextConfig.sd21(), MPNetConfig.base() — so the first
contact with downloaded SD-2.1 weights holds no surprises:

- flax → torch → flax is the exact identity on the full U-Net tree
  (unet_flax_to_torch is documented as the exact inverse of
  convert_unet_state_dict; here that is asserted at scale, bit-for-bit)
- fp16 state dicts (how SD checkpoints commonly ship) convert losslessly
  relative to their fp16 values and come out float32
- VAE/CLIP/MPNet full-topology torch key sets convert into trees that
  match the models' init shapes exactly

No XLA compilation: shapes come from jax.eval_shape, values are numpy.
"""
import numpy as np
import jax
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
from diffusion_pruning_tpu.utils.export import unet_flax_to_torch

from test_convert import _tree_shapes, _unet_torch_keys


def _fill_tree(shapes_tree):
    """Deterministic, positionally-distinct float32 leaves: any transpose or
    key misrouting in a round-trip breaks exact equality."""
    leaves, treedef = jax.tree_util.tree_flatten(shapes_tree)
    out = []
    base = 0.0
    for leaf in leaves:
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        a = (np.arange(n, dtype=np.float32) + np.float32(base % 9973)
             ).reshape(leaf.shape)
        out.append(a)
        base += n % 9973 + 1
    return jax.tree_util.tree_unflatten(treedef, out)


def _fake_sd(keys_shapes):
    """Positionally-distinct torch-named state dict (cheaper than randn at
    full scale; same bug-catching property as _fill_tree)."""
    sd = {}
    base = 0.0
    for k, s in keys_shapes.items():
        n = int(np.prod(s))
        sd[k] = (np.arange(n, dtype=np.float32) + np.float32(base % 9973)
                 ).reshape(s)
        base += n % 9973 + 1
    return sd


def _unet_param_shapes(cfg):
    model = GatedUNet(cfg)
    return jax.eval_shape(lambda k: model.init_params(k),
                          jax.random.PRNGKey(0))


@pytest.mark.slow
def test_sd21_unet_roundtrip_exact():
    cfg = UNetConfig.sd21()
    params = _fill_tree(_unet_param_shapes(cfg))
    sd = unet_flax_to_torch(params, cfg)
    back = convert_unet_state_dict(sd, cfg)

    assert _tree_shapes(back) == _tree_shapes(params)
    mismatches = jax.tree_util.tree_map(
        lambda a, b: not np.array_equal(a, b), params, back)
    bad = [jax.tree_util.keystr(k)
           for k, v in jax.tree_util.tree_flatten_with_path(mismatches)[0] if v]
    assert not bad, f"round-trip not exact at: {bad[:10]}"

    # every torch key the full topology emits is consumed (nothing silently
    # dropped on the way back)
    assert set(sd) == set(_unet_torch_keys(cfg)), (
        set(sd) ^ set(_unet_torch_keys(cfg)))


@pytest.mark.slow
def test_sd21_unet_fp16_state_dict_converts():
    """fp16 safetensors are the common SD-2.1 distribution format; the
    converter must upcast them to float32 losslessly w.r.t. the fp16 values."""
    torch = pytest.importorskip("torch")
    cfg = UNetConfig.sd21()
    params = _fill_tree(_unet_param_shapes(cfg))
    sd32 = unet_flax_to_torch(params, cfg)
    sd16 = {k: torch.from_numpy(v).to(torch.float16) for k, v in sd32.items()}
    back = convert_unet_state_dict(sd16, cfg)
    leaves = jax.tree_util.tree_flatten_with_path(back)[0]
    for k, v in leaves[::37] + leaves[-1:]:  # spot-check a spread of leaves
        assert v.dtype == np.float32, jax.tree_util.keystr(k)
    # exactness vs the fp16-cast values on a couple of representative leaves
    np.testing.assert_array_equal(
        back["conv_in"]["kernel"],
        sd16["conv_in.weight"].float().numpy().transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        back["mid_block_attentions_0"]["transformer_blocks_0"]["attn2"]["to_k"]["kernel"],
        sd16["mid_block.attentions.0.transformer_blocks.0.attn2.to_k.weight"].float().numpy().T)


@pytest.mark.slow
def test_sd_vae_full_topology_converts():
    cfg = VAEConfig.sd()
    ks = _vae_torch_keys(cfg)
    params = convert_vae_state_dict(_fake_sd(ks), cfg)
    model = AutoencoderKL(cfg)
    want = jax.eval_shape(
        lambda k: model.init(k, jax.numpy.zeros((1, 64, 64, 3)),
                             jax.random.PRNGKey(1))["params"],
        jax.random.PRNGKey(0))
    assert _tree_shapes(params) == _tree_shapes(want)


@pytest.mark.slow
def test_sd21_clip_full_topology_converts():
    cfg = CLIPTextConfig.sd21()
    ks = _clip_torch_keys(cfg)
    params = convert_clip_text_state_dict(_fake_sd(ks), cfg)
    model = CLIPTextEncoder(cfg)
    want = jax.eval_shape(
        lambda k: model.init(k, jax.numpy.zeros((1, 8), jax.numpy.int32))["params"],
        jax.random.PRNGKey(0))
    assert _tree_shapes(params) == _tree_shapes(want)


@pytest.mark.slow
def test_mpnet_base_full_topology_converts():
    cfg = MPNetConfig.base()
    ks = _mpnet_torch_keys(cfg)
    params = convert_mpnet_state_dict(_fake_sd(ks), cfg)
    model = MPNetEncoder(cfg)
    ids = jax.numpy.zeros((1, 8), jax.numpy.int32)
    want = jax.eval_shape(
        lambda k: model.init(k, ids, jax.numpy.ones((1, 8), jax.numpy.int32))["params"],
        jax.random.PRNGKey(0))
    assert _tree_shapes(params) == _tree_shapes(want)


# --- torch-key enumerators at arbitrary configs (generalised from the tiny
#     in-test enumerators in test_convert.py, which inline their cfg) ---

def _vae_torch_keys(cfg):
    ks = {}
    lat = cfg.latent_channels
    ks["quant_conv.weight"] = (2 * lat, 2 * lat, 1, 1); ks["quant_conv.bias"] = (2 * lat,)
    ks["post_quant_conv.weight"] = (lat, lat, 1, 1); ks["post_quant_conv.bias"] = (lat,)

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
    return ks


def _clip_torch_keys(cfg):
    ks = {
        "text_model.embeddings.token_embedding.weight": (cfg.vocab_size, cfg.hidden_size),
        "text_model.embeddings.position_embedding.weight": (cfg.max_positions, cfg.hidden_size),
        "text_model.final_layer_norm.weight": (cfg.hidden_size,),
        "text_model.final_layer_norm.bias": (cfg.hidden_size,),
    }
    for i in range(cfg.num_layers):
        p = f"text_model.encoder.layers.{i}"
        for n in ("layer_norm1", "layer_norm2"):
            ks[f"{p}.{n}.weight"] = (cfg.hidden_size,); ks[f"{p}.{n}.bias"] = (cfg.hidden_size,)
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            ks[f"{p}.self_attn.{n}.weight"] = (cfg.hidden_size, cfg.hidden_size)
            ks[f"{p}.self_attn.{n}.bias"] = (cfg.hidden_size,)
        ks[f"{p}.mlp.fc1.weight"] = (cfg.intermediate_size, cfg.hidden_size)
        ks[f"{p}.mlp.fc1.bias"] = (cfg.intermediate_size,)
        ks[f"{p}.mlp.fc2.weight"] = (cfg.hidden_size, cfg.intermediate_size)
        ks[f"{p}.mlp.fc2.bias"] = (cfg.hidden_size,)
    return ks


def _mpnet_torch_keys(cfg):
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
    return ks
