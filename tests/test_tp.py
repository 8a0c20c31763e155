"""Tensor-parallel U-Net forward (parallel/tp.py): a 2-D data×model mesh
with Megatron-style param specs must reproduce the single-device forward.
Beyond-reference capability (the reference is DP-only, SURVEY §2.4)."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from diffusion_pruning_tpu.models.unet.config import UNetConfig
from diffusion_pruning_tpu.models.unet.unet import GatedUNet
from diffusion_pruning_tpu.parallel.tp import (
    MODEL_AXIS,
    dp_tp_mesh,
    shard_params,
    tp_jit_forward,
    unet_param_specs,
)


def test_tp_specs_split_matmul_params():
    cfg = UNetConfig.tiny(cross_attention_dim=32)
    model = GatedUNet(cfg)
    params = model.init_params(jax.random.PRNGKey(0), batch=1)
    specs = unet_param_specs(params)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    by_name = {"/".join(str(k.key) for k in path): spec for path, spec in flat}
    attn = "down_blocks_0_attentions_0/transformer_blocks_0/attn1"
    assert by_name[f"{attn}/to_q/kernel"] == P(None, MODEL_AXIS)
    assert by_name[f"{attn}/to_out_0/kernel"] == P(MODEL_AXIS, None)
    ff = "down_blocks_0_attentions_0/transformer_blocks_0/ff"
    assert by_name[f"{ff}/act/proj/kernel"] == P(None, MODEL_AXIS)
    assert by_name[f"{ff}/out/kernel"] == P(MODEL_AXIS, None)
    res = "down_blocks_0_resnets_0"
    assert by_name[f"{res}/conv1/kernel"] == P(None, None, None, MODEL_AXIS)
    assert by_name[f"{res}/conv2/kernel"] == P(None, None, MODEL_AXIS, None)
    # norms replicated
    assert by_name[f"{res}/norm1/scale"] == P()


def test_tp_forward_matches_single_device(devices):
    cfg = UNetConfig.tiny(cross_attention_dim=32)
    model = GatedUNet(cfg)
    params = model.init_params(jax.random.PRNGKey(0), batch=1)

    b = 4
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    sample = jax.random.normal(ks[0], (b, cfg.sample_size, cfg.sample_size,
                                       cfg.in_channels))
    t = jnp.asarray([0, 10, 500, 999])
    ehs = jax.random.normal(ks[1], (b, cfg.max_text_len, cfg.cross_attention_dim))
    spec = model.spec
    arch = (jax.random.uniform(ks[2], (b, spec.vq_dim)) < 0.7).astype(jnp.float32)

    ref = model.apply({"params": params}, sample, t, ehs, arch=arch)

    mesh = dp_tp_mesh(2, 4, devices)
    tp_params = shard_params(mesh, params)
    fwd = tp_jit_forward(model, mesh)
    out = fwd(tp_params, sample, t, ehs, arch)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # the big matmul params really are split over the model axis
    leaf = tp_params["mid_block_attentions_0"]["transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
    assert len(leaf.sharding.device_set) >= 4
