"""Parity tests for the fused GroupNorm(+gate+SiLU)→conv3x3 kernel.

The fused op (ops/norm_conv.py) must be numerically interchangeable with
the unfused chain the resnet blocks use otherwise: channel_gate →
nn.GroupNorm → SiLU → nn.Conv 3x3 (the reference's gate placement,
/root/reference/pdm/models/unet/blocks.py:345-353). Runs in Pallas
interpret mode on the CPU test platform; the real-chip speed comparison
lives in benchmarks/ + PERFORMANCE.md.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pruning_tpu.ops.norm_conv import (
    _reference, group_norm_silu_conv3x3)


def _rand(key, *shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


def _args(seed, b, h, w, c, cout, dtype):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = _rand(ks[0], b, h, w, c, dtype=dtype)
    scale = 1.0 + 0.1 * _rand(ks[1], c)
    bias = 0.1 * _rand(ks[2], c)
    kernel = 0.1 * _rand(ks[3], 3, 3, c, cout)
    cbias = 0.1 * _rand(ks[4], cout)
    return x, scale, bias, kernel, cbias


@pytest.mark.parametrize("b,h,w,c,cout,groups", [
    (2, 8, 8, 32, 48, 8),
    (1, 4, 4, 40, 16, 8),    # C/groups = 5 (non-power-of-two slab)
    (3, 5, 7, 16, 16, 4),    # odd spatial dims exercise the halo shifts
])
def test_fused_matches_reference(b, h, w, c, cout, groups):
    x, scale, bias, kernel, cbias = _args(0, b, h, w, c, cout, jnp.float32)
    ref = _reference(x, scale, bias, kernel, cbias, None, groups, 1e-5, True)
    out = group_norm_silu_conv3x3(x, scale, bias, kernel, cbias, None,
                                  groups, 1e-5, True, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_with_gate_and_cfg_tiling():
    b, h, w, c, cout, groups = 4, 6, 6, 24, 32, 6
    x, scale, bias, kernel, cbias = _args(1, b, h, w, c, cout, jnp.float32)
    # gate computed for b/2 prompts, activations are CFG-doubled
    gate_half = jax.nn.sigmoid(_rand(jax.random.PRNGKey(7), b // 2, c))
    gate_c = jnp.tile(gate_half, (2, 1))
    ref = _reference(x, scale, bias, kernel, cbias, gate_c, groups, 1e-5, True)
    out = group_norm_silu_conv3x3(x, scale, bias, kernel, cbias, gate_c,
                                  groups, 1e-5, True, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_bf16():
    b, h, w, c, cout, groups = 2, 8, 8, 32, 32, 8
    x, scale, bias, kernel, cbias = _args(2, b, h, w, c, cout, jnp.bfloat16)
    ref = _reference(x, scale, bias, kernel.astype(jnp.bfloat16), cbias,
                     None, groups, 1e-5, True)
    out = group_norm_silu_conv3x3(x, scale, bias, kernel.astype(jnp.bfloat16),
                                  cbias, None, groups, 1e-5, True, True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_bf16_gradients_compile_and_match():
    """The bf16 VJP recompute must be well-typed (a preferred_element_type
    conv in the reference composition makes the transpose mix bf16/f32 and
    crash — caught by the fused prune-CLI smoke) and match the reference's
    gradients. Differentiates through x and gate only — the frozen-U-Net
    stage-1 path, where the gate carries the router's gradient."""
    from diffusion_pruning_tpu.ops.norm_conv import (_linear_reference,
                                                     group_norm_linear)
    b, h, w, c, cout, groups = 2, 6, 6, 16, 24, 4
    x, scale, bias, kernel, cbias = _args(21, b, h, w, c, cout, jnp.bfloat16)
    kernel = kernel.astype(jnp.bfloat16)
    gate_c = jax.nn.sigmoid(_rand(jax.random.PRNGKey(22), b, c))

    def loss_fused(x, g):
        return jnp.sum(group_norm_silu_conv3x3(
            x, scale, bias, kernel, cbias, g, groups, 1e-5, True, True
        ).astype(jnp.float32) ** 2)

    def loss_ref(x, g):
        return jnp.sum(_reference(
            x, scale, bias, kernel, cbias, g, groups, 1e-5, True
        ).astype(jnp.float32) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1))(x, gate_c)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, gate_c)
    for a, r in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(r, np.float32),
                                   rtol=5e-2, atol=5e-2)

    # linear variant, bf16 grads
    xs = _rand(jax.random.PRNGKey(23), b, h * w, c, dtype=jnp.bfloat16)
    ks = (0.1 * _rand(jax.random.PRNGKey(24), c, cout)).astype(jnp.bfloat16)
    lb = 0.1 * _rand(jax.random.PRNGKey(25), cout)
    g = jax.grad(lambda x: jnp.sum(group_norm_linear(
        x, scale, bias, ks, lb, None, groups, 1e-6, True
    ).astype(jnp.float32) ** 2))(xs)
    gr2 = jax.grad(lambda x: jnp.sum(_linear_reference(
        x, scale, bias, ks, lb, None, groups, 1e-6
    ).astype(jnp.float32) ** 2))(xs)
    np.testing.assert_allclose(np.asarray(g, np.float32),
                               np.asarray(gr2, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_gradients_match_reference():
    b, h, w, c, cout, groups = 2, 5, 5, 16, 24, 4
    x, scale, bias, kernel, cbias = _args(3, b, h, w, c, cout, jnp.float32)
    gate_c = jax.nn.sigmoid(_rand(jax.random.PRNGKey(9), b, c))

    def loss_fused(x, s, bi, k, cb, g):
        return jnp.sum(group_norm_silu_conv3x3(x, s, bi, k, cb, g,
                                               groups, 1e-5, True, True) ** 2)

    def loss_ref(x, s, bi, k, cb, g):
        return jnp.sum(_reference(x, s, bi, k, cb, g, groups, 1e-5, True) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(
        x, scale, bias, kernel, cbias, gate_c)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
        x, scale, bias, kernel, cbias, gate_c)
    for a, r in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)


def test_h_tiled_path_parity(monkeypatch):
    """Force the halo-read H-tiled kernel (the 512px level-0 path) and pin
    it against the reference — covers the clamped row index maps and the
    y-space zeroing of image-edge halo rows."""
    import diffusion_pruning_tpu.ops.norm_conv as nc
    b, h, w, c, cout, groups = 2, 32, 8, 16, 16, 4
    x, scale, bias, kernel, cbias = _args(5, b, h, w, c, cout, jnp.float32)
    gate_c = jax.nn.sigmoid(_rand(jax.random.PRNGKey(13), b, c))
    monkeypatch.setattr(nc, "_pick_tiles", lambda *a: (8, cout))
    out = nc.group_norm_silu_conv3x3(x, scale, bias, kernel, cbias, gate_c,
                                     groups, 1e-5, True, True)
    ref = _reference(x, scale, bias, kernel, cbias, gate_c, groups, 1e-5, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_group_norm_linear_matches_reference():
    from diffusion_pruning_tpu.ops.norm_conv import (_linear_reference,
                                                     group_norm_linear)
    b, s, c, cout, groups = 2, 16, 32, 48, 8
    ks = jax.random.split(jax.random.PRNGKey(11), 5)
    x = _rand(ks[0], b, s, c)
    scale = 1.0 + 0.1 * _rand(ks[1], c)
    bias = 0.1 * _rand(ks[2], c)
    kernel = 0.1 * _rand(ks[3], c, cout)
    lb = 0.1 * _rand(ks[4], cout)
    ref = _linear_reference(x, scale, bias, kernel, lb, None, groups, 1e-6)
    out = group_norm_linear(x, scale, bias, kernel, lb, None, groups, 1e-6, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def loss_f(x, k):
        return jnp.sum(group_norm_linear(x, scale, bias, k, lb, None,
                                         groups, 1e-6, True) ** 2)

    def loss_r(x, k):
        return jnp.sum(_linear_reference(x, scale, bias, k, lb, None,
                                         groups, 1e-6) ** 2)

    for a, r in zip(jax.grad(loss_f, (0, 1))(x, kernel),
                    jax.grad(loss_r, (0, 1))(x, kernel)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)


def test_unet_fused_flag_parity():
    """Whole tiny U-Net, fused_norm_conv=True ≡ default, same params, with
    per-prompt arch gates active (covers resnet conv1/conv2, the transformer
    proj_in fold, and the output head)."""
    from diffusion_pruning_tpu.core import build_structure
    from diffusion_pruning_tpu.models.unet.config import UNetConfig
    from diffusion_pruning_tpu.models.unet.unet import GatedUNet
    import dataclasses
    cfg = UNetConfig.tiny()
    spec = build_structure(cfg)
    dense = GatedUNet(cfg)
    fused = GatedUNet(dataclasses.replace(cfg, fused_norm_conv=True))
    params = dense.init_params(jax.random.PRNGKey(0), batch=1)
    pf = fused.init_params(jax.random.PRNGKey(0), batch=1)
    assert jax.tree.structure(params) == jax.tree.structure(pf)

    b = 2
    x = _rand(jax.random.PRNGKey(1), b, cfg.sample_size, cfg.sample_size, 4)
    t = jnp.array([3, 17])
    ehs = _rand(jax.random.PRNGKey(2), b, cfg.max_text_len,
                cfg.cross_attention_dim)
    arch = jax.nn.sigmoid(_rand(jax.random.PRNGKey(3), b, spec.vq_dim))
    ref = dense.apply({"params": params}, x, t, ehs, arch=arch)
    out = fused.apply({"params": params}, x, t, ehs, arch=arch)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_block_grads_under_remat():
    """remat(GatedResnetBlock) with fused_norm_conv must produce the same
    parameter gradients as the unfused block — the stage-1/2 remat training
    path composes nn.remat around the custom_vjp kernels."""
    from flax import linen as nn
    from diffusion_pruning_tpu.models.unet.blocks import GatedResnetBlock
    b, h, w, cin, cout, groups = 2, 6, 6, 16, 24, 4
    x = _rand(jax.random.PRNGKey(4), b, h, w, cin)
    temb = _rand(jax.random.PRNGKey(5), b, 32)
    gate = jax.nn.sigmoid(_rand(jax.random.PRNGKey(6), b, groups))
    dense = GatedResnetBlock(cout, groups)
    fused_r = nn.remat(GatedResnetBlock, static_argnums=())(
        cout, groups, fused_norm_conv=True)
    params = dense.init(jax.random.PRNGKey(8), x, temb, gate)["params"]

    def loss(mod, p):
        return jnp.sum(mod.apply({"params": p}, x, temb, gate) ** 2)

    gd = jax.grad(lambda p: loss(dense, p))(params)
    gf = jax.grad(lambda p: loss(fused_r, p))(params)
    assert jax.tree.structure(gd) == jax.tree.structure(gf)
    jax.tree.map(lambda a, r: np.testing.assert_allclose(
        np.asarray(a), np.asarray(r), rtol=5e-4, atol=5e-4), gf, gd)


def test_resnet_block_fused_flag_parity():
    """GatedResnetBlock(fused_norm_conv=True) ≡ unfused with the SAME params
    (the fused path keeps nn.GroupNorm/nn.Conv parameter trees)."""
    from diffusion_pruning_tpu.models.unet.blocks import GatedResnetBlock
    b, h, w, cin, cout, groups = 2, 6, 6, 16, 24, 4
    x = _rand(jax.random.PRNGKey(4), b, h, w, cin)
    temb = _rand(jax.random.PRNGKey(5), b, 32)
    gate = jax.nn.sigmoid(_rand(jax.random.PRNGKey(6), b, groups))
    dense = GatedResnetBlock(cout, groups)
    fused = GatedResnetBlock(cout, groups, fused_norm_conv=True)
    params = dense.init(jax.random.PRNGKey(8), x, temb, gate)["params"]
    pf = fused.init(jax.random.PRNGKey(8), x, temb, gate)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(pf)
    ref = dense.apply({"params": params}, x, temb, gate)
    out = fused.apply({"params": params}, x, temb, gate)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)
