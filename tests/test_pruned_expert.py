"""Physical expert materialisation tests.

The load-bearing property: the pruned expert's forward must equal the gated
model's forward under the same hard arch vector — masked attention heads and
GEGLU units contribute exactly zero in the gated path, and masked resnet
groups contribute only through norm2's bias (β of a zeroed group), so with
those biases zeroed the two paths are mathematically identical. (The
reference has the same β discrepancy between its gated and knife-pruned
models; stage-2 fine-tuning absorbs it.)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pruning_tpu.core import build_structure
from diffusion_pruning_tpu.models.unet.config import UNetConfig
from diffusion_pruning_tpu.models.unet.pruned import (
    expert_macs_ratio,
    make_expert_plan,
    slice_expert_params,
)
from diffusion_pruning_tpu.models.unet.unet import GatedUNet


@pytest.fixture(scope="module")
def dense():
    cfg = UNetConfig.tiny()
    model = GatedUNet(cfg)
    params = model.init_params(jax.random.PRNGKey(0), batch=1)
    return cfg, model, params, build_structure(cfg)


def _zero_norm2_biases(params):
    out = jax.tree.map(lambda x: x, params)  # copy
    for mod, p in out.items():
        if isinstance(p, dict) and "norm2" in p and "conv1" in p:
            p["norm2"] = dict(p["norm2"])
            p["norm2"]["bias"] = jnp.zeros_like(p["norm2"]["bias"])
    return out


def _rand_arch(spec, key, keep_prob=0.7, depth_on=True):
    arch = (jax.random.uniform(key, (1, spec.vq_dim)) < keep_prob).astype(jnp.float32)
    # guarantee ≥1 unit per width group
    for sb in spec.subblocks:
        for s in sb.sites:
            arch = arch.at[0, s.start].set(1.0)
    if depth_on:
        arch = arch.at[0, spec.num_width:].set(1.0)
    return arch


def test_pruned_equals_gated_hard_arch(dense):
    cfg, model, params, spec = dense
    params = _zero_norm2_biases(params)
    arch = _rand_arch(spec, jax.random.PRNGKey(3))

    plan = make_expert_plan(spec, np.asarray(arch[0]))
    expert_params = slice_expert_params(params, plan)
    expert = GatedUNet(cfg, plan=plan)

    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    x = jax.random.normal(ks[0], (2, cfg.sample_size, cfg.sample_size, cfg.in_channels))
    t = jnp.asarray([10, 500])
    ehs = jax.random.normal(ks[1], (2, cfg.max_text_len, cfg.cross_attention_dim))

    gated = model.apply({"params": params}, x, t, ehs, arch=arch)
    pruned = expert.apply({"params": expert_params}, x, t, ehs)
    np.testing.assert_allclose(np.asarray(pruned), np.asarray(gated),
                               atol=2e-4, rtol=1e-3)


def test_pruned_with_dropped_subblocks(dense):
    cfg, model, params, spec = dense
    params = _zero_norm2_biases(params)
    arch = _rand_arch(spec, jax.random.PRNGKey(5), depth_on=True)
    # drop half the depth-gated subblocks
    for d in range(0, spec.num_depth, 2):
        arch = arch.at[0, spec.num_width + d].set(0.0)

    plan = make_expert_plan(spec, np.asarray(arch[0]))
    assert sum(sb.dropped for sb in plan.subblocks) == (spec.num_depth + 1) // 2
    expert_params = slice_expert_params(params, plan)
    expert = GatedUNet(cfg, plan=plan)

    ks = jax.random.split(jax.random.PRNGKey(2), 2)
    x = jax.random.normal(ks[0], (1, cfg.sample_size, cfg.sample_size, cfg.in_channels))
    t = jnp.asarray([42])
    ehs = jax.random.normal(ks[1], (1, cfg.max_text_len, cfg.cross_attention_dim))

    gated = model.apply({"params": params}, x, t, ehs, arch=arch)
    pruned = expert.apply({"params": expert_params}, x, t, ehs)
    np.testing.assert_allclose(np.asarray(pruned), np.asarray(gated),
                               atol=2e-4, rtol=1e-3)
    # dropped modules carry no params
    dropped_name = next(sb.name for sb in plan.subblocks if sb.dropped)
    from diffusion_pruning_tpu.models.unet.pruned import _module_name
    assert _module_name(dropped_name) not in expert_params


def test_expert_params_are_pretrained_slices(dense):
    """Unlike the reference's prune-then-load quirk (SURVEY §2.1), expert
    weights must be gathered slices of the dense weights."""
    cfg, model, params, spec = dense
    arch = _rand_arch(spec, jax.random.PRNGKey(7))
    plan = make_expert_plan(spec, np.asarray(arch[0]))
    ep = slice_expert_params(params, plan)
    sb = plan.subblocks[0]  # first resnet
    keep = sb.sites[0]
    unit = keep.channels // keep.width
    ch = np.concatenate([np.arange(k * unit, (k + 1) * unit) for k in keep.kept])
    from diffusion_pruning_tpu.models.unet.pruned import _module_name
    mod = _module_name(sb.name)
    np.testing.assert_array_equal(
        np.asarray(ep[mod]["conv1"]["kernel"]),
        np.asarray(params[mod]["conv1"]["kernel"])[..., ch])


def test_expert_macs_ratio_monotone(dense):
    cfg, model, params, spec = dense
    full = make_expert_plan(spec, np.ones(spec.vq_dim))
    assert expert_macs_ratio(spec, full) == pytest.approx(1.0, rel=1e-6)
    half = np.ones(spec.vq_dim)
    half[: spec.num_width // 2] = 0.0
    ratio = expert_macs_ratio(spec, make_expert_plan(spec, half))
    assert 0.2 < ratio < 0.9


def test_pruned_model_is_smaller(dense):
    cfg, model, params, spec = dense
    arch = np.ones(spec.vq_dim)
    arch[: spec.num_width] = 0.0
    for sb in spec.subblocks:
        for s in sb.sites:
            arch[s.start] = 1.0  # keep exactly 1 unit per group
    plan = make_expert_plan(spec, arch)
    ep = slice_expert_params(params, plan)
    n_dense = sum(np.prod(x.shape) for x in jax.tree.leaves(params))
    n_exp = sum(np.prod(x.shape) for x in jax.tree.leaves(ep))
    assert n_exp < 0.8 * n_dense
