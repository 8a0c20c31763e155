import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pruning_tpu.core import ResourceModel, build_structure, hard_concrete
from diffusion_pruning_tpu.models.unet.config import UNetConfig


def test_sd21_structure_layout():
    """Pin the flat arch-vector layout against the reference's known SD-2.1
    numbers: 1606 width logits over 70 groups + 14 depth gates = 1620-d."""
    spec = build_structure(UNetConfig.sd21())
    assert spec.num_width == 1606
    assert spec.num_depth == 14
    assert spec.vq_dim == 1620
    assert len(spec.width_list) == 70
    assert len(spec.subblocks) == 38

    # depth gates sit on the LAST resnet/transformer pair of each half-gated
    # block: down blocks contribute 2,2,2,1; up blocks 1,2,2,2 (SURVEY §2.1)
    per_block = {}
    for sb in spec.subblocks:
        key = ".".join(sb.name.split(".")[:2])
        per_block.setdefault(key, 0)
        if sb.depth_index >= 0:
            per_block[key] += 1
    assert per_block == {
        "down.0": 2, "down.1": 2, "down.2": 2, "down.3": 1,
        "mid.resnet": 0, "mid.attn": 0,
        "up.0": 1, "up.1": 2, "up.2": 2, "up.3": 2,
    }

    # width group sizes per level: resnet gates 32 (norm groups), head gates
    # 5/10/20/20, ff gates 32
    down0 = spec.subblocks_by_prefix("down.0")
    assert [tuple(s.width for s in sb.sites) for sb in down0] == [
        (32,), (32,), (5, 5, 32), (5, 5, 32)
    ]
    up1 = spec.subblocks_by_prefix("up.1")  # level 2, 20 heads
    assert [tuple(s.width for s in sb.sites) for sb in up1] == [
        (32,), (32,), (32,), (20, 20, 32), (20, 20, 32), (20, 20, 32)
    ]

    # resnets-then-attentions ordering within each block
    names = [sb.name for sb in down0]
    assert names == ["down.0.resnet.0", "down.0.resnet.1", "down.0.attn.0", "down.0.attn.1"]

    # width offsets are contiguous and exhaustive
    offsets = [(s.start, s.width) for sb in spec.subblocks for s in sb.sites]
    cursor = 0
    for start, width in offsets:
        assert start == cursor
        cursor += width
    assert cursor == spec.num_width


def test_sd21_macs_sanity():
    """SD-2.1 U-Net at 256px (32² latents) is ≈ 90-95 GMACs (the 512px
    figure of ~340 GMACs scales by spatial area); most of it prunable."""
    spec = build_structure(UNetConfig.sd21())
    total = spec.total_macs
    assert 0.6e11 < total < 1.5e11, total
    assert 0.55 < spec.prunable_macs / total < 0.95
    assert spec.prunable_macs < spec.cur_prunable_macs_dense < total


def test_resource_model_all_ones_is_dense():
    spec = build_structure(UNetConfig.tiny())
    rm = ResourceModel(spec)
    arch = jnp.ones((3, spec.vq_dim))
    ratio = rm.resource_ratio(arch)
    np.testing.assert_allclose(np.asarray(ratio), np.ones(3), rtol=1e-6)


def test_resource_model_matches_reference_loop():
    """Vectorised coefficient-table model == direct per-subblock evaluation of
    the reference calc_macs formulas."""
    spec = build_structure(UNetConfig.tiny())
    rm = ResourceModel(spec)
    key = jax.random.PRNGKey(0)
    arch = jax.random.uniform(key, (5, spec.vq_dim))

    got = np.asarray(rm.cur_prunable_macs(arch))

    a = np.asarray(arch)
    hard = (a >= 0.5).astype(np.float64)
    want = np.zeros(5)
    for sb in spec.subblocks:
        sub = np.zeros(5)
        for site in sb.sites:
            g = hard[:, site.start : site.start + site.width]
            sub += g.mean(axis=1) * site.prunable_macs
        if sb.depth_index >= 0:
            d = hard[:, spec.num_width + sb.depth_index]
            sub = (sub + sb.nonprunable_macs) * d
        want += sub
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_resource_model_gradients_flow():
    spec = build_structure(UNetConfig.tiny())
    rm = ResourceModel(spec)

    def loss(arch):
        return rm.resource_ratio(arch).mean()

    g = jax.grad(loss)(jnp.full((2, spec.vq_dim), 0.7))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0.0


def test_depth_gate_zero_removes_subblock_macs():
    spec = build_structure(UNetConfig.tiny())
    rm = ResourceModel(spec)
    arch = jnp.ones((1, spec.vq_dim))
    dense = float(rm.cur_prunable_macs(arch)[0])
    # switch off the first depth gate
    arch0 = arch.at[0, spec.num_width].set(0.0)
    off = float(rm.cur_prunable_macs(arch0)[0])
    sb = next(s for s in spec.subblocks if s.depth_index == 0)
    np.testing.assert_allclose(dense - off, sb.prunable_macs + sb.nonprunable_macs, rtol=1e-6)


def test_prunable_template_shape_and_mass():
    spec = build_structure(UNetConfig.sd21())
    rm = ResourceModel(spec)
    tpl = rm.prunable_macs_template()
    assert tpl.shape == (spec.vq_dim,)
    assert (tpl > 0).all()
    # width slots weighted by per-site fractions sum to 1 (each site's
    # fraction appears `width` times, so the weighted sum over sites is 1)
    site_fracs = [s.prunable_macs / spec.prunable_macs for sb in spec.subblocks for s in sb.sites]
    np.testing.assert_allclose(sum(site_fracs), 1.0, rtol=1e-6)


def test_analytic_macs_against_xla_cost_analysis():
    """Independent validation of the analytic MAC table (the reference
    cross-checks its op-counter against calc_macs at startup,
    trainer.py:1277-1296): XLA's compiled-HLO flop count for one dense
    forward should be ≈ 2 × total MACs (batch 1). Conventions differ
    slightly (XLA counts everything; the table follows ptflops), so the
    tolerance is generous — this catches order-of-magnitude/missing-term
    bugs, not rounding."""
    from diffusion_pruning_tpu.models.unet.unet import GatedUNet

    cfg = UNetConfig.tiny()
    spec = build_structure(cfg)
    model = GatedUNet(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.zeros((1, cfg.sample_size, cfg.sample_size, cfg.in_channels))
    t = jnp.zeros((1,), jnp.int32)
    e = jnp.zeros((1, cfg.max_text_len, cfg.cross_attention_dim))
    compiled = jax.jit(lambda p, x, t, e: model.apply({"params": p}, x, t, e)
                       ).lower(params, x, t, e).compile()
    cost = compiled.cost_analysis()
    flops = (cost or {}).get("flops", 0.0)
    if not flops:
        pytest.skip("backend reports no flop analysis")
    ratio = flops / (2.0 * spec.total_macs)
    assert 0.7 < ratio < 1.4, (flops, spec.total_macs, ratio)
