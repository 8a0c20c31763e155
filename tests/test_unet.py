import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pruning_tpu.core import build_structure
from diffusion_pruning_tpu.models.unet.config import UNetConfig
from diffusion_pruning_tpu.models.unet.unet import GatedUNet, timestep_embedding


@pytest.fixture(scope="module")
def tiny():
    cfg = UNetConfig.tiny()
    model = GatedUNet(cfg)
    params = model.init_params(jax.random.PRNGKey(0), batch=1)
    spec = build_structure(cfg)
    return cfg, model, params, spec


def _inputs(cfg, batch, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    sample = jax.random.normal(ks[0], (batch, cfg.sample_size, cfg.sample_size, cfg.in_channels))
    t = jnp.arange(batch) * 100
    ehs = jax.random.normal(ks[1], (batch, cfg.max_text_len, cfg.cross_attention_dim))
    return sample, t, ehs


def test_forward_shape_and_finite(tiny):
    cfg, model, params, spec = tiny
    sample, t, ehs = _inputs(cfg, 2)
    out = model.apply({"params": params}, sample, t, ehs)
    assert out.shape == (2, cfg.sample_size, cfg.sample_size, cfg.out_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_all_ones_arch_equals_dense(tiny):
    """set_structure(ones) must be the dense model (teacher semantics)."""
    cfg, model, params, spec = tiny
    sample, t, ehs = _inputs(cfg, 2)
    dense = model.apply({"params": params}, sample, t, ehs)
    ones = model.apply({"params": params}, sample, t, ehs,
                       arch=jnp.ones((2, spec.vq_dim)))
    np.testing.assert_allclose(np.asarray(dense), np.asarray(ones), atol=1e-5)


def test_depth_gate_zero_skips_subblock(tiny):
    """Closing one depth gate = identity path through that subblock; the
    result must differ from dense but stay finite, and closing ALL depth
    gates must still run (half-gated: non-depth subblocks keep compute)."""
    cfg, model, params, spec = tiny
    sample, t, ehs = _inputs(cfg, 2)
    arch = jnp.ones((2, spec.vq_dim))
    arch = arch.at[:, spec.num_width:].set(0.0)
    out = model.apply({"params": params}, sample, t, ehs, arch=arch)
    dense = model.apply({"params": params}, sample, t, ehs)
    assert np.isfinite(np.asarray(out)).all()
    assert not np.allclose(np.asarray(out), np.asarray(dense), atol=1e-5)


def test_per_sample_gates_are_independent(tiny):
    """Each sample in a batch runs its own (masked) architecture: batching
    [a0, a1] must equal running a0 and a1 separately."""
    cfg, model, params, spec = tiny
    sample, t, ehs = _inputs(cfg, 2)
    key = jax.random.PRNGKey(7)
    arch = (jax.random.uniform(key, (2, spec.vq_dim)) > 0.3).astype(jnp.float32)

    batched = model.apply({"params": params}, sample, t, ehs, arch=arch)
    for i in range(2):
        single = model.apply({"params": params}, sample[i:i+1], t[i:i+1], ehs[i:i+1],
                             arch=arch[i:i+1])
        # exact on TPU; loose tolerance absorbs oneDNN's batch-size-dependent
        # conv reductions on the CPU test backend (real coupling would be O(1))
        np.testing.assert_allclose(np.asarray(batched[i]), np.asarray(single[0]),
                                   atol=5e-3, rtol=5e-2)


def test_cfg_batch_doubling(tiny):
    """Gates for B prompts apply to 2B activations (CFG): tile semantics."""
    cfg, model, params, spec = tiny
    sample, t, ehs = _inputs(cfg, 4)
    arch2 = (jax.random.uniform(jax.random.PRNGKey(3), (2, spec.vq_dim)) > 0.3).astype(jnp.float32)
    doubled = model.apply({"params": params}, sample, t, ehs, arch=arch2)
    explicit = model.apply({"params": params}, sample, t, ehs,
                           arch=jnp.tile(arch2, (2, 1)))
    np.testing.assert_allclose(np.asarray(doubled), np.asarray(explicit), atol=1e-6)


def test_width_gate_zero_group_changes_output(tiny):
    cfg, model, params, spec = tiny
    sample, t, ehs = _inputs(cfg, 1)
    arch = jnp.ones((1, spec.vq_dim))
    site = spec.subblocks[0].sites[0]
    arch = arch.at[0, site.start: site.start + site.width // 2].set(0.0)
    out = model.apply({"params": params}, sample, t, ehs, arch=arch)
    dense = model.apply({"params": params}, sample, t, ehs)
    assert not np.allclose(np.asarray(out), np.asarray(dense), atol=1e-5)


def test_return_features_keys(tiny):
    cfg, model, params, spec = tiny
    sample, t, ehs = _inputs(cfg, 1)
    out, feats = model.apply({"params": params}, sample, t, ehs, return_features=True)
    n_down = len(cfg.down_block_types)
    n_up = len(cfg.up_block_types)
    assert set(feats) == {f"d{i}" for i in range(n_down)} | {"m"} | {f"u{i}" for i in range(n_up)}


def test_soft_gates_differentiable(tiny):
    """Gradients flow from the output back to a soft arch vector."""
    cfg, model, params, spec = tiny
    sample, t, ehs = _inputs(cfg, 1)

    def loss(arch):
        out = model.apply({"params": params}, sample, t, ehs, arch=arch)
        return (out.astype(jnp.float32) ** 2).mean()

    g = jax.grad(loss)(jnp.full((1, spec.vq_dim), 0.8))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_timestep_embedding_flip():
    emb = timestep_embedding(jnp.asarray([0.0]), 8, flip_sin_to_cos=True)
    # t=0: cos parts 1, sin parts 0
    np.testing.assert_allclose(np.asarray(emb[0, :4]), np.ones(4), atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 4:]), np.zeros(4), atol=1e-6)


def test_param_count_sd21_scale():
    """SD-2.1 config builds with the expected ~0.87B parameter count."""
    cfg = UNetConfig.sd21()
    model = GatedUNet(cfg)
    shapes = jax.eval_shape(lambda: model.init_params(jax.random.PRNGKey(0)))
    n = sum(np.prod(x.shape) for x in jax.tree.leaves(shapes))
    assert 8.0e8 < n < 9.5e8, n


def test_flash_attention_unet_matches_sdpa_path(tiny):
    """use_flash_attention=True (Pallas kernel, interpreted on CPU) must
    reproduce the masked-SDPA forward and stay differentiable."""
    import dataclasses
    cfg, model, params, spec = tiny
    fcfg = dataclasses.replace(cfg, use_flash_attention=True)
    fmodel = GatedUNet(fcfg)
    sample, t, ehs = _inputs(cfg, 2)
    arch = (jax.random.uniform(jax.random.PRNGKey(11), (2, spec.vq_dim)) > 0.3
            ).astype(jnp.float32)
    base = model.apply({"params": params}, sample, t, ehs, arch=arch)
    flash = fmodel.apply({"params": params}, sample, t, ehs, arch=arch)
    np.testing.assert_allclose(np.asarray(flash), np.asarray(base),
                               atol=5e-4, rtol=5e-3)

    def loss(a):
        return (fmodel.apply({"params": params}, sample, t, ehs, arch=a)
                .astype(jnp.float32) ** 2).mean()

    g = jax.grad(loss)(jnp.full((2, spec.vq_dim), 0.8))
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_remat_matches_non_remat(tiny):
    """gradient_checkpointing (remat) must not change values or break grads."""
    import dataclasses
    cfg, model, params, spec = tiny
    rcfg = dataclasses.replace(cfg, remat=True)
    rmodel = GatedUNet(rcfg)
    sample, t, ehs = _inputs(cfg, 2)
    arch = jnp.full((2, spec.vq_dim), 0.8)
    base = model.apply({"params": params}, sample, t, ehs, arch=arch)
    rem = rmodel.apply({"params": params}, sample, t, ehs, arch=arch)
    np.testing.assert_allclose(np.asarray(rem), np.asarray(base), atol=1e-5)

    g = jax.grad(lambda a: (rmodel.apply({"params": params}, sample, t, ehs, arch=a)
                            .astype(jnp.float32) ** 2).mean())(arch)
    assert np.isfinite(np.asarray(g)).all()


def test_fused_norms_match_unfused(tiny):
    """Pallas one-pass GroupNorm+SiLU == nn.GroupNorm + silu (same params)."""
    import dataclasses
    cfg, model, params, spec = tiny
    fcfg = dataclasses.replace(cfg, fused_norms=True)
    fmodel = GatedUNet(fcfg)
    sample, t, ehs = _inputs(cfg, 2)
    arch = (jax.random.uniform(jax.random.PRNGKey(13), (2, spec.vq_dim)) > 0.3
            ).astype(jnp.float32)
    base = model.apply({"params": params}, sample, t, ehs, arch=arch)
    fused = fmodel.apply({"params": params}, sample, t, ehs, arch=arch)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               atol=5e-4, rtol=5e-3)
    g = jax.grad(lambda a: (fmodel.apply({"params": params}, sample, t, ehs, arch=a)
                            .astype(jnp.float32) ** 2).mean())(
        jnp.full((2, spec.vq_dim), 0.8))
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_subpixel_upsample_exact():
    """Subpixel Upsample (4 parity 2x2 convs + pixel shuffle) is EXACTLY the
    nearest-2x + conv3x3 reference path, sharing one parameter tree."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from diffusion_pruning_tpu.models.unet.blocks import Upsample

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 7, 12))
    sub = Upsample(10, subpixel=True)
    ref = Upsample(10, subpixel=False)
    params = sub.init(jax.random.PRNGKey(1), x)["params"]
    assert set(params) == {"conv"} and set(params["conv"]) == {"kernel", "bias"}
    assert params["conv"]["kernel"].shape == (3, 3, 12, 10)
    got = sub.apply({"params": params}, x)
    want = ref.apply({"params": params}, x)
    assert got.shape == want.shape == (2, 10, 14, 10)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_no_rank3_unbatched_dots(tiny, monkeypatch):
    """Round-4 lowering regression: under DPT_DENSE2D=all, every projection
    Dense must contract a RANK-2 LHS (dense_2d flattens the free dims so
    XLA:TPU's batch-windowed-conv lowering of rank-3 (B,S,C)@(C,N) dots is
    unavailable — that lowering is ~70× off roofline in isolation). The
    DEFAULT mode is `off` because the round-4 e2e bracket measured the
    rank-2 view ~4% slower end-to-end (XLA fuses surrounding elementwise
    work into the windowed-conv form — PERFORMANCE.md); this test pins the
    `all` machinery so it stays correct for future re-brackets."""
    from diffusion_pruning_tpu.models.unet import attention
    monkeypatch.setattr(attention, "_DENSE2D_MODE", "all")
    cfg, model, params, spec = tiny
    sample, t, ehs = _inputs(cfg, 2)
    bad = _rank3_unbatched_dots(model, params, sample, t, ehs)
    assert not bad, f"rank-3+ unbatched dots under mode=all: {bad}"
    # and the default really is `off` (rank-3 everywhere = fastest measured)
    monkeypatch.setattr(attention, "_DENSE2D_MODE", "off")
    assert _rank3_unbatched_dots(model, params, sample, t, ehs), \
        "mode=off should apply Denses in rank-3 form"


def _rank3_unbatched_dots(model, params, sample, t, ehs):
    """All (lhs_shape, rhs_shape) pairs of rank-3+ unbatched dot_generals in
    the forward jaxpr (traverses remat/scan/cond subjaxprs)."""
    jaxpr = jax.make_jaxpr(
        lambda p, s, tt, e: model.apply({"params": p}, s, tt, e))(
        params, sample, t, ehs)
    import jax._src.core as jcore
    bad = []
    seen = set()
    stack = [jaxpr.jaxpr]
    while stack:
        jp = stack.pop()
        if id(jp) in seen:
            continue
        seen.add(id(jp))
        for eqn in jp.eqns:
            if eqn.primitive.name == "dot_general":
                (lc, _), (lb, _) = eqn.params["dimension_numbers"]
                lhs_rank = len(eqn.invars[0].aval.shape)
                free = lhs_rank - len(lc) - len(lb)
                if free > 1 and not lb:
                    bad.append((eqn.invars[0].aval.shape,
                                eqn.invars[1].aval.shape))
        stack.extend(jcore.subjaxprs(jp))
    return bad


def test_dense2d_proj_mode(tiny, monkeypatch):
    """`DPT_DENSE2D=proj` keeps EXACTLY the fused-epilogue (GEGLU proj) dots
    rank-3 — every RHS must be a (C, 2·inner) GEGLU projection — and is a
    pure lowering choice: outputs bit-match the `off` default (rank-3
    everywhere), under which `base` is traced here."""
    import numpy as np
    from diffusion_pruning_tpu.models.unet import attention

    cfg, model, params, spec = tiny
    sample, t, ehs = _inputs(cfg, 2)
    base = model.apply({"params": params}, sample, t, ehs)

    monkeypatch.setattr(attention, "_DENSE2D_MODE", "proj")
    r3 = _rank3_unbatched_dots(model, params, sample, t, ehs)
    assert r3, "proj mode should leave the GEGLU proj dots rank-3"
    geglu_rhs = set()
    for block_channels in cfg.block_out_channels:
        geglu_rhs.add((block_channels, 2 * 4 * block_channels))
    for lhs, rhs in r3:
        assert rhs in geglu_rhs, f"non-GEGLU rank-3 dot under proj mode: {lhs}@{rhs}"
    got = model.apply({"params": params}, sample, t, ehs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(base))

    monkeypatch.setattr(attention, "_DENSE2D_MODE", "off")
    assert len(_rank3_unbatched_dots(model, params, sample, t, ehs)) > len(r3)
