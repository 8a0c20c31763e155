import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pruning_tpu.core import build_structure, hard_concrete
from diffusion_pruning_tpu.core.estimators import importance_gumbel_sigmoid_sample, sample_gumbel
from diffusion_pruning_tpu.models.hypernet import HyperStructure, random_arch_vector, transform_structure_vector
from diffusion_pruning_tpu.models.quantizer import StructureQuantizer
from diffusion_pruning_tpu.models.unet.config import UNetConfig


@pytest.fixture(scope="module")
def spec():
    return build_structure(UNetConfig.tiny())


@pytest.fixture(scope="module")
def quantizer(spec):
    return StructureQuantizer(spec, n_e=4, temperature=0.4, base=3.0,
                              depth_order=tuple((-1) ** i * i for i in range(spec.num_depth)))


def test_hypernet_output_and_fusion(spec):
    hn = HyperStructure(spec, input_dim=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 16))
    params = hn.init(jax.random.PRNGKey(1), x)["params"]
    out = hn.apply({"params": params}, x)
    assert out.shape == (3, spec.vq_dim)
    # fused GEMM == per-head loop
    widths = list(spec.width_list) + [spec.num_depth]
    cols = []
    for i, w in enumerate(widths):
        k = np.asarray(params[f"head_{i}_kernel"])
        b = np.asarray(params[f"head_{i}_bias"])
        cols.append(np.asarray(x) @ k + b)
    np.testing.assert_allclose(np.asarray(out), np.concatenate(cols, axis=1), atol=1e-5)


def test_hypernet_single_arch_param(spec):
    hn = HyperStructure(spec, input_dim=16, single_arch_param=True)
    x = jnp.zeros((5, 16))
    params = hn.init(jax.random.PRNGKey(0), x)["params"]
    out = hn.apply({"params": params}, x)
    assert out.shape == (1, spec.vq_dim)
    assert "arch" in params


def test_transform_structure_vector_roundtrip(spec):
    flat = jnp.arange(2 * spec.vq_dim, dtype=jnp.float32).reshape(2, spec.vq_dim)
    parts = transform_structure_vector(spec, flat)
    assert len(parts["width"]) == len(spec.width_list)
    assert len(parts["depth"]) == spec.num_depth
    rebuilt = jnp.concatenate(parts["width"] + [d[:, None] for d in parts["depth"]], axis=1)
    np.testing.assert_array_equal(np.asarray(rebuilt), np.asarray(flat))


def test_random_arch_vector_ratio(spec):
    v = random_arch_vector(jax.random.PRNGKey(0), spec, 0.5)
    assert v.shape == (1, spec.vq_dim)
    start = 0
    for w in spec.width_list:
        kept = float((v[0, start:start + w] > 0.5).sum())
        assert kept == int(0.5 * w)
        start += w
    assert np.all(np.asarray(v[0, spec.num_width:]) == 0.9)


def test_gumbel_trick_shapes_and_rescue(quantizer, spec):
    z = jnp.full((3, spec.vq_dim), -100.0)  # everything pushed off
    gates = quantizer.gumbel_sigmoid_trick(z, jax.random.PRNGKey(0))
    assert gates.shape == (3, spec.vq_dim)
    h = np.asarray(hard_concrete(gates[:, :spec.num_width]))
    start = 0
    for w in spec.width_list:  # every group keeps exactly its first unit
        grp = h[:, start:start + w]
        np.testing.assert_array_equal(grp[:, 0], np.ones(3))
        np.testing.assert_array_equal(grp[:, 1:], np.zeros((3, w - 1)))
        start += w


def test_depth_order_scatter(quantizer, spec):
    """Output slot depth_order[i] must hold the i-th importance-ranked gate."""
    z = jax.random.normal(jax.random.PRNGKey(1), (2, spec.vq_dim))
    key = jax.random.PRNGKey(2)
    gates = quantizer.gumbel_sigmoid_trick(z, key)
    # recompute ranked depth gates with the same key split
    _, kd = jax.random.split(key)
    ranked = importance_gumbel_sigmoid_sample(
        z[:, spec.num_width:], kd, quantizer.temperature, quantizer.base)
    nd = spec.num_depth
    order = [i % nd for i in quantizer.depth_order]
    got = np.asarray(gates[:, spec.num_width:])
    for i, slot in enumerate(order):
        np.testing.assert_allclose(got[:, slot], np.asarray(ranked[:, i]), rtol=1e-5)


def test_width_depth_normalize_semantics(quantizer, spec):
    z = jax.random.uniform(jax.random.PRNGKey(3), (2, spec.vq_dim))
    out = np.asarray(quantizer.width_depth_normalize(z))
    zn = np.asarray(z)
    hard = (zn >= 0.5).astype(np.float32)
    want = hard.copy()
    for sb in spec.subblocks:
        if sb.depth_index < 0:
            continue
        lo = sb.sites[0].start
        hi = sb.sites[-1].start + sb.sites[-1].width
        want[:, lo:hi] = zn[:, lo:hi] * zn[:, [spec.num_width + sb.depth_index]]
    tmpl = np.ones(spec.vq_dim, np.float32)
    for sb in spec.subblocks:
        for s in sb.sites:
            tmpl[s.start:s.start + s.width] = 1.0 / np.sqrt(s.width)
    np.testing.assert_allclose(out, want * tmpl, rtol=1e-5)


def test_forward_train_and_eval(quantizer, spec):
    params = quantizer.init_params(jax.random.PRNGKey(0))
    assert params["embedding"].shape == (4, spec.vq_dim)
    z = jax.random.normal(jax.random.PRNGKey(1), (16, spec.vq_dim))
    z_q, idx, state = quantizer.forward_train(params, z, jax.random.PRNGKey(2))
    assert z_q.shape == (16, spec.vq_dim)
    assert idx.shape == (16,) and int(idx.max()) < 4
    assert float(z_q.min()) >= 0.0 and float(z_q.max()) <= 1.0
    # eval: hard gates from the stored snapshot
    z_q_eval, idx_eval = quantizer.forward_eval(state, z)
    vals = np.unique(np.asarray(z_q_eval))
    assert set(vals).issubset({0.0, 1.0})


def test_forward_train_codebook_gradients(quantizer, spec):
    params = quantizer.init_params(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (8, spec.vq_dim))

    def loss(p):
        z_q, _, _ = quantizer.forward_train(p, z, jax.random.PRNGKey(2))
        return (z_q ** 2).mean()

    g = jax.grad(loss)(params)["embedding"]
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_sinkhorn_assignment_balances(quantizer, spec):
    params = quantizer.init_params(jax.random.PRNGKey(0))
    z = jnp.tile(jax.random.normal(jax.random.PRNGKey(5), (1, spec.vq_dim)), (64, 1))
    z = z + 0.01 * jax.random.normal(jax.random.PRNGKey(6), (64, spec.vq_dim))
    q30 = dataclass_replace(quantizer, sinkhorn_iterations=30)
    _, idx, _ = q30.forward_train(params, z, jax.random.PRNGKey(2))
    counts = np.bincount(np.asarray(idx), minlength=4)
    assert counts.max() < 64  # OT spreads near-identical prompts across codes


def dataclass_replace(obj, **kw):
    import dataclasses
    return dataclasses.replace(obj, **kw)
