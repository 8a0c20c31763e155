import jax
import jax.numpy as jnp
import numpy as np

from diffusion_pruning_tpu.core import (
    FIXED_KEY,
    gumbel_sigmoid_sample,
    hard_concrete,
    importance_gumbel_sigmoid_sample,
    sample_gumbel,
)


def test_hard_concrete_values_and_ste():
    x = jnp.array([[0.1, 0.5, 0.9, 0.49999]])
    h = hard_concrete(x)
    np.testing.assert_allclose(np.asarray(h), [[0.0, 1.0, 1.0, 0.0]])
    # straight-through: d/dx sum(hard_concrete(x)) == 1 everywhere
    g = jax.grad(lambda v: hard_concrete(v).sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(g))


def test_gumbel_deterministic_with_key():
    a = sample_gumbel(FIXED_KEY, (4, 8))
    b = sample_gumbel(FIXED_KEY, (4, 8))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = sample_gumbel(jax.random.PRNGKey(1), (4, 8))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_gumbel_sigmoid_range_and_offset():
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (16, 32))
    y = gumbel_sigmoid_sample(logits, key, temperature=0.4, offset=3.0)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0
    # large positive offset pushes gates on (base=3 in the SD config)
    assert float(hard_concrete(y).mean()) > 0.5


def test_force_width_non_zero_rescues_dead_rows():
    logits = jnp.full((4, 8), -100.0)
    y = gumbel_sigmoid_sample(logits, FIXED_KEY, 0.4, offset=0.0, force_width_non_zero=True)
    h = hard_concrete(y)
    # only slot 0 is rescued, exactly to 0.5 above the (≈0) soft value
    assert np.all(np.asarray(h[:, 0]) == 1.0)
    assert np.all(np.asarray(h[:, 1:]) == 0.0)


def test_force_width_non_zero_no_change_for_live_rows():
    logits = jnp.full((4, 8), 100.0)
    y0 = gumbel_sigmoid_sample(logits, FIXED_KEY, 0.4, offset=0.0)
    y1 = gumbel_sigmoid_sample(logits, FIXED_KEY, 0.4, offset=0.0, force_width_non_zero=True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1))


def test_importance_gumbel_is_ordered():
    # With uniform logits and a modest temperature the importance transform
    # must produce (softly) decreasing gate values: cumsum+flip gives the
    # first position the full probability mass.
    logits = jnp.zeros((8, 14))
    y = importance_gumbel_sigmoid_sample(logits, FIXED_KEY, temperature=1.0, offset=0.0)
    first = np.asarray(y[:, 0])
    last = np.asarray(y[:, -1])
    assert np.all(first > last)
    # first position has inverse-sigmoid(≈1) ≈ +13.8 — always on
    assert np.all(first > 0.9)


def test_importance_gumbel_formula_matches_numpy():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(4, 6).astype(np.float32))
    key = jax.random.PRNGKey(3)
    got = importance_gumbel_sigmoid_sample(logits, key, temperature=0.4, offset=3.0)
    # replicate with the same gumbel noise
    g = np.asarray(sample_gumbel(key, (4, 6)))
    x = np.asarray(jax.nn.softmax(logits, axis=1))
    x = np.flip(np.cumsum(x, axis=1), axis=1)
    eps = 1e-6
    x = np.log(x + eps) - np.log1p(-(x - eps))
    want = 1.0 / (1.0 + np.exp(-(x + g + 3.0) / 0.4))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)
