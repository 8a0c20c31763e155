"""Pallas flash-attention kernel vs the reference head-gated SDPA semantics.

Runs in interpreter mode on the CPU test platform; the same kernel compiles
natively on TPU (exercised by bench/e2e runs).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pruning_tpu.ops.flash_attention import flash_attention


def _reference_sdpa(q, k, v, gate=None):
    """Masked-q/k/v attention exactly as the reference processor does."""
    if gate is not None:
        g = gate[:, None, :, None]
        q, k, v = q * g, k * g, v * g
    return jax.nn.dot_product_attention(q, k, v)


@pytest.mark.parametrize("s_q,s_kv", [(64, 64), (64, 77)])
def test_flash_matches_sdpa_ungated(s_q, s_kv):
    key = jax.random.PRNGKey(0)
    b, h, d = 2, 4, 64
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, s_q, h, d))
    k = jax.random.normal(ks[1], (b, s_kv, h, d))
    v = jax.random.normal(ks[2], (b, s_kv, h, d))
    got = flash_attention(q, k, v, interpret=True)
    want = _reference_sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_flash_matches_sdpa_with_soft_gates():
    key = jax.random.PRNGKey(1)
    b, s, h, d = 2, 64, 4, 64
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (b, s, h, d))
    k = jax.random.normal(ks[1], (b, s, h, d))
    v = jax.random.normal(ks[2], (b, s, h, d))
    gate = jax.random.uniform(ks[3], (b, h))
    got = flash_attention(q, k, v, gate=gate, interpret=True)
    want = _reference_sdpa(q, k, v, gate)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_flash_hard_gate_zeroes_heads():
    key = jax.random.PRNGKey(2)
    b, s, h, d = 1, 64, 4, 64
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, s, h, d))
    k = jax.random.normal(ks[1], (b, s, h, d))
    v = jax.random.normal(ks[2], (b, s, h, d))
    gate = jnp.asarray([[1.0, 0.0, 1.0, 0.0]])
    got = np.asarray(flash_attention(q, k, v, gate=gate, interpret=True))
    assert np.abs(got[:, :, 1]).max() == 0.0
    assert np.abs(got[:, :, 3]).max() == 0.0
    want = _reference_sdpa(q, k, v, gate)
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-5, rtol=1e-4)


def test_flash_multi_qblock_grid():
    key = jax.random.PRNGKey(3)
    b, s, h, d = 1, 256, 2, 64
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, s, h, d))
    k = jax.random.normal(ks[1], (b, s, h, d))
    v = jax.random.normal(ks[2], (b, s, h, d))
    got = flash_attention(q, k, v, block_q=64, interpret=True)
    want = _reference_sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_flash_gradients_match_masked_sdpa():
    """Custom VJP: grads through the Pallas forward equal the reference
    masked-SDPA grads, including the head-gate gradient."""
    key = jax.random.PRNGKey(5)
    b, s, h, d = 1, 16, 2, 64
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (b, s, h, d))
    k = jax.random.normal(ks[1], (b, s, h, d))
    v = jax.random.normal(ks[2], (b, s, h, d))
    gate = jax.random.uniform(ks[3], (b, h)) * 0.8 + 0.1

    def loss_flash(q, k, v, g):
        return (flash_attention(q, k, v, g, 512, True) ** 2).sum()

    def loss_ref(q, k, v, g):
        gg = g[:, None, :, None]
        return (jax.nn.dot_product_attention(q * gg, k * gg, v * gg) ** 2).sum()

    got = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, gate)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, gate)
    for g1, g2, name in zip(got, want, "qkvg"):
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=1e-4, rtol=1e-3, err_msg=name)


def test_flash_backward_multi_qblock_accumulation():
    """dk/dv accumulate across q-blocks in their output blocks — verify with
    s_q spanning 4 blocks."""
    key = jax.random.PRNGKey(8)
    b, s, h, d = 1, 256, 2, 64
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (b, s, h, d))
    k = jax.random.normal(ks[1], (b, s, h, d))
    v = jax.random.normal(ks[2], (b, s, h, d))
    gate = jax.random.uniform(ks[3], (b, h)) * 0.8 + 0.1

    def loss_flash(q, k, v, g):
        return (flash_attention(q, k, v, g, 64, True) ** 2).sum()

    def loss_ref(q, k, v, g):
        gg = g[:, None, :, None]
        return (jax.nn.dot_product_attention(q * gg, k * gg, v * gg) ** 2).sum()

    got = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, gate)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, gate)
    for g1, g2, name in zip(got, want, "qkvg"):
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=5e-4, rtol=1e-3, err_msg=name)


def test_flash_backward_cross_attention():
    """Cross-attention (s_q != s_kv) gradients — the dgate reduction must not
    mix the two sequence lengths."""
    key = jax.random.PRNGKey(9)
    b, sq, skv, h, d = 1, 64, 77, 2, 64
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (b, sq, h, d))
    k = jax.random.normal(ks[1], (b, skv, h, d))
    v = jax.random.normal(ks[2], (b, skv, h, d))
    gate = jax.random.uniform(ks[3], (b, h)) * 0.8 + 0.1

    def loss_flash(q, k, v, g):
        return (flash_attention(q, k, v, g, 512, True) ** 2).sum()

    def loss_ref(q, k, v, g):
        gg = g[:, None, :, None]
        return (jax.nn.dot_product_attention(q * gg, k * gg, v * gg) ** 2).sum()

    got = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, gate)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, gate)
    for g1, g2, name in zip(got, want, "qkvg"):
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=5e-4, rtol=1e-3, err_msg=name)
