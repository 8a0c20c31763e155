"""Differentiable gate estimators.

Functional JAX equivalents of the reference's gumbel-sigmoid / hard-concrete
machinery (see /root/reference/pdm/utils/estimation_utils.py:5-75 for the
semantics being reproduced). All functions are pure: randomness comes from an
explicit PRNG key. The reference's "fixed_seed" evaluation mode (a fresh
torch.Generator seeded with 0) maps to passing a constant key.

Everything here is jit-safe: static shapes, no data-dependent Python control
flow, straight-through estimators via ``lax.stop_gradient``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-20

# Constant key used for deterministic (eval-time) gumbel noise; plays the role
# of the reference's `torch.Generator().manual_seed(0)`.
FIXED_KEY = jax.random.PRNGKey(0)


def sample_gumbel(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """Standard Gumbel(0,1) noise: -log(-log(U + eps) + eps)."""
    u = jax.random.uniform(key, shape, dtype=dtype)
    return -jnp.log(-jnp.log(u + _EPS) + _EPS)


def hard_concrete(x: jax.Array) -> jax.Array:
    """Threshold at 0.5 with a straight-through gradient estimator."""
    h = (x >= 0.5).astype(x.dtype)
    return x + jax.lax.stop_gradient(h - x)


def _force_first_nonzero(y: jax.Array) -> jax.Array:
    """Rescue rows whose hard-concrete mask is all-zero by boosting slot 0.

    Mirrors the reference's `force_width_non_zero` behaviour
    (estimation_utils.py:22-31): if a width group would be pruned entirely,
    add 0.5 to its first element so at least one unit stays alive.
    Vectorised (no data-dependent branch): jit-safe.
    """
    dead = (hard_concrete(y).sum(axis=1) == 0).astype(y.dtype)  # (B,)
    bump = jnp.zeros_like(y).at[:, 0].set(0.5 * dead)
    return y + bump


def gumbel_sigmoid_sample(
    logits: jax.Array,
    key: jax.Array,
    temperature: float,
    offset: float = 0.0,
    force_width_non_zero: bool = False,
) -> jax.Array:
    """Relaxed Bernoulli gate sample: sigmoid((logits + gumbel + offset)/T).

    The (misnamed in the reference) `gumbel_softmax_sample`: an independent
    gumbel-sigmoid per gate unit, with an optional all-zero-row rescue.
    """
    g = sample_gumbel(key, logits.shape, logits.dtype)
    y = jax.nn.sigmoid((logits + g + offset) / temperature)
    if force_width_non_zero:
        y = _force_first_nonzero(y)
    return y


def importance_gumbel_sigmoid_sample(
    logits: jax.Array,
    key: jax.Array,
    temperature: float,
    offset: float = 0.0,
) -> jax.Array:
    """Ordered ("importance") gate sample used for depth gates.

    softmax -> cumsum -> flip -> inverse-sigmoid produces monotonically
    decreasing pre-activations, so after adding gumbel noise the resulting
    gates are (softly) ordered: earlier positions are more likely on. The
    quantizer then scatters them through its `depth_order` permutation.
    """
    x = jax.nn.softmax(logits, axis=1)
    x = jnp.cumsum(x, axis=1)
    x = jnp.flip(x, axis=1)
    eps = 1e-6
    x = jnp.log(x + eps) - jnp.log1p(-(x - eps))
    g = sample_gumbel(key, x.shape, x.dtype)
    return jax.nn.sigmoid((x + g + offset) / temperature)
