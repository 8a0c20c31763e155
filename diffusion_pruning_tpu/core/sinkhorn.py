"""Sinkhorn optimal-transport assignment for the architecture codebook.

TPU-native equivalent of the reference's `distributed_sinkhorn`
(/root/reference/pdm/models/vq/quantizer.py:273-340): the NCCL
`dist.all_reduce` calls become `lax.psum` over a named mesh axis, so the whole
balancing loop lives inside one jitted train step and the collectives ride
ICI. The non-distributed variant is the same code with the psum elided.

Q is (K, B_local); the algorithm alternately normalises rows (prototype mass
1/K, summed across devices) and columns (sample mass 1/B_global).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sinkhorn(
    scores: jax.Array,
    epsilon: float = 0.05,
    iterations: int = 3,
    axis_name: Optional[str] = None,
    axis_size: int = 1,
) -> jax.Array:
    """Balanced assignment matrix from a (B_local, K) score matrix.

    Args:
      scores: cosine similarities between samples and codebook entries.
      epsilon: entropic regulariser.
      iterations: number of row/column normalisation rounds.
      axis_name: mesh axis to psum over; None = single-device semantics.
      axis_size: number of devices on `axis_name` (static), so that the
        global batch B = B_local * axis_size.

    Returns:
      (B_local, K) assignment weights whose rows sum to 1.
    """
    def allsum(x):
        if axis_name is None:
            return x
        return jax.lax.psum(x, axis_name)

    # subtract the global max before exp: a constant shift cancels in the
    # row/column normalisations but prevents overflow at small epsilon
    # (the reference exponentiates raw scores — quantizer.py:279 — which
    # overflows float32 for score/epsilon > ~88)
    smax = jnp.max(scores)
    if axis_name is not None:
        smax = jax.lax.pmax(smax, axis_name)
    q = jnp.exp((scores - smax) / epsilon).T  # (K, B_local)
    k = q.shape[0]
    b = q.shape[1] * (axis_size if axis_name is not None else 1)

    q = q / allsum(jnp.sum(q))

    tiny = jnp.finfo(q.dtype).tiny

    def body(_, q):
        row = allsum(jnp.sum(q, axis=1, keepdims=True))
        q = q / jnp.maximum(row, tiny) / k
        q = q / jnp.maximum(jnp.sum(q, axis=0, keepdims=True), tiny) / b
        return q

    q = jax.lax.fori_loop(0, iterations, body, q)
    q = q * b  # columns sum to 1: a (soft) assignment
    return q.T


def sinkhorn_assign(
    scores: jax.Array,
    epsilon: float = 0.05,
    iterations: int = 3,
    axis_name: Optional[str] = None,
    axis_size: int = 1,
) -> jax.Array:
    """Hard codebook indices (B_local,) from the Sinkhorn assignment."""
    q = sinkhorn(scores, epsilon, iterations, axis_name, axis_size)
    return jnp.argmax(q, axis=-1)
