"""Functional gate application.

The reference's `VirtualGate` modules (/root/reference/pdm/models/unet/
gates.py) hold mutable `(B, width)` tensors and broadcast-multiply them over
channels. Here gates are plain function arguments: a `(B, width)` slice of
the flat architecture vector, expanded over the channels it controls with a
static `jnp.repeat`. XLA fuses these multiplies into the producing
conv/matmul epilogues, so on TPU they are effectively free.

Layout note: we are NHWC (TPU-native); channel masks broadcast over the
leading spatial dims instead of trailing ones as in the reference's NCHW.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def match_batch(gate: jax.Array, batch: int) -> jax.Array:
    """Tile gate rows if the activation batch is a multiple of the gate batch.

    Handles classifier-free-guidance doubling (gates computed for B prompts,
    activations are 2B: [uncond, cond]) — gates.py:17-19.
    """
    if gate.shape[0] == batch:
        return gate
    if batch % gate.shape[0] != 0:
        raise ValueError(f"batch {batch} not a multiple of gate batch {gate.shape[0]}")
    return jnp.tile(gate, (batch // gate.shape[0],) + (1,) * (gate.ndim - 1))


def channel_mask(gate: jax.Array, c: int, batch: int) -> jax.Array:
    """Expand a grouped gate to a per-channel (batch, C) mask.

    Gate unit g covers the contiguous channel slab [g*C/width, (g+1)*C/width)
    — aligned with GroupNorm groups, exactly like the reference's
    repeat_interleave (gates.py:16, 50). CFG batch tiling included."""
    width = gate.shape[-1]
    mask = jnp.repeat(gate, c // width, axis=-1)  # (B, C)
    return match_batch(mask, batch)


def channel_gate(x: jax.Array, gate: jax.Array) -> jax.Array:
    """Mask the trailing channel dim of x with a grouped gate.

    x: (..., C); gate: (B, width) with C % width == 0."""
    c = x.shape[-1]
    mask = channel_mask(gate, c, x.shape[0])
    return x * mask.reshape(mask.shape[0], *([1] * (x.ndim - 2)), c).astype(x.dtype)


def head_gate(x: jax.Array, gate: jax.Array) -> jax.Array:
    """Mask attention heads. x: (B, S, h, d); gate: (B, h)."""
    g = match_batch(gate, x.shape[0])
    return x * g[:, None, :, None].astype(x.dtype)


def depth_lerp(gate: jax.Array, identity: jax.Array, out: jax.Array) -> jax.Array:
    """Depth gate: (1-m)*identity + m*out, m per sample (gates.py:36-42)."""
    m = match_batch(gate.reshape(-1), out.shape[0])
    m = m.reshape(-1, *([1] * (out.ndim - 1))).astype(out.dtype)
    return (1.0 - m) * identity + m * out
