"""Pallas TPU flash attention with fused per-head gates.

The reference masks q, k, v tensors per head before SDPA
(HeadGatedAttnProcessor2, /root/reference/pdm/models/unet/blocks.py:250-255)
— three extra HBM-round-trip elementwise multiplies. Here the gate folds
into the kernel: with gate g per (batch, head),

    masked SDPA(q·g, k·g, v·g) == softmax((q·kᵀ)·scale·g²) @ v · g

so the kernel scales the logits by g² and the output by g — zero extra
memory traffic, exact same math (soft or hard gates).

Shapes are SD-sized (S_q ≤ 4096, head_dim 64, S_kv = S_q or 77): k/v for one
(batch, head) fit VMEM, so the kernel is a single-pass softmax over the full
kv extent with a grid over (batch·heads, q-blocks). f32 accumulation on the
MXU (`preferred_element_type`), bf16 in/out.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(g_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float, gated: bool):
    # g: scalar-prefetch (B*H,) in SMEM; q: (1, blk_q, d); k/v: (1, s_kv, d)
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * scale
    if gated:
        g = g_ref[pl.program_id(0)].astype(jnp.float32)
        s = s * (g * g)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o = o / denom
    if gated:
        o = o * g_ref[pl.program_id(0)].astype(jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _flash_forward(
    q: jax.Array,                     # (B, S_q, H, D)
    k: jax.Array,                     # (B, S_kv, H, D)
    v: jax.Array,                     # (B, S_kv, H, D)
    gate: Optional[jax.Array] = None,  # (B, H) per-head gates
    block_q: int = 512,
    interpret: bool = False,
) -> jax.Array:
    b, s_q, h, d = q.shape
    s_kv = k.shape[1]
    scale = 1.0 / (d ** 0.5)
    gated = gate is not None

    # (B, S, H, D) -> (B*H, S, D)
    def bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qf, kf, vf = bh(q), bh(k), bh(v)
    blk = min(block_q, s_q)
    grid = (b * h, pl.cdiv(s_q, blk))

    # gate rides as a scalar-prefetch array: full (B*H,) in SMEM, indexed by
    # the grid position (a (1,1)-blocked operand would violate the TPU tile
    # divisibility rules)
    if gated:
        gf = gate.astype(jnp.float32).reshape(b * h)
    else:
        gf = jnp.ones((1,), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            # index maps take the scalar-prefetch ref as a trailing arg
            pl.BlockSpec((1, blk, d), lambda i, j, g: (i, j, 0)),
            pl.BlockSpec((1, s_kv, d), lambda i, j, g: (i, 0, 0)),
            pl.BlockSpec((1, s_kv, d), lambda i, j, g: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, blk, d), lambda i, j, g: (i, j, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, gated=gated),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, s_q, d), q.dtype),
        interpret=interpret,
    )(gf, qf, kf, vf)
    return out.reshape(b, h, s_q, d).transpose(0, 2, 1, 3)


def _masked_sdpa(q, k, v, gate):
    """Reference semantics (HeadGatedAttnProcessor2): mask q/k/v per head,
    then SDPA — used as the differentiable backward of the Pallas forward."""
    if gate is not None:
        g = gate[:, None, :, None].astype(q.dtype)
        q, k, v = q * g, k * g, v * g
    return jax.nn.dot_product_attention(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention(q, k, v, gate=None, block_q: int = 512,
                    interpret: bool = False):
    """Head-gated flash attention: Pallas forward, XLA-recompute backward
    (gradients flow to q/k/v AND the gate, matching the reference exactly —
    the gate gradient is what trains the hypernet/codebook)."""
    return _flash_forward(q, k, v, gate, block_q, interpret)


def _fa_fwd(q, k, v, gate, block_q, interpret):
    return _flash_forward(q, k, v, gate, block_q, interpret), (q, k, v, gate)


def _fa_bwd(block_q, interpret, res, g_out):
    q, k, v, gate = res
    if gate is None:
        _, vjp = jax.vjp(lambda a, b, c: _masked_sdpa(a, b, c, None), q, k, v)
        dq, dk, dv = vjp(g_out)
        return dq, dk, dv, None
    _, vjp = jax.vjp(_masked_sdpa, q, k, v, gate)
    return vjp(g_out)


flash_attention.defvjp(_fa_fwd, _fa_bwd)
