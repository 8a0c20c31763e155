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


def _pick_block(block_q: int, s_q: int, s_kv: int, live_mats: int) -> int:
    """Shrink the q-block so `live_mats` (blk, s_kv) f32 intermediates fit in
    scoped VMEM (~16 MB total; k/v/dk/dv buffers and double-buffered input
    blocks take several MB, so budget ~6 MB for the score-sized mats —
    empirically blk=128 at s_kv=4096 still OOMs inside a large graph)."""
    blk = min(block_q, s_q)
    while blk > 8 and blk * s_kv * 4 * live_mats > 6 * 1024 * 1024:
        blk //= 2
    return max(blk, 8)


def _attn_kernel(g_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                 gated: bool):
    # g: scalar-prefetch (B*H,) in SMEM; q: (1, blk_q, d); k/v: (1, s_kv, d)
    # lse: (1, blk_q, 1) logsumexp of the MASKED scores — the backward
    # kernels rebuild their own score blocks from it.
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
    lse_ref[0] = m + jnp.log(denom)


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
    blk = _pick_block(block_q, s_q, s_kv, live_mats=2)
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
        out_specs=[
            pl.BlockSpec((1, blk, d), lambda i, j, g: (i, j, 0)),
            pl.BlockSpec((1, blk, 1), lambda i, j, g: (i, j, 0)),
        ],
    )
    out, lse = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, gated=gated),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b * h, s_q, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, s_q, 1), jnp.float32),
        ],
        interpret=interpret,
    )(gf, qf, kf, vf)
    return out.reshape(b, h, s_q, d).transpose(0, 2, 1, 3), lse


def _flash_bwd_dq_kernel(g_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                         dq_ref, delta_ref, *, scale: float, gated: bool):
    """dq for one (batch·head, q-block): p recomputed from the saved
    logsumexp. Also emits δ = rowsum(do∘o) (o rebuilt in-kernel, so the
    forward output need not be kept as a residual in HBM)."""
    g = g_ref[pl.program_id(0)].astype(jnp.float32) if gated else 1.0
    q = q_ref[0].astype(jnp.float32) * g
    k = k_ref[0].astype(jnp.float32) * g
    v = v_ref[0].astype(jnp.float32) * g
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]                     # (blk, 1) f32

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse)
    # v is already masked (v' = g·v), so o = p@v' IS the forward output
    o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    delta = jnp.sum(do * o, axis=-1, keepdims=True)       # (blk, 1)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta) * scale
    dq_ref[0] = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ).astype(dq_ref.dtype)
    delta_ref[0] = delta


def _flash_bwd_dkv_kernel(g_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, *, scale: float, gated: bool):
    """dk/dv for one (batch·head, kv-block): no cross-step accumulation.

    Works in the transposed (blk_kv, s_q) score layout so lse/delta ride as
    (1, s_q) ROW vectors — a (s_q, 1) column block pads its lane dim 1→128
    in VMEM (8 MB of waste at 4096 tokens)."""
    g = g_ref[pl.program_id(0)].astype(jnp.float32) if gated else 1.0
    q = q_ref[0].astype(jnp.float32) * g           # (s_q, d)
    k = k_ref[0].astype(jnp.float32) * g           # (blk_kv, d)
    v = v_ref[0].astype(jnp.float32) * g
    do = do_ref[0].astype(jnp.float32)             # (s_q, d)
    lse = lse_ref[0]                               # (1, s_q)
    delta = delta_ref[0]                           # (1, s_q)

    s_t = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32) * scale  # (blk_kv, s_q)
    p_t = jnp.exp(s_t - lse)
    dv_ref[0] = jax.lax.dot_general(p_t, do, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ).astype(dv_ref.dtype)                 # (blk_kv, d)
    dp_t = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)          # (blk_kv, s_q)
    ds_t = p_t * (dp_t - delta) * scale
    dk_ref[0] = jax.lax.dot_general(ds_t, q, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ).astype(dk_ref.dtype)


def _flash_backward(q, k, v, gate, lse, do, block_q, interpret):
    """Returns (dq, dk, dv, dgate) for the masked-SDPA semantics.

    Textbook two-kernel flash backward: the forward's logsumexp is saved so
    both kernels recompute only their own score block. The dq kernel also
    rebuilds o and emits δ = rowsum(do∘o) for the dkv kernel — keeping the
    forward output out of the residuals (HBM)."""
    b, s_q, h, d = q.shape
    s_kv = k.shape[1]
    scale = 1.0 / (d ** 0.5)
    gated = gate is not None

    def bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qf, kf, vf, dof = bh(q), bh(k), bh(v), bh(do)
    gf = (gate.astype(jnp.float32).reshape(b * h) if gated
          else jnp.ones((1,), jnp.float32))
    lsef = lse  # (b*h, s_q, 1)

    blk_q = _pick_block(block_q, s_q, s_kv, live_mats=4)
    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h, pl.cdiv(s_q, blk_q)),
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda i, j, g: (i, j, 0)),
            pl.BlockSpec((1, s_kv, d), lambda i, j, g: (i, 0, 0)),
            pl.BlockSpec((1, s_kv, d), lambda i, j, g: (i, 0, 0)),
            pl.BlockSpec((1, blk_q, d), lambda i, j, g: (i, j, 0)),
            pl.BlockSpec((1, blk_q, 1), lambda i, j, g: (i, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, blk_q, d), lambda i, j, g: (i, j, 0)),
            pl.BlockSpec((1, blk_q, 1), lambda i, j, g: (i, j, 0)),
        ],
    )
    dqp, deltaf = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, gated=gated),
        grid_spec=dq_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b * h, s_q, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, s_q, 1), jnp.float32),
        ],
        interpret=interpret,
    )(gf, qf, kf, vf, dof, lsef)

    lse_row = lsef.reshape(b * h, 1, s_q)
    delta_row = deltaf.reshape(b * h, 1, s_q)
    blk_kv = _pick_block(block_q, s_kv, s_q, live_mats=4)
    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h, pl.cdiv(s_kv, blk_kv)),
        in_specs=[
            pl.BlockSpec((1, s_q, d), lambda i, j, g: (i, 0, 0)),
            pl.BlockSpec((1, blk_kv, d), lambda i, j, g: (i, j, 0)),
            pl.BlockSpec((1, blk_kv, d), lambda i, j, g: (i, j, 0)),
            pl.BlockSpec((1, s_q, d), lambda i, j, g: (i, 0, 0)),
            pl.BlockSpec((1, 1, s_q), lambda i, j, g: (i, 0, 0)),
            pl.BlockSpec((1, 1, s_q), lambda i, j, g: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, blk_kv, d), lambda i, j, g: (i, j, 0)),
            pl.BlockSpec((1, blk_kv, d), lambda i, j, g: (i, j, 0)),
        ],
    )
    dkp, dvp = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, gated=gated),
        grid_spec=dkv_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b * h, s_kv, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, s_kv, d), jnp.float32),
        ],
        interpret=interpret,
    )(gf, qf, kf, vf, dof, lse_row, delta_row)

    def unbh(x, s):
        return x.reshape(b, h, s, d).transpose(0, 2, 1, 3)

    dqp, dkp, dvp = unbh(dqp, s_q), unbh(dkp, s_kv), unbh(dvp, s_kv)
    # chain rule through the per-head masks: x' = g·x
    if gated:
        gb = gate[:, None, :, None].astype(jnp.float32)
        dq = (dqp * gb).astype(q.dtype)
        dk = (dkp * gb).astype(k.dtype)
        dv = (dvp * gb).astype(v.dtype)
        # NB: q has s_q rows but k/v have s_kv (cross-attention) — reduce
        # each term separately
        dgate = (jnp.sum(dqp * q.astype(jnp.float32), axis=(1, 3))
                 + jnp.sum(dkp * k.astype(jnp.float32), axis=(1, 3))
                 + jnp.sum(dvp * v.astype(jnp.float32), axis=(1, 3)))
        dgate = dgate.astype(gate.dtype)
    else:
        dq, dk, dv, dgate = (dqp.astype(q.dtype), dkp.astype(k.dtype),
                             dvp.astype(v.dtype), None)
    return dq, dk, dv, dgate


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
    """Head-gated flash attention: Pallas forward + Pallas two-kernel
    backward (gradients flow to q/k/v AND the gate, matching the reference
    exactly — the gate gradient is what trains the hypernet/codebook)."""
    out, _ = _flash_forward(q, k, v, gate, block_q, interpret)
    return out


def _fa_fwd(q, k, v, gate, block_q, interpret):
    out, lse = _flash_forward(q, k, v, gate, block_q, interpret)
    return out, (q, k, v, gate, lse)


def _fa_bwd(block_q, interpret, res, g_out):
    q, k, v, gate, lse = res
    dq, dk, dv, dgate = _flash_backward(q, k, v, gate, lse, g_out,
                                        block_q, interpret)
    return dq, dk, dv, dgate


flash_attention.defvjp(_fa_fwd, _fa_bwd)
