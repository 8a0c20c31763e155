"""Pallas TPU flash attention with fused per-head gates.

The reference masks q, k, v tensors per head before SDPA
(HeadGatedAttnProcessor2, /root/reference/pdm/models/unet/blocks.py:250-255)
— three extra HBM-round-trip elementwise multiplies. Here the gate folds
into the kernel: with gate g per (batch, head),

    masked SDPA(q·g, k·g, v·g) == softmax((q·kᵀ)·scale·g²) @ v · g

so the kernel scales the logits by g² and the output by g — zero extra
memory traffic, exact same math (soft or hard gates).

Layout note: kernels consume (B·H, S, D). Mosaic requires the last block dim
to be 128-divisible or the full array dim, so reading d=64 head slabs out of
a fused (B, S, H·D) projection layout is not lowerable — the per-head
transpose is the price of legal tiling (measured: the transposes are cheap
next to the score matmuls; see PERFORMANCE.md).

Backward (round 2, VERDICT r1 #8): the gate chain rule (dq = g·dq') and the
three dgate reductions (Σ dq'∘q + dk'∘k + dv'∘v) are fused INTO the two
backward kernels — partials accumulate across grid steps in a revisited
VMEM output block — so no XLA pass touches attention-sized tensors after
the kernels.

Head-pair packing (round 3): d=64 operand tiles waste half of every 128-lane
vector register and HBM tile. With h ≥ 2, pairs of heads pack on the feature
dim — (B·H/2, S, 128) dense tiles, per-head math via in-register lane
slices — for BOTH inference (VERDICT r2 #3a) and training: the packed
forward emits per-head lse as (B·H/2, 2, n_q, blk) and the packed backward
kernels mirror the unpacked pair. Odd head counts (SD-2.1's h=5 at the
longest sequence) pack the even pairs and run the last head unpacked.

Shapes are SD-sized (S_q ≤ 4096, head_dim 64, S_kv = S_q or 77): k/v for one
(batch, head) fit VMEM, so each kernel is a single-pass softmax over the full
kv extent with a grid over (batch·heads, blocks). f32 accumulation on the
MXU (`preferred_element_type`), bf16 in/out. Exception (round 5): INFERENCE
at s_kv ≥ 2048 uses kv-blocked online-softmax kernels (_attn_kernel2_kv /
_attn_kernel1_kv) — the single-pass score mat forces a 64-row q-block at
s_kv=4096 that starves the MXU M-dim; blocking both extents with the classic
flash recurrence (running m/l/acc in VMEM scratch) restores a 512-row
q-block: −11% isolated, +3.1% e2e at 512px (PERFORMANCE.md round 5).

Dot-operand precision (round 5): by default (`DPT_FLASH_DOTS=native`) the
matmul operands stay in the INPUT dtype — bf16 in the model — which is the
v5e MXU's native rate; only the softmax statistics (max/exp/sum/lse) and
the gate scaling run in f32. The gate chain rule is applied to the f32 dot
RESULTS (g per masked operand participating in each dot) instead of
pre-scaling q/k/v — identical math, and it keeps the big operands bf16.
`DPT_FLASH_DOTS=f32` restores the all-f32 upcast (round ≤4 behavior).
Measured: −21% at the 256px attn1 shape (B=16 S=1024), see PERFORMANCE.md.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Score-mat VMEM budget for block sizing, and an optional explicit Mosaic
# VMEM limit. The DEFAULT budget (6 MB) matches Mosaic's default scoped-VMEM
# window (~16 MB minus buffers); raising the budget only works when the
# limit is raised with it (v5e has 128 MB of VMEM — the default window is
# far below the hardware). Round-4 finding: at s_kv=4096 the default
# shrinks the q-block to 64 rows, strangling the MXU M-dim; see
# benchmarks/flash_bench.py for the measured ladder.
_SCORE_BUDGET = int(float(os.environ.get("DPT_FLASH_SCORE_MB", "6")) * 2**20)
_VMEM_LIMIT = int(float(os.environ.get("DPT_FLASH_VMEM_MB", "0")) * 2**20) or None

# Round-5: dot-operand precision. "native" feeds the MXU the INPUT dtype
# (bf16 in the model) with f32 accumulation — the v5e MXU's native mode;
# the round-4 profile showed every flash site at ~10-12 TFLOP/s, consistent
# with the old always-f32 operand upcast running the matmuls at the f32
# rate. "f32" restores the upcast. Softmax statistics (max/exp/sum/lse)
# stay f32 in both modes; probability/ds mats are cast to the input dtype
# for their dots only in native mode.
_DOT_MODE = os.environ.get("DPT_FLASH_DOTS", "native")


def _dot_in(x):
    """Dot-operand cast: identity under native mode, f32 upcast otherwise."""
    return x if _DOT_MODE == "native" else x.astype(jnp.float32)


def _prob_in(p, ref_dtype):
    """Probability/ds-mat cast for the second-stage dots."""
    return p.astype(ref_dtype) if _DOT_MODE == "native" else p


def _compiler_params():
    if _VMEM_LIMIT is None:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _pick_block(block_q: int, s_q: int, s_kv: int, live_mats: int) -> int:
    """Shrink the q-block so `live_mats` (blk, s_kv) f32 intermediates fit in
    scoped VMEM (~16 MB total; k/v/dk/dv buffers and double-buffered input
    blocks take several MB, so budget ~6 MB for the score-sized mats —
    empirically blk=128 at s_kv=4096 still OOMs inside a large graph)."""
    blk = min(block_q, s_q)
    while blk > 8 and blk * s_kv * 4 * live_mats > _SCORE_BUDGET:
        blk //= 2
    if os.environ.get("DPT_FLASH_DEBUG"):
        import sys
        print(f"# flash: blk={max(blk, 8)} (s_q={s_q} s_kv={s_kv} "
              f"live={live_mats} budget={_SCORE_BUDGET >> 20}MB)",
              file=sys.stderr)
    return max(blk, 8)


def _train_block(block_q: int, s_q: int, s_kv: int) -> int:
    """The SHARED q-block for training forward + dq backward. They must
    agree because lse/delta are stored q-block-granular — (B·H, n_q, blk),
    whose (1, 1, blk) tiles are legal for ANY blk (last block dim equals the
    array dim; a flat (…, 1, S) row would need blk % 128 == 0, which the
    VMEM-constrained 512px backward block of 64 violates)."""
    blk = _pick_block(block_q, s_q, s_kv, live_mats=4)
    assert s_q % blk == 0, (s_q, blk)
    return blk


def _train_block2(block_q: int, s_q: int, s_kv: int) -> int:
    """Shared q-block for the PACKED training forward + dq backward. The
    packed kernels process the two heads SEQUENTIALLY, so at most ~5 score-
    sized mats are live at once (not 8) — live_mats=5 keeps blocks big."""
    blk = _pick_block(block_q, s_q, s_kv, live_mats=5)
    assert s_q % blk == 0, (s_q, blk)
    return blk


def _kv_block(block_q: int, s_kv: int, s_q: int, live_mats: int) -> int:
    """kv-block for the dkv kernels. MUST divide s_kv: a partial final block
    pads k/v with garbage rows whose products leak into the in-kernel dgate
    sums (dk/dv stores past the array edge are dropped, the Σ dk'∘k + dv'∘v
    reductions are not). Real SD kv extents are powers of two or 77; when the
    VMEM-sized pick doesn't divide (77 with a small block_q), fall back to
    the full extent — worst case (77, 4096) f32 mats ×5 ≈ 6.3 MB, in budget."""
    blk = _pick_block(block_q, s_kv, s_q, live_mats)
    if s_kv % blk:
        return s_kv
    return blk


def _attn_kernel(g_ref, q_ref, k_ref, v_ref, o_ref, lse_ref=None, *,
                 scale: float, gated: bool):
    # g: scalar-prefetch (B·H,) in SMEM; q: (1, blk_q, d); k/v: (1, s_kv, d)
    # lse (training only): (1, 1, blk_q) logsumexp of the MASKED scores —
    # the backward kernels rebuild their own score blocks from it; the
    # inference path omits the output entirely (no dead HBM writes).
    q = _dot_in(q_ref[0])
    k = _dot_in(k_ref[0])
    v = _dot_in(v_ref[0])
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * scale
    if gated:
        g = g_ref[pl.program_id(0)].astype(jnp.float32)
        s = s * (g * g)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(_prob_in(p, v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o = o / denom
    if gated:
        o = o * g_ref[pl.program_id(0)].astype(jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)
    if lse_ref is not None:
        # lse rides q-block-granular in a revisited (1, n_q, blk) buffer:
        # each grid step writes ITS row. A (blk, 1) column layout would tile
        # T(8,128) with a 128× lane pad — 72 MB of HBM waste per layer at
        # 1024 tokens, saved as a residual (the round-1 OOM source); and
        # (1, 1, blk) tiles are illegal when blk < 128 or n_q ∤ 8.
        lse_ref[0, pl.program_id(1)] = (m + jnp.log(denom)).reshape(-1)


def _attn_kernel2(g_ref, q_ref, k_ref, v_ref, o_ref, lse_ref=None, *,
                  scale: float, gated: bool, d: int):
    """Two heads packed on the lane dim: blocks are (blk, 2d) with 2d = 128,
    so q/k/v/o tiles are DENSE — the unpacked d=64 layout pads every lane
    64→128, doubling IO bytes on all four operands (VERDICT r2 #3a). The
    score matmuls stay per-head via in-register lane slices; grid rows halve
    (better pipelining), score-mat VMEM doubles (block sizing accounts).
    lse (training): (1, 2, n_q, blk) — one q-block-granular row per head."""
    i = pl.program_id(0)
    q = _dot_in(q_ref[0])   # (blk, 2d)
    k = _dot_in(k_ref[0])   # (s_kv, 2d)
    v = _dot_in(v_ref[0])
    outs = []
    for hh in (0, 1):
        sl = slice(hh * d, (hh + 1) * d)
        s = jax.lax.dot_general(q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if gated:
            g = g_ref[i * 2 + hh].astype(jnp.float32)
            s = s * (g * g)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(_prob_in(p, v.dtype), v[:, sl],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) / denom
        if gated:
            o = o * g_ref[i * 2 + hh].astype(jnp.float32)
        outs.append(o)
        if lse_ref is not None:
            lse_ref[0, hh, pl.program_id(1)] = (m + jnp.log(denom)).reshape(-1)
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def _attn_kernel2_kv(g_ref, q_ref, k_ref, v_ref, o_ref,
                     m0_ref, l0_ref, m1_ref, l1_ref, acc_ref, *,
                     scale: float, gated: bool, d: int, n_kv: int):
    """kv-blocked online-softmax variant of _attn_kernel2 (packed pairs).

    The single-pass kernels hold a full (blk_q, s_kv) score mat, so at
    s_kv=4096 the q-block collapses to 64 rows to fit VMEM — starving the
    MXU's M dim (round-4 profile: the 512px attn1 sites). Here the kv extent
    is blocked too: grid (B·H/2, n_q, n_kv) with kv innermost/sequential,
    carrying the running row-max m, normalizer l and unnormalized output acc
    in VMEM scratch (classic flash recurrence: correct by exp(m_old−m_new)).
    m/l are stored lane-broadcast (all 128 lanes equal) and read back with a
    lane-max — Mosaic has no scalar-column VMEM layout worth using here."""
    i = pl.program_id(0)
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        m0_ref[...] = jnp.full_like(m0_ref, -jnp.inf)
        m1_ref[...] = jnp.full_like(m1_ref, -jnp.inf)
        l0_ref[...] = jnp.zeros_like(l0_ref)
        l1_ref[...] = jnp.zeros_like(l1_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = _dot_in(q_ref[0])   # (blk_q, 2d)
    k = _dot_in(k_ref[0])   # (blk_kv, 2d)
    v = _dot_in(v_ref[0])
    for hh, m_ref, l_ref in ((0, m0_ref, l0_ref), (1, m1_ref, l1_ref)):
        sl = slice(hh * d, (hh + 1) * d)
        s = jax.lax.dot_general(q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if gated:
            g = g_ref[i * 2 + hh].astype(jnp.float32)
            s = s * (g * g)
        m_prev = jnp.max(m_ref[...], axis=-1, keepdims=True)   # (blk_q, 1)
        l_prev = jnp.max(l_ref[...], axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(_prob_in(p, v.dtype), v[:, sl],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_ref[:, sl] = acc_ref[:, sl] * corr + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(kk == n_kv - 1)
    def _fin():
        outs = []
        for hh, l_ref in ((0, l0_ref), (1, l1_ref)):
            sl = slice(hh * d, (hh + 1) * d)
            denom = jnp.max(l_ref[...], axis=-1, keepdims=True)
            o = acc_ref[:, sl] / denom
            if gated:
                o = o * g_ref[i * 2 + hh].astype(jnp.float32)
            outs.append(o)
        o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


# kv-blocked dispatch thresholds (inference only): self-attention extents
# ≥ DPT_FLASH_KV_SPLIT use _attn_kernel2_kv; ≤0 disables. Default ON at
# 2048+: measured −11% isolated / +3.1% e2e at 512px (PERFORMANCE.md q11);
# shorter extents keep the single-pass kernels (q-block already large).
_KV_SPLIT = int(os.environ.get("DPT_FLASH_KV_SPLIT", "2048"))
_KV_BLK = int(os.environ.get("DPT_FLASH_KV_BLK", "2048"))
_KV_QBLK = int(os.environ.get("DPT_FLASH_KV_QBLK", "512"))


def _attn_kernel1_kv(g_ref, q_ref, k_ref, v_ref, o_ref,
                     m_ref, l_ref, acc_ref, *,
                     scale: float, gated: bool, n_kv: int):
    """Single-head kv-blocked online-softmax forward — the odd final head of
    an odd head count (SD-2.1 h=5 at S=4096) runs this instead of the
    q-block-starved single-pass unpacked kernel. Same recurrence as
    _attn_kernel2_kv on (blk, d) tiles."""
    i = pl.program_id(0)
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = _dot_in(q_ref[0])   # (blk_q, d)
    k = _dot_in(k_ref[0])   # (blk_kv, d)
    v = _dot_in(v_ref[0])
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if gated:
        g = g_ref[i].astype(jnp.float32)
        s = s * (g * g)
    m_prev = jnp.max(m_ref[...], axis=-1, keepdims=True)
    l_prev = jnp.max(l_ref[...], axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(_prob_in(p, v.dtype), v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * corr + pv
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(kk == n_kv - 1)
    def _fin():
        denom = jnp.max(l_ref[...], axis=-1, keepdims=True)
        o = acc_ref[...] / denom
        if gated:
            o = o * g_ref[i].astype(jnp.float32)
        o_ref[0] = o.astype(o_ref.dtype)


def _flash_forward_unpacked_kv(q, k, v, gate, interpret):
    """Unpacked (per-head) kv-blocked inference forward. Caller guarantees
    s_q % blk_q == 0 and s_kv % blk_kv == 0."""
    b, s_q, h, d = q.shape
    s_kv = k.shape[1]
    scale = 1.0 / (d ** 0.5)
    gated = gate is not None
    blk_q = min(_KV_QBLK, s_q)
    blk_kv = min(_KV_BLK, s_kv)
    n_kv = pl.cdiv(s_kv, blk_kv)

    def bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qf, kf, vf = bh(q), bh(k), bh(v)
    gf = (gate.astype(jnp.float32).reshape(b * h) if gated
          else jnp.ones((1,), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h, pl.cdiv(s_q, blk_q), n_kv),
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda i, j, kk, g: (i, j, 0)),
            pl.BlockSpec((1, blk_kv, d), lambda i, j, kk, g: (i, kk, 0)),
            pl.BlockSpec((1, blk_kv, d), lambda i, j, kk, g: (i, kk, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, blk_q, d), lambda i, j, kk, g: (i, j, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((blk_q, 128), jnp.float32),   # m (lane-broadcast)
            pltpu.VMEM((blk_q, 128), jnp.float32),   # l
            pltpu.VMEM((blk_q, d), jnp.float32),     # acc
        ],
    )
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
        **({"vmem_limit_bytes": _VMEM_LIMIT} if _VMEM_LIMIT is not None else {}))
    out = pl.pallas_call(
        functools.partial(_attn_kernel1_kv, scale=scale, gated=gated,
                          n_kv=n_kv),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b * h, s_q, d), q.dtype)],
        interpret=interpret,
        compiler_params=params,
    )(gf, qf, kf, vf)[0]
    return out.reshape(b, h, s_q, d).transpose(0, 2, 1, 3)


def _flash_forward_packed2_kv(q, k, v, gate, interpret):
    """Packed-pair inference forward with BOTH extents blocked (see
    _attn_kernel2_kv). Caller guarantees h even, 2d == 128, s_q % blk_q == 0
    and s_kv % blk_kv == 0."""
    b, s_q, h, d = q.shape
    s_kv = k.shape[1]
    scale = 1.0 / (d ** 0.5)
    gated = gate is not None
    h2 = h // 2
    blk_q = min(_KV_QBLK, s_q)
    blk_kv = min(_KV_BLK, s_kv)
    n_q = pl.cdiv(s_q, blk_q)
    n_kv = pl.cdiv(s_kv, blk_kv)

    def pack(x):
        return x.reshape(b, x.shape[1], h2, 2 * d).transpose(0, 2, 1, 3
                                                             ).reshape(b * h2, x.shape[1], 2 * d)

    qf, kf, vf = pack(q), pack(k), pack(v)
    gf = (gate.astype(jnp.float32).reshape(b * h) if gated
          else jnp.ones((1,), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h2, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, blk_q, 2 * d), lambda i, j, kk, g: (i, j, 0)),
            pl.BlockSpec((1, blk_kv, 2 * d), lambda i, j, kk, g: (i, kk, 0)),
            pl.BlockSpec((1, blk_kv, 2 * d), lambda i, j, kk, g: (i, kk, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, blk_q, 2 * d), lambda i, j, kk, g: (i, j, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((blk_q, 128), jnp.float32),   # m0 (lane-broadcast)
            pltpu.VMEM((blk_q, 128), jnp.float32),   # l0
            pltpu.VMEM((blk_q, 128), jnp.float32),   # m1
            pltpu.VMEM((blk_q, 128), jnp.float32),   # l1
            pltpu.VMEM((blk_q, 2 * d), jnp.float32),  # acc (both heads)
        ],
    )
    if _VMEM_LIMIT is not None:
        params = pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
            dimension_semantics=("parallel", "parallel", "arbitrary"))
    else:
        params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))
    out = pl.pallas_call(
        functools.partial(_attn_kernel2_kv, scale=scale, gated=gated, d=d,
                          n_kv=n_kv),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b * h2, s_q, 2 * d), q.dtype)],
        interpret=interpret,
        compiler_params=params,
    )(gf, qf, kf, vf)[0]
    return (out.reshape(b, h2, s_q, 2 * d).transpose(0, 2, 1, 3)
            .reshape(b, s_q, h, d))


def _flash_forward_packed2(q, k, v, gate, block_q, interpret,
                           with_lse: bool = False):
    """Forward with head PAIRS packed on the feature dim. Requires h even
    and 2d == 128. with_lse (training): also emits the per-head masked-score
    logsumexp as (B·H/2, 2, n_q, blk) for the packed backward."""
    b, s_q, h, d = q.shape
    s_kv = k.shape[1]
    if (not with_lse and _KV_SPLIT > 0 and s_kv >= _KV_SPLIT
            and s_kv % min(_KV_BLK, s_kv) == 0
            and s_q % min(_KV_QBLK, s_q) == 0):
        # long-sequence inference: kv-blocked online softmax (big q-blocks)
        return _flash_forward_packed2_kv(q, k, v, gate, interpret), None
    scale = 1.0 / (d ** 0.5)
    gated = gate is not None
    h2 = h // 2

    # (B, S, H, D) -> (B·H/2, S, 2D): (h, d) are contiguous, so the pair
    # concat is a free reshape; only the S transpose moves bytes (same as
    # the unpacked layout, but into dense 128-lane tiles)
    def pack(x):
        return x.reshape(b, x.shape[1], h2, 2 * d).transpose(0, 2, 1, 3
                                                             ).reshape(b * h2, x.shape[1], 2 * d)

    qf, kf, vf = pack(q), pack(k), pack(v)
    # two live score mats per step (one per head) at the same blk; training
    # shares the packed dq backward's block (lse is q-block-granular)
    blk = (_train_block2(block_q, s_q, s_kv) if with_lse
           else _pick_block(block_q, s_q, s_kv, live_mats=4))
    n_q = pl.cdiv(s_q, blk)
    gf = (gate.astype(jnp.float32).reshape(b * h) if gated
          else jnp.ones((1,), jnp.float32))
    out_specs = [pl.BlockSpec((1, blk, 2 * d), lambda i, j, g: (i, j, 0))]
    out_shape = [jax.ShapeDtypeStruct((b * h2, s_q, 2 * d), q.dtype)]
    if with_lse:
        # revisited (1, 2, n_q, blk) block: each grid step writes its two
        # per-head rows; (n_q, blk) trailing dims are legal for any blk
        out_specs.append(pl.BlockSpec((1, 2, n_q, blk),
                                      lambda i, j, g: (i, 0, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((b * h2, 2, n_q, blk),
                                              jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h2, n_q),
        in_specs=[
            pl.BlockSpec((1, blk, 2 * d), lambda i, j, g: (i, j, 0)),
            pl.BlockSpec((1, s_kv, 2 * d), lambda i, j, g: (i, 0, 0)),
            pl.BlockSpec((1, s_kv, 2 * d), lambda i, j, g: (i, 0, 0)),
        ],
        out_specs=out_specs,
    )
    res = pl.pallas_call(
        functools.partial(_attn_kernel2, scale=scale, gated=gated, d=d),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(gf, qf, kf, vf)
    out, lse = res if with_lse else (res[0], None)
    return (out.reshape(b, h2, s_q, 2 * d).transpose(0, 2, 1, 3)
            .reshape(b, s_q, h, d)), lse


def _flash_forward(
    q: jax.Array,                     # (B, S_q, H, D)
    k: jax.Array,                     # (B, S_kv, H, D)
    v: jax.Array,                     # (B, S_kv, H, D)
    gate: Optional[jax.Array] = None,  # (B, H) per-head gates
    block_q: int = 512,
    interpret: bool = False,
    with_lse: bool = True,             # False: inference — no lse output
):
    b, s_q, h, d = q.shape
    s_kv = k.shape[1]
    scale = 1.0 / (d ** 0.5)
    gated = gate is not None
    if not with_lse and h >= 2 and 2 * d == 128:
        if h % 2 == 0:
            return _flash_forward_packed2(q, k, v, gate, block_q, interpret)
        # odd head count (SD-2.1's 320-ch blocks have h=5 at the LONGEST
        # sequence): pack the even pairs, run the last head unpacked, concat.
        # Strictly better than zero-padding a 6th head (+20% attention FLOPs
        # there) — both calls live inside the same jit, no extra dispatch.
        even, _ = _flash_forward_packed2(
            q[:, :, : h - 1], k[:, :, : h - 1], v[:, :, : h - 1],
            None if gate is None else gate[:, : h - 1], block_q, interpret)
        last, _ = _flash_forward(
            q[:, :, h - 1:], k[:, :, h - 1:], v[:, :, h - 1:],
            None if gate is None else gate[:, h - 1:], block_q, interpret,
            with_lse=False)
        return jnp.concatenate([even, last], axis=2), None

    if (not with_lse and _KV_SPLIT > 0 and s_kv >= _KV_SPLIT
            and s_kv % min(_KV_BLK, s_kv) == 0
            and s_q % min(_KV_QBLK, s_q) == 0):
        # long-sequence unpacked inference (odd final head): kv-blocked
        return _flash_forward_unpacked_kv(q, k, v, gate, interpret), None

    # (B, S, H, D) -> (B*H, S, D)
    def bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qf, kf, vf = bh(q), bh(k), bh(v)
    # training must share the backward's q-block (lse is q-block-granular);
    # inference is free to use the bigger block
    blk = (_train_block(block_q, s_q, s_kv) if with_lse
           else _pick_block(block_q, s_q, s_kv, live_mats=2))
    n_q = pl.cdiv(s_q, blk)
    grid = (b * h, n_q)

    # gate rides as a scalar-prefetch array: full (B·H,) in SMEM, indexed by
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
        out_specs=(
            # lse is (B·H, n_q, blk), carried as a full revisited block (its
            # index map ignores j) — every smaller tiling of it is illegal
            # for some training shape (blk=64 at 512px, n_q=2 cross-attn)
            [pl.BlockSpec((1, blk, d), lambda i, j, g: (i, j, 0)),
             pl.BlockSpec((1, n_q, blk), lambda i, j, g: (i, 0, 0))]
            if with_lse else
            [pl.BlockSpec((1, blk, d), lambda i, j, g: (i, j, 0))]
        ),
    )
    out_shape = [jax.ShapeDtypeStruct((b * h, s_q, d), q.dtype)]
    if with_lse:
        out_shape.append(jax.ShapeDtypeStruct((b * h, n_q, blk), jnp.float32))
    res = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, gated=gated),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(gf, qf, kf, vf)
    out, lse = res if with_lse else (res[0], None)
    return out.reshape(b, h, s_q, d).transpose(0, 2, 1, 3), lse


def _flash_bwd_dq_kernel(g_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                         dq_ref, delta_ref, dg_ref, *, scale: float,
                         gated: bool):
    """dq for one (batch·head, q-block): p recomputed from the saved
    logsumexp. Emits δ = rowsum(do∘o) (o rebuilt in-kernel, so the forward
    output need not be kept as a residual in HBM). The gate chain rule
    (dq = g·dq') is applied in-kernel and the q-term of the gate gradient,
    Σ dq'∘q, accumulates across q-blocks in a revisited output block — no
    XLA pass over attention-sized tensors afterwards."""
    # Gate chain rule is applied to the f32 DOT RESULTS (every dot of two
    # masked operands carries g², a dot with one masked operand carries g) —
    # identical math to pre-scaling q/k/v, but the big operands stay in the
    # input dtype so the MXU runs at its native (bf16) rate in native mode.
    gated_g = g_ref[pl.program_id(0)].astype(jnp.float32) if gated else 1.0
    q = _dot_in(q_ref[0])
    k = _dot_in(k_ref[0])
    v = _dot_in(v_ref[0])
    do = _dot_in(do_ref[0])
    # full (n_q, blk) revisited buffer; this step's row → column (blk, 1)
    lse = lse_ref[0, pl.program_id(1)].reshape(-1, 1)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * (
        scale * gated_g * gated_g)
    p = jnp.exp(s - lse)
    # o' = p@(g·v) = g·(p@v) IS the forward output
    o = jax.lax.dot_general(_prob_in(p, v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) * gated_g
    do32 = do.astype(jnp.float32)
    delta = jnp.sum(do32 * o, axis=-1, keepdims=True)     # (blk, 1)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * gated_g
    ds = p * (dp - delta) * scale
    dq_masked = jax.lax.dot_general(_prob_in(ds, k.dtype), k,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32) * gated_g
    delta_ref[0, pl.program_id(1)] = delta.reshape(-1)
    if gated:
        dq_ref[0] = (dq_masked * gated_g).astype(dq_ref.dtype)

        @pl.when(pl.program_id(1) == 0)
        def _init():
            dg_ref[...] = jnp.zeros_like(dg_ref)

        # scalar partial broadcast-added over the (8,128) tile (Mosaic has no
        # scalar VMEM stores); every element accumulates the same sum
        dg_ref[0] = dg_ref[0] + jnp.sum(dq_masked * q.astype(jnp.float32))
    else:
        dq_ref[0] = dq_masked.astype(dq_ref.dtype)
        dg_ref[...] = jnp.zeros_like(dg_ref)


def _flash_bwd_dkv_kernel(g_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, dg_ref, *, scale: float, gated: bool):
    """dk/dv for one (batch·head, kv-block): no cross-step accumulation for
    dk/dv themselves.

    Works in the transposed (blk_kv, s_q) score layout so lse/delta ride as
    (1, s_q) ROW vectors — a (s_q, 1) column block pads its lane dim 1→128
    in VMEM (8 MB of waste at 4096 tokens). Gate chain rule in-kernel; the
    k/v gate-gradient terms Σ dk'∘k + dv'∘v accumulate across kv-blocks in a
    revisited output block."""
    # Same result-side gate scaling as the dq kernel (see its note).
    gated_g = g_ref[pl.program_id(0)].astype(jnp.float32) if gated else 1.0
    q = _dot_in(q_ref[0])                          # (s_q, d)
    k = _dot_in(k_ref[0])                          # (blk_kv, d)
    v = _dot_in(v_ref[0])
    do = _dot_in(do_ref[0])                        # (s_q, d)
    lse = lse_ref[0]                               # (1, s_q)
    delta = delta_ref[0]                           # (1, s_q)

    s_t = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32) * (
        scale * gated_g * gated_g)                                          # (blk_kv, s_q)
    p_t = jnp.exp(s_t - lse)
    dv_masked = jax.lax.dot_general(_prob_in(p_t, do.dtype), do,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)     # (blk_kv, d)
    dp_t = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32) * gated_g  # (blk_kv, s_q)
    ds_t = p_t * (dp_t - delta) * scale
    dk_masked = jax.lax.dot_general(_prob_in(ds_t, q.dtype), q,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32) * gated_g
    if gated:
        dk_ref[0] = (dk_masked * gated_g).astype(dk_ref.dtype)
        dv_ref[0] = (dv_masked * gated_g).astype(dv_ref.dtype)

        @pl.when(pl.program_id(1) == 0)
        def _init():
            dg_ref[...] = jnp.zeros_like(dg_ref)

        dg_ref[0] = dg_ref[0] + (jnp.sum(dk_masked * k.astype(jnp.float32))
                                 + jnp.sum(dv_masked * v.astype(jnp.float32)))
    else:
        dk_ref[0] = dk_masked.astype(dk_ref.dtype)
        dv_ref[0] = dv_masked.astype(dv_ref.dtype)
        dg_ref[...] = jnp.zeros_like(dg_ref)


def _flash_bwd_dq_kernel2(g_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                          dq_ref, delta_ref, dg_ref, *, scale: float,
                          gated: bool, d: int):
    """Packed-pair dq: same math as _flash_bwd_dq_kernel per head, on dense
    (blk, 2d) tiles. lse/delta are (1, 2, n_q, blk); the dgate partials are
    (1, 2, 8, 128) — one revisited tile per head."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    q2 = _dot_in(q_ref[0])       # (blk, 2d)
    k2 = _dot_in(k_ref[0])       # (s_kv, 2d)
    v2 = _dot_in(v_ref[0])
    do2 = _dot_in(do_ref[0])

    if gated:
        @pl.when(j == 0)
        def _init():
            dg_ref[...] = jnp.zeros_like(dg_ref)
    else:
        dg_ref[...] = jnp.zeros_like(dg_ref)

    # result-side gate scaling — see _flash_bwd_dq_kernel's note
    dqs = []
    for hh in (0, 1):
        sl = slice(hh * d, (hh + 1) * d)
        gg = g_ref[i * 2 + hh].astype(jnp.float32) if gated else 1.0
        q = q2[:, sl]
        k = k2[:, sl]
        v = v2[:, sl]
        do = do2[:, sl]
        lse = lse_ref[0, hh, j].reshape(-1, 1)

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * (
            scale * gg * gg)
        p = jnp.exp(s - lse)
        o = jax.lax.dot_general(_prob_in(p, v.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) * gg
        delta = jnp.sum(do.astype(jnp.float32) * o, axis=-1, keepdims=True)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * gg
        ds = p * (dp - delta) * scale
        dq_masked = jax.lax.dot_general(_prob_in(ds, k.dtype), k,
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32) * gg
        delta_ref[0, hh, j] = delta.reshape(-1)
        if gated:
            dqs.append(dq_masked * gg)
            dg_ref[0, hh] = dg_ref[0, hh] + jnp.sum(
                dq_masked * q.astype(jnp.float32))
        else:
            dqs.append(dq_masked)
    dq_ref[0] = jnp.concatenate(dqs, axis=1).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel2(g_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                           delta_ref, dk_ref, dv_ref, dg_ref, *,
                           scale: float, gated: bool, d: int):
    """Packed-pair dk/dv: transposed per-head score layout on dense
    (blk_kv, 2d) tiles; lse/delta ride as (1, 2, s_q) rows."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    q2 = _dot_in(q_ref[0])        # (s_q, 2d)
    k2 = _dot_in(k_ref[0])        # (blk_kv, 2d)
    v2 = _dot_in(v_ref[0])
    do2 = _dot_in(do_ref[0])

    if gated:
        @pl.when(j == 0)
        def _init():
            dg_ref[...] = jnp.zeros_like(dg_ref)
    else:
        dg_ref[...] = jnp.zeros_like(dg_ref)

    # result-side gate scaling — see _flash_bwd_dkv_kernel's note
    dks, dvs = [], []
    for hh in (0, 1):
        sl = slice(hh * d, (hh + 1) * d)
        gg = g_ref[i * 2 + hh].astype(jnp.float32) if gated else 1.0
        q = q2[:, sl]
        k = k2[:, sl]
        v = v2[:, sl]
        do = do2[:, sl]
        lse = lse_ref[0, hh].reshape(1, -1)      # (1, s_q)
        delta = delta_ref[0, hh].reshape(1, -1)

        s_t = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32) * (
            scale * gg * gg)
        p_t = jnp.exp(s_t - lse)
        dv_masked = jax.lax.dot_general(_prob_in(p_t, do.dtype), do,
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
        dp_t = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32) * gg
        ds_t = p_t * (dp_t - delta) * scale
        dk_masked = jax.lax.dot_general(_prob_in(ds_t, q.dtype), q,
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32) * gg
        if gated:
            dks.append(dk_masked * gg)
            dvs.append(dv_masked * gg)
            dg_ref[0, hh] = dg_ref[0, hh] + (
                jnp.sum(dk_masked * k.astype(jnp.float32))
                + jnp.sum(dv_masked * v.astype(jnp.float32)))
        else:
            dks.append(dk_masked)
            dvs.append(dv_masked)
    dk_ref[0] = jnp.concatenate(dks, axis=1).astype(dk_ref.dtype)
    dv_ref[0] = jnp.concatenate(dvs, axis=1).astype(dv_ref.dtype)


def _flash_backward_packed2(q, k, v, gate, lse, do, block_q, interpret):
    """Packed-pair two-kernel backward: identical math to _flash_backward on
    dense 128-lane tiles (half the HBM bytes on q/k/v/do/dq/dk/dv streams,
    half the grid rows). lse arrives (B·H/2, 2, n_q, blk) from the packed
    training forward."""
    b, s_q, h, d = q.shape
    s_kv = k.shape[1]
    scale = 1.0 / (d ** 0.5)
    gated = gate is not None
    h2 = h // 2

    def pack(x):
        return x.reshape(b, x.shape[1], h2, 2 * d).transpose(0, 2, 1, 3
                                                             ).reshape(b * h2, x.shape[1], 2 * d)

    qf, kf, vf, dof = pack(q), pack(k), pack(v), pack(do)
    gf = (gate.astype(jnp.float32).reshape(b * h) if gated
          else jnp.ones((1,), jnp.float32))

    dg_shape = jax.ShapeDtypeStruct((b * h2, 2, 8, 128), jnp.float32)
    dg_spec = pl.BlockSpec((1, 2, 8, 128), lambda i, j, g: (i, 0, 0, 0))

    blk_q = _train_block2(block_q, s_q, s_kv)
    n_q = pl.cdiv(s_q, blk_q)
    assert lse.shape == (b * h2, 2, n_q, blk_q), (lse.shape, n_q, blk_q)
    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h2, n_q),
        in_specs=[
            pl.BlockSpec((1, blk_q, 2 * d), lambda i, j, g: (i, j, 0)),
            pl.BlockSpec((1, s_kv, 2 * d), lambda i, j, g: (i, 0, 0)),
            pl.BlockSpec((1, s_kv, 2 * d), lambda i, j, g: (i, 0, 0)),
            pl.BlockSpec((1, blk_q, 2 * d), lambda i, j, g: (i, j, 0)),
            pl.BlockSpec((1, 2, n_q, blk_q), lambda i, j, g: (i, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, blk_q, 2 * d), lambda i, j, g: (i, j, 0)),
            pl.BlockSpec((1, 2, n_q, blk_q), lambda i, j, g: (i, 0, 0, 0)),
            dg_spec,
        ],
    )
    dqf, deltaf, dgq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel2, scale=scale, gated=gated,
                          d=d),
        grid_spec=dq_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b * h2, s_q, 2 * d), q.dtype),
            jax.ShapeDtypeStruct((b * h2, 2, n_q, blk_q), jnp.float32),
            dg_shape,
        ],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(gf, qf, kf, vf, dof, lse)

    # free row-major reshape to (1, 2, s_q)-consumable rows per head
    lse_row = lse.reshape(b * h2, 2, s_q)
    delta_row = deltaf.reshape(b * h2, 2, s_q)
    blk_kv = _kv_block(block_q, s_kv, s_q, live_mats=5)
    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h2, pl.cdiv(s_kv, blk_kv)),
        in_specs=[
            pl.BlockSpec((1, s_q, 2 * d), lambda i, j, g: (i, 0, 0)),
            pl.BlockSpec((1, blk_kv, 2 * d), lambda i, j, g: (i, j, 0)),
            pl.BlockSpec((1, blk_kv, 2 * d), lambda i, j, g: (i, j, 0)),
            pl.BlockSpec((1, s_q, 2 * d), lambda i, j, g: (i, 0, 0)),
            pl.BlockSpec((1, 2, s_q), lambda i, j, g: (i, 0, 0)),
            pl.BlockSpec((1, 2, s_q), lambda i, j, g: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, blk_kv, 2 * d), lambda i, j, g: (i, j, 0)),
            pl.BlockSpec((1, blk_kv, 2 * d), lambda i, j, g: (i, j, 0)),
            dg_spec,
        ],
    )
    dkf, dvf, dgkv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel2, scale=scale, gated=gated,
                          d=d),
        grid_spec=dkv_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b * h2, s_kv, 2 * d), k.dtype),
            jax.ShapeDtypeStruct((b * h2, s_kv, 2 * d), v.dtype),
            dg_shape,
        ],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(gf, qf, kf, vf, dof, lse_row, delta_row)

    def unpack(x, s):
        return (x.reshape(b, h2, s, 2 * d).transpose(0, 2, 1, 3)
                .reshape(b, s, h, d))

    dq, dk, dv = unpack(dqf, s_q), unpack(dkf, s_kv), unpack(dvf, s_kv)
    if gated:
        dgate = ((dgq[:, :, 0, 0] + dgkv[:, :, 0, 0])
                 .reshape(b, h).astype(gate.dtype))
    else:
        dgate = None
    return dq, dk, dv, dgate


def _flash_backward(q, k, v, gate, lse, do, block_q, interpret):
    """Returns (dq, dk, dv, dgate) for the masked-SDPA semantics.

    Textbook two-kernel flash backward: the forward's logsumexp is saved so
    both kernels recompute only their own score block. The dq kernel also
    rebuilds o and emits δ = rowsum(do∘o) for the dkv kernel — keeping the
    forward output out of the residuals (HBM). Gate chain rule and the dgate
    reductions happen inside the kernels; the only XLA tail on attention-
    sized tensors is the layout transpose back to (B, S, H, D)."""
    b, s_q, h, d = q.shape
    s_kv = k.shape[1]
    scale = 1.0 / (d ** 0.5)
    gated = gate is not None

    def bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qf, kf, vf, dof = bh(q), bh(k), bh(v), bh(do)
    gf = (gate.astype(jnp.float32).reshape(b * h) if gated
          else jnp.ones((1,), jnp.float32))
    lsef = lse  # (b*h, n_q, blk_q) — q-block-granular rows from the forward

    # dgate partial accumulators: one scalar per (batch·head), carried in a
    # revisited (1, 8, 128) VMEM block (the minimal legal TPU tile)
    dg_shape = jax.ShapeDtypeStruct((b * h, 8, 128), jnp.float32)
    dg_spec = pl.BlockSpec((1, 8, 128), lambda i, j, g: (i, 0, 0))

    blk_q = _train_block(block_q, s_q, s_kv)   # == the forward's lse blocking
    n_q = pl.cdiv(s_q, blk_q)
    assert lsef.shape == (b * h, n_q, blk_q), (lsef.shape, n_q, blk_q)
    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h, n_q),
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda i, j, g: (i, j, 0)),
            pl.BlockSpec((1, s_kv, d), lambda i, j, g: (i, 0, 0)),
            pl.BlockSpec((1, s_kv, d), lambda i, j, g: (i, 0, 0)),
            pl.BlockSpec((1, blk_q, d), lambda i, j, g: (i, j, 0)),
            pl.BlockSpec((1, n_q, blk_q), lambda i, j, g: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, blk_q, d), lambda i, j, g: (i, j, 0)),
            pl.BlockSpec((1, n_q, blk_q), lambda i, j, g: (i, 0, 0)),
            dg_spec,
        ],
    )
    dqf, deltaf, dgq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, gated=gated),
        grid_spec=dq_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b * h, s_q, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, n_q, blk_q), jnp.float32),
            dg_shape,
        ],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(gf, qf, kf, vf, dof, lsef)

    # the dkv kernel wants (1, s_q) rows; the q-block-granular buffers are
    # row-major over (n_q, blk) so this is a FREE logical reshape of a tiny
    # (s_q floats per batch·head) array — Mosaic cannot do the sublane→lane
    # merge in-kernel ("unsupported shape cast"), XLA can outside
    lse_row = lsef.reshape(b * h, 1, s_q)
    delta_row = deltaf.reshape(b * h, 1, s_q)
    blk_kv = _kv_block(block_q, s_kv, s_q, live_mats=4)
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
            dg_spec,
        ],
    )
    dkf, dvf, dgkv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, gated=gated),
        grid_spec=dkv_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b * h, s_kv, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, s_kv, d), v.dtype),
            dg_shape,
        ],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(gf, qf, kf, vf, dof, lse_row, delta_row)

    def unbh(x, s):
        return x.reshape(b, h, s, d).transpose(0, 2, 1, 3)

    dq, dk, dv = unbh(dqf, s_q), unbh(dkf, s_kv), unbh(dvf, s_kv)
    if gated:
        dgate = (dgq[:, 0, 0] + dgkv[:, 0, 0]).reshape(b, h).astype(gate.dtype)
    else:
        dgate = None
    return dq, dk, dv, dgate


def _masked_sdpa(q, k, v, gate):
    """Reference semantics (HeadGatedAttnProcessor2): mask q/k/v per head,
    then SDPA — used as the golden cross-check in tests."""
    if gate is not None:
        g = gate[:, None, :, None].astype(q.dtype)
        q, k, v = q * g, k * g, v * g
    return jax.nn.dot_product_attention(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention(q, k, v, gate=None, block_q: int = 512,
                    interpret: bool = False):
    """Head-gated flash attention: Pallas forward + Pallas two-kernel
    backward (gradients flow to q/k/v AND the gate, matching the reference
    exactly — the gate gradient is what trains the hypernet/codebook).

    The primal (inference) path skips the lse output; under jax.grad the
    custom-vjp forward produces it as the backward's only residual beyond
    q/k/v/gate themselves."""
    out, _ = _flash_forward(q, k, v, gate, block_q, interpret, with_lse=False)
    return out


def _pack2_ok(h: int, d: int) -> bool:
    return h >= 2 and 2 * d == 128


def _fa_fwd(q, k, v, gate, block_q, interpret):
    b, s_q, h, d = q.shape
    if _pack2_ok(h, d):
        # round 3: head-pair packing in TRAINING too — even pairs run the
        # packed kernels (dense 128-lane tiles, half the attention IO), an
        # odd final head runs unpacked; residual lse is a (packed, odd) pair
        he = h - (h % 2)
        ge = None if gate is None else gate[:, :he]
        out_e, lse_e = _flash_forward_packed2(q[:, :, :he], k[:, :, :he],
                                              v[:, :, :he], ge, block_q,
                                              interpret, with_lse=True)
        if h % 2:
            qo, ko, vo = q[:, :, he:], k[:, :, he:], v[:, :, he:]
            go = None if gate is None else gate[:, he:]
            out_o, lse_o = _flash_forward(qo, ko, vo, go, block_q, interpret,
                                          with_lse=True)
            out = jnp.concatenate([out_e, out_o], axis=2)
        else:
            out, lse_o = out_e, None
        return out, (q, k, v, gate, (lse_e, lse_o))
    out, lse = _flash_forward(q, k, v, gate, block_q, interpret, with_lse=True)
    return out, (q, k, v, gate, lse)


def _fa_bwd(block_q, interpret, res, g_out):
    q, k, v, gate, lse = res
    b, s_q, h, d = q.shape
    if _pack2_ok(h, d):
        lse_e, lse_o = lse
        he = h - (h % 2)
        ge = None if gate is None else gate[:, :he]
        dq, dk, dv, dg = _flash_backward_packed2(
            q[:, :, :he], k[:, :, :he], v[:, :, :he], ge, lse_e,
            g_out[:, :, :he], block_q, interpret)
        if h % 2:
            go = None if gate is None else gate[:, he:]
            dqo, dko, dvo, dgo = _flash_backward(
                q[:, :, he:], k[:, :, he:], v[:, :, he:], go, lse_o,
                g_out[:, :, he:], block_q, interpret)
            dq = jnp.concatenate([dq, dqo], axis=2)
            dk = jnp.concatenate([dk, dko], axis=2)
            dv = jnp.concatenate([dv, dvo], axis=2)
            if gate is not None:
                dg = jnp.concatenate([dg, dgo], axis=1)
        return dq, dk, dv, dg
    dq, dk, dv, dgate = _flash_backward(q, k, v, gate, lse, do=g_out,
                                        block_q=block_q, interpret=interpret)
    return dq, dk, dv, dgate


flash_attention.defvjp(_fa_fwd, _fa_bwd)
