"""Head-gated attention and the gated transformer block.

Reproduces the semantics of the reference's `GatedAttention` +
`HeadGatedAttnProcessor2` (/root/reference/pdm/models/unet/blocks.py:132-280):
q, k and v are each multiplied per-head by the same soft gate *before*
scaled-dot-product attention (so soft gates scale the attention logits by g²
and the output by g), and `BasicTransformerBlockWidthGated`
(blocks.py:700-851) with its GEGLU feed-forward gate (blocks.py:24-129).

TPU notes: attention runs through `jax.nn.dot_product_attention` (XLA fused
path; a Pallas flash kernel with the head gate folded into the softmax scale
lives in ops/flash_attention.py and is used when enabled). All shapes static.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffusion_pruning_tpu.ops.gates import channel_gate, head_gate

# Rank-2 projection-view mode, for on-chip A/B (read at trace time; set
# before import/jit):
#   off  (default) plain rank-3 application everywhere — the round-4 e2e
#                  bracket measured this FASTEST (14.03 img/s vs 13.45
#                  proj / 13.52 all at 256px B=8 DDIM-25 CFG, 3 proj
#                  samples within 0.01); see PERFORMANCE.md "dense_2d
#                  e2e bracket".
#   all            every projection Dense contracts a rank-2 LHS
#   proj           rank-2 everywhere EXCEPT dots with a fusable elementwise
#                  epilogue (the GEGLU gelu·mul) — those stay rank-3 so XLA
#                  can fuse the epilogue into the producing GEMM
import os
_DENSE2D_MODE = os.environ.get("DPT_DENSE2D", "off")
if os.environ.get("DPT_DENSE2D_OFF"):  # legacy alias from the first A/B
    _DENSE2D_MODE = "off"
assert _DENSE2D_MODE in ("all", "proj", "off"), _DENSE2D_MODE


def dense_2d(layer: nn.Module, x: jax.Array,
             fused_epilogue: bool = False) -> jax.Array:
    """Apply a Dense through a rank-2 view of a (B, S, C) activation.

    XLA:TPU lowers some rank-3 (B, S, C) @ (C, N) dots at the level-0
    spatial shapes as batch-windowed convolutions (`window={size=B
    pad=(B-1)_(B-1) rhs_reversal=1}`) — B× the MACs of the GEMM, measured
    ~70× off roofline in isolation (round-4 profile + optimized-HLO dump,
    PERFORMANCE.md). A rank-2 LHS has a single free dim, so that lowering
    is unavailable. Same parameters, same math, same checkpoint layout.

    MEASURED NEGATIVE e2e (round-4 bracket, PERFORMANCE.md): despite the
    isolated-dot pathology, the rank-2 view loses ~4% end-to-end at both
    `all` AND `proj` modes (13.45/13.52 vs 14.03 img/s off) — XLA fuses
    enough of the surrounding elementwise work into the windowed-conv
    form that eliminating it is a net loss. Default is therefore `off`;
    the machinery stays for future XLA versions (the isolated lowering
    IS ~70× off roofline — if a later compiler stops fusing around it,
    flip `DPT_DENSE2D=all` and re-bracket).

    `fused_epilogue=True` marks dots whose consumer is a cheap elementwise
    chain XLA fuses into the GEMM (the GEGLU split+gelu+mul): under
    `DPT_DENSE2D=proj` those keep the rank-3 form.
    """
    if _DENSE2D_MODE == "off" or (fused_epilogue and _DENSE2D_MODE == "proj"):
        return layer(x)
    b, s, c = x.shape
    return layer(x.reshape(b * s, c)).reshape(b, s, -1)


class GatedAttention(nn.Module):
    """Multi-head attention with a per-head width gate.

    `active_heads` < heads builds a physically head-pruned projection
    (reference GatedAttention.prune, blocks.py:153-187): q/k/v emit only the
    kept heads, to_out consumes them, output dim unchanged."""
    dim: int
    heads: int
    context_dim: Optional[int] = None  # None = self-attention
    active_heads: Optional[int] = None
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, gate=None):
        b, s, _ = x.shape
        ctx = x if context is None else context
        head_dim = self.dim // self.heads
        heads = self.active_heads if self.active_heads is not None else self.heads
        inner = heads * head_dim
        q = dense_2d(nn.Dense(inner, use_bias=False, dtype=self.dtype,
                              param_dtype=self.param_dtype, name="to_q"), x)
        k = dense_2d(nn.Dense(inner, use_bias=False, dtype=self.dtype,
                              param_dtype=self.param_dtype, name="to_k"), ctx)
        v = dense_2d(nn.Dense(inner, use_bias=False, dtype=self.dtype,
                              param_dtype=self.param_dtype, name="to_v"), ctx)

        q = q.reshape(b, s, heads, head_dim)
        k = k.reshape(b, ctx.shape[1], heads, head_dim)
        v = v.reshape(b, ctx.shape[1], heads, head_dim)

        if self.use_flash:
            # head gate folded into the Pallas kernel (logits·g², out·g)
            from diffusion_pruning_tpu.ops.flash_attention import flash_attention
            from diffusion_pruning_tpu.ops.gates import match_batch
            g = match_batch(gate, b) if gate is not None else None
            # positional args: custom_vjp rejects kwargs; interpret the
            # kernel on non-TPU backends (CPU tests)
            o = flash_attention(q, k, v, g, 512, jax.default_backend() != "tpu")
        else:
            if gate is not None:
                q = head_gate(q, gate)
                k = head_gate(k, gate)
                v = head_gate(v, gate)
            o = jax.nn.dot_product_attention(q, k, v)
        o = o.reshape(b, s, inner)
        return dense_2d(nn.Dense(self.dim, use_bias=True, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="to_out_0"), o)


class GatedGEGLU(nn.Module):
    """GEGLU with a grouped width gate on the inner dim (blocks.py:24-67).

    Both the linear half and the gelu half are masked with the same grouped
    gate before the product, matching the reference exactly (with soft gates
    the product picks up the mask squared)."""
    inner_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, gate=None):
        hg = dense_2d(nn.Dense(2 * self.inner_dim, dtype=self.dtype,
                               param_dtype=self.param_dtype, name="proj"), x,
                      fused_epilogue=True)
        h, g = jnp.split(hg, 2, axis=-1)
        if gate is not None:
            h = channel_gate(h, gate)
            g = channel_gate(g, gate)
        # exact (erf) GELU: diffusers GEGLU uses F.gelu, not the tanh approx
        return h * nn.gelu(g, approximate=False)


class GatedFeedForward(nn.Module):
    """`active_inner` < dim*mult builds the physically pruned GEGLU
    (reference prune_gate/prune, blocks.py:52-67, 121-129)."""
    dim: int
    mult: int = 4
    active_inner: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, gate=None):
        inner = self.active_inner if self.active_inner is not None else self.dim * self.mult
        h = GatedGEGLU(inner, self.dtype, self.param_dtype, name="act")(x, gate)
        return dense_2d(nn.Dense(self.dim, dtype=self.dtype,
                                 param_dtype=self.param_dtype, name="out"), h)


class GatedTransformerBlock(nn.Module):
    """Pre-LN transformer block: self-attn, cross-attn, gated GEGLU FF."""
    dim: int
    heads: int
    context_dim: int
    active_heads1: Optional[int] = None
    active_heads2: Optional[int] = None
    active_ff_inner: Optional[int] = None
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, gate_attn1=None, gate_attn2=None, gate_ff=None):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                       param_dtype=self.param_dtype, name=name)
        x = x + GatedAttention(self.dim, self.heads, None, self.active_heads1,
                               self.use_flash, self.dtype, self.param_dtype,
                               name="attn1")(ln("norm1")(x), None, gate_attn1)
        x = x + GatedAttention(self.dim, self.heads, self.context_dim, self.active_heads2,
                               self.use_flash, self.dtype, self.param_dtype,
                               name="attn2")(ln("norm2")(x), context, gate_attn2)
        x = x + GatedFeedForward(self.dim, active_inner=self.active_ff_inner,
                                 dtype=self.dtype, param_dtype=self.param_dtype,
                                 name="ff")(ln("norm3")(x), gate_ff)
        return x
