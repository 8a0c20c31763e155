"""HyperStructure: prompt embedding → architecture-vector logits.

Functional equivalent of /root/reference/pdm/models/hypernet/hypernet.py:
one linear head per width group plus a single head for all depth logits,
orthogonal init, optional weight-norm parametrisation, optional
`single_arch_param` mode (a single learned free arch vector — the uni-arch
baseline, hypernet.py:41-44).

TPU design: the reference runs ~70 tiny `nn.Linear`s in a Python loop
(hypernet.py:76). Functionally that is one (input_dim × vq_dim) matmul; we
keep per-head parameters (so weight-norm and checkpoints stay per-group) but
concatenate them into a single fused GEMM at call time — one MXU op instead
of 70 vector ops.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffusion_pruning_tpu.core.structure import StructureSpec


def _orthogonal_rows(key, shape, dtype=jnp.float32):
    # nn.init.orthogonal_ semantics: orthogonal rows for (out, in) matrices,
    # flax stores kernels (in, out) — transpose accordingly.
    return jax.nn.initializers.orthogonal()(key, shape, dtype)


class HyperStructure(nn.Module):
    spec: StructureSpec
    input_dim: int = 768
    weight_norm: bool = False
    linear_bias: bool = True
    single_arch_param: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, input_dim) prompt embeddings → (B, vq_dim) logits."""
        spec = self.spec
        if self.single_arch_param:
            arch = self.param("arch", nn.initializers.normal(1.0), (1, spec.vq_dim))
            return arch.astype(self.dtype)

        widths = list(spec.width_list) + [spec.num_depth]
        kernels, biases = [], []
        for i, w in enumerate(widths):
            k = self.param(f"head_{i}_kernel", _orthogonal_rows, (self.input_dim, w))
            if self.weight_norm:
                g = self.param(f"head_{i}_g", nn.initializers.ones, (w,))
                k = k / (jnp.linalg.norm(k, axis=0, keepdims=True) + 1e-12) * g
            kernels.append(k)
            if self.linear_bias:
                biases.append(self.param(f"head_{i}_bias", nn.initializers.zeros, (w,)))
        kernel = jnp.concatenate(kernels, axis=1).astype(self.dtype)  # (D_in, vq_dim)
        out = x.astype(self.dtype) @ kernel
        if self.linear_bias:
            out = out + jnp.concatenate(biases).astype(self.dtype)
        return out


def transform_structure_vector(spec: StructureSpec, flat: jax.Array) -> dict:
    """Split a flat (B, vq_dim) vector into per-group width slices and scalar
    depth entries (reference transform_structure_vector, hypernet.py:86-101).
    Provided for API parity; the U-Net consumes the flat vector directly."""
    widths = {"width": [], "depth": []}
    start = 0
    for w in spec.width_list:
        widths["width"].append(flat[:, start:start + w])
        start += w
    for i in range(spec.num_depth):
        widths["depth"].append(flat[:, spec.num_width + i])
    return widths


def random_arch_vector(key: jax.Array, spec: StructureSpec, target_ratio: float) -> jax.Array:
    """Random-pruning baseline arch vector (hypernet.py:131-153): each width
    group keeps ⌊ratio·width⌋ random units at 0.9; depth gates all 0.9."""
    cols = []
    for w in spec.width_list:
        key, sub = jax.random.split(key)
        n_keep = int(target_ratio * w)
        perm = jax.random.permutation(sub, w)
        col = jnp.where(jnp.isin(jnp.arange(w), perm[:n_keep]), 0.9, 0.0)
        cols.append(col)
    cols.append(jnp.full((spec.num_depth,), 0.9))
    return jnp.concatenate(cols)[None, :]
