"""Differentiable resource (MACs) model.

The reference computes per-prompt MAC usage by walking the module tree and
combining per-block `calc_macs` dicts (blocks.py:384-416 etc., aggregated at
unet_2d_conditional.py:2124-2163). Here the same quantity is a pair of dot
products against coefficient tables precomputed from the `StructureSpec` —
fully jittable, differentiable through the straight-through estimator, and
O(vq_dim) per sample.

Semantics reproduced exactly:
  cur_prunable_macs(sample) =
      Σ_sites  mean(hard(width_gates_site)) * prunable_site * depth_factor
    + Σ_{depth-gated subblocks} nonprunable_sb * hard(depth_gate_sb)
where depth_factor is hard(depth_gate) of the site's subblock (1 if the
subblock is not depth-gated). The resource ratio divides by the all-ones
value (`spec.cur_prunable_macs_dense`), matching trainer.py:1232-1233.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from diffusion_pruning_tpu.core.estimators import hard_concrete
from diffusion_pruning_tpu.core.structure import StructureSpec


@dataclasses.dataclass(frozen=True)
class ResourceModel:
    """Precomputed coefficient tables. Treat as a static (hashable) aux."""
    spec: StructureSpec

    def _tables(self):
        spec = self.spec
        w_coeff = np.zeros(spec.num_width, dtype=np.float32)
        w_depth_idx = np.zeros(spec.num_width, dtype=np.int32)  # 0-based +1; 0 = none
        d_nonprunable = np.zeros(max(spec.num_depth, 1), dtype=np.float32)
        for sb in spec.subblocks:
            for site in sb.sites:
                sl = slice(site.start, site.start + site.width)
                w_coeff[sl] = site.prunable_macs / site.width
                w_depth_idx[sl] = sb.depth_index + 1
            if sb.depth_index >= 0:
                d_nonprunable[sb.depth_index] = sb.nonprunable_macs
        return w_coeff, w_depth_idx, d_nonprunable

    def cur_prunable_macs(self, arch: jax.Array) -> jax.Array:
        """Per-sample MACs under the (soft) gates. arch: (B, vq_dim) -> (B,)."""
        spec = self.spec
        w_coeff, w_depth_idx, d_nonprunable = self._tables()
        w = hard_concrete(arch[:, : spec.num_width])
        if spec.num_depth > 0:
            d = hard_concrete(arch[:, spec.num_width :])
        else:
            d = jnp.ones((arch.shape[0], 1), arch.dtype)
        # depth factor per width slot: 1 where not depth-gated
        d_ext = jnp.concatenate([jnp.ones((arch.shape[0], 1), arch.dtype), d], axis=1)
        dfac = d_ext[:, jnp.asarray(w_depth_idx)]  # (B, num_width)
        macs = jnp.sum(w * dfac * jnp.asarray(w_coeff), axis=1)
        macs = macs + d @ jnp.asarray(d_nonprunable)
        return macs

    def resource_ratio(self, arch: jax.Array) -> jax.Array:
        """Per-sample ratio vs the dense (all-ones) model — in (0, 1]."""
        return self.cur_prunable_macs(arch) / self.spec.cur_prunable_macs_dense

    def actual_pruning_target(self, p: float) -> float:
        """Rescale a total-MACs target onto prunable-MACs space
        (trainer.py:1298-1306): keep-fraction p of *total* MACs requires
        keeping p_actual of the gateable MACs."""
        return float(1.0 - (1.0 - p) * self.spec.total_macs / self.spec.cur_prunable_macs_dense)

    def prunable_macs_template(self) -> np.ndarray:
        """The quantizer's resource-aware normalisation template
        (quantizer.py:252-261): per arch-vector slot, the fraction of global
        prunable MACs its gate site controls; depth slots get their
        subblock's total site fraction."""
        spec = self.spec
        total_prunable = spec.prunable_macs
        out = np.zeros(spec.vq_dim, dtype=np.float32)
        for sb in spec.subblocks:
            for site in sb.sites:
                frac = site.prunable_macs / total_prunable
                out[site.start : site.start + site.width] = frac
            if sb.depth_index >= 0:
                out[spec.num_width + sb.depth_index] = sb.prunable_macs / total_prunable
        return out

    def block_utilization(self, arch: jax.Array) -> jax.Array:
        """Per-subblock keep fraction (B, num_subblocks) for logging —
        the reference's get_block_utilization heatmap input."""
        spec = self.spec
        cols = []
        W = spec.num_width
        for sb in spec.subblocks:
            if sb.kind == "resnet":
                site = sb.sites[0]
                u = hard_concrete(arch[:, site.start : site.start + site.width]).mean(axis=1)
            else:
                num = 0.0
                den = 0.0
                for site in sb.sites:
                    r = hard_concrete(arch[:, site.start : site.start + site.width]).mean(axis=1)
                    num = num + r * site.prunable_macs
                    den = den + site.prunable_macs
                u = num / den
            if sb.depth_index >= 0:
                u = u * hard_concrete(arch[:, W + sb.depth_index])
            cols.append(u)
        return jnp.stack(cols, axis=1)
