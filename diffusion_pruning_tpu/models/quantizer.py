"""StructureVectorQuantizer: the K-expert architecture codebook + router.

TPU-native re-implementation of /root/reference/pdm/models/vq/quantizer.py.
A (K, vq_dim) codebook of architecture codes is trained jointly with the
hypernet; prompts are assigned to codes by Sinkhorn optimal transport during
training (collectives via `lax.psum`, see core/sinkhorn.py) and by cosine
similarity against a frozen gumbel-sigmoid snapshot (`embedding_gs`) at eval.

Design differences from the reference (semantics preserved):
  * pure functions over an explicit (params, state) pair — `embedding_gs` is
    returned state, not a mutated buffer;
  * the per-width-group "force non-zero" rescue is vectorised with segment
    sums instead of a Python loop over ~70 groups (quantizer.py:209-211);
  * the depth-order scatter is a precomputed permutation index.

All methods are jit-safe and differentiable where the reference is (z_q
carries gradients into the codebook through the gumbel-sigmoid).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from diffusion_pruning_tpu.core.estimators import (
    FIXED_KEY,
    hard_concrete,
    importance_gumbel_sigmoid_sample,
    sample_gumbel,
)
from diffusion_pruning_tpu.core.resource import ResourceModel
from diffusion_pruning_tpu.core.sinkhorn import sinkhorn
from diffusion_pruning_tpu.core.structure import StructureSpec


@dataclasses.dataclass(frozen=True)
class StructureQuantizer:
    spec: StructureSpec
    n_e: int = 8
    temperature: float = 0.4
    base: float = 2.0                    # logit offset ("quantizer_base")
    depth_order: Optional[Tuple[int, ...]] = None
    non_zero_width: bool = True
    sinkhorn_epsilon: float = 0.05
    sinkhorn_iterations: int = 3
    resource_aware_normalization: bool = False
    optimal_transport: bool = True

    # ---------------- static tables ----------------

    @property
    def vq_dim(self) -> int:
        return self.spec.vq_dim

    def _depth_perm(self) -> np.ndarray:
        """Scatter permutation: output slot depth_order[i] receives the i-th
        importance-ranked sample (quantizer.py:205-206). Stored as a gather
        index: out = ranked[inv_perm]."""
        nd = self.spec.num_depth
        order = self.depth_order if self.depth_order is not None else tuple(range(nd))
        order = [i % nd for i in order]
        inv = np.empty(nd, dtype=np.int32)
        inv[np.asarray(order)] = np.arange(nd)
        return inv

    def _group_ids(self) -> np.ndarray:
        """Width-group id per width-logit slot."""
        gids = np.zeros(self.spec.num_width, dtype=np.int32)
        g = 0
        for sb in self.spec.subblocks:
            for site in sb.sites:
                gids[site.start: site.start + site.width] = g
                g += 1
        return gids

    def _group_first_slot(self) -> np.ndarray:
        mask = np.zeros(self.spec.num_width, dtype=np.float32)
        for sb in self.spec.subblocks:
            for site in sb.sites:
                mask[site.start] = 1.0
        return mask

    def _normalize_template(self) -> np.ndarray:
        """1/√group_size per width slot, 1 for depth slots
        (quantizer.py:72-74, 246)."""
        t = np.ones(self.vq_dim, dtype=np.float32)
        for sb in self.spec.subblocks:
            for site in sb.sites:
                t[site.start: site.start + site.width] = 1.0 / np.sqrt(site.width)
        return t

    # ---------------- params ----------------

    def init_params(self, key: jax.Array) -> dict:
        emb = jax.nn.initializers.orthogonal()(key, (self.n_e, self.vq_dim))
        return {"embedding": emb}

    def init_state(self, params: dict) -> dict:
        return {"embedding_gs": self.gumbel_sigmoid_trick(params["embedding"], FIXED_KEY)}

    # ---------------- core transforms ----------------

    def gumbel_sigmoid_trick(self, z: jax.Array, key: Optional[jax.Array] = None) -> jax.Array:
        """Logits → soft gates. Width logits get independent gumbel-sigmoids
        (with the all-zero-group rescue); depth logits get the importance-
        ordered sample scattered through `depth_order` (quantizer.py:196-215).
        key=None reproduces the reference's fixed-seed eval determinism."""
        spec = self.spec
        if key is None:
            key = FIXED_KEY
        kw, kd = jax.random.split(key)
        z = jnp.asarray(z)
        zw = z[:, : spec.num_width]
        zd = z[:, spec.num_width:]

        g = sample_gumbel(kw, zw.shape, zw.dtype)
        yw = jax.nn.sigmoid((zw + g + self.base) / self.temperature)
        if self.non_zero_width:
            gids = jnp.asarray(self._group_ids())
            n_groups = len(self.spec.width_list)
            alive = jax.ops.segment_sum(
                hard_concrete(yw).T, gids, num_segments=n_groups
            ).T  # (B, n_groups)
            dead = (alive == 0).astype(yw.dtype)
            first = jnp.asarray(self._group_first_slot())
            yw = yw + 0.5 * dead[:, gids] * first[None, :]

        if spec.num_depth > 0:
            yd = importance_gumbel_sigmoid_sample(zd, kd, self.temperature, self.base)
            yd = yd[:, jnp.asarray(self._depth_perm())]
            return jnp.concatenate([yw, yd], axis=1)
        return yw

    def width_depth_normalize(self, x: jax.Array,
                              resource_model: Optional[ResourceModel] = None) -> jax.Array:
        """Resource-aware similarity normalisation (quantizer.py:233-250):
        hard-concrete everywhere, except the width slabs of depth-gated
        subblocks which become soft width·depth products; then scale width
        slots by 1/√group_size (and optionally by the prunable-MACs
        template)."""
        spec = self.spec
        x = jnp.asarray(x)  # snapshots may arrive as numpy (checkpoint restore)
        out = hard_concrete(x)
        soft_mask = np.zeros(self.vq_dim, dtype=np.float32)
        depth_col = np.zeros(self.vq_dim, dtype=np.int32)
        for sb in spec.subblocks:
            if sb.depth_index < 0:
                continue
            lo = sb.sites[0].start
            hi = sb.sites[-1].start + sb.sites[-1].width
            soft_mask[lo:hi] = 1.0
            depth_col[lo:hi] = spec.num_width + sb.depth_index
        sm = jnp.asarray(soft_mask)
        dprod = x * x[:, jnp.asarray(depth_col)]
        out = out * (1.0 - sm) + dprod * sm
        out = out * jnp.asarray(self._normalize_template())
        if self.resource_aware_normalization:
            if resource_model is None:
                resource_model = ResourceModel(spec)
            out = out * jnp.asarray(resource_model.prunable_macs_template())
        return out

    # ---------------- assignment / forward ----------------

    def _scores(self, gates: jax.Array, codes_gs: jax.Array) -> jax.Array:
        u = self.width_depth_normalize(gates)
        u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
        v = self.width_depth_normalize(codes_gs)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        return u @ v.T

    def cosine_indices(self, z: jax.Array, embedding_gs: jax.Array,
                       key: Optional[jax.Array] = None) -> jax.Array:
        """Eval/router assignment: argmax cosine similarity
        (quantizer.py:263-271). z are hypernet logits."""
        gates = self.gumbel_sigmoid_trick(z, key)
        return jnp.argmax(self._scores(gates, embedding_gs), axis=-1)

    def forward_train(
        self,
        params: dict,
        z: jax.Array,
        key: jax.Array,
        axis_name: Optional[str] = None,
        axis_size: int = 1,
    ) -> Tuple[jax.Array, jax.Array, dict]:
        """Training forward (quantizer.py:140-169 train branch).

        Returns (z_q, indices, new_state). z_q = gumbel-sigmoid'd codebook
        rows — differentiable w.r.t. the codebook; indices are stop-grad
        Sinkhorn (or cosine) assignments over the *global* batch."""
        k1, k2 = jax.random.split(key)
        embedding_gs = self.gumbel_sigmoid_trick(params["embedding"], k1)
        gates = jax.lax.stop_gradient(self.gumbel_sigmoid_trick(z, k2))
        codes = jax.lax.stop_gradient(embedding_gs)
        scores = self._scores(gates, codes)
        if self.optimal_transport:
            q = sinkhorn(scores, self.sinkhorn_epsilon, self.sinkhorn_iterations,
                         axis_name, axis_size)
            indices = jnp.argmax(q, axis=-1)
        else:
            indices = jnp.argmax(scores, axis=-1)
        z_q = embedding_gs[indices]
        new_state = {"embedding_gs": jax.lax.stop_gradient(embedding_gs)}
        return z_q, indices, new_state

    def forward_eval(self, state: dict, z: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Eval forward: cosine assignment against the frozen snapshot, then
        hard-concrete binarisation (quantizer.py:147-169 eval branch)."""
        embedding_gs = state["embedding_gs"]
        indices = self.cosine_indices(z, embedding_gs, key=None)
        z_q = hard_concrete(embedding_gs[indices])
        return z_q, indices

    def codebook_gates(self, params: dict, key: Optional[jax.Array] = None,
                       hard: bool = False) -> jax.Array:
        """Gumbel-sigmoid'd codebook rows (get_codebook_entry_gumbel_sigmoid,
        quantizer.py:188-194) — e.g. for expert materialisation and the
        pairwise-similarity logging."""
        g = self.gumbel_sigmoid_trick(params["embedding"], key)
        return hard_concrete(g) if hard else g
