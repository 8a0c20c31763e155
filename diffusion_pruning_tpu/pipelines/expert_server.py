"""Expert-dispatch serving: route prompts to physically pruned experts.

The reference serves APTP experts only offline (per-expert generation
scripts); its routed pipeline runs the GATED U-Net with masks — no FLOP
savings at inference. This server completes the serving story: the router
assigns each prompt to a codebook expert, prompts are grouped per expert,
and each group runs through that expert's *materialised* pruned U-Net
(models/unet/pruned.py) — real speedup (≈1.7× at the 0.6-MACs point,
PERFORMANCE.md).

Static-shape discipline with tiered batching: each expert runs one of a
small set of power-of-two batch shapes (1, 2, …, batch_size); a group of n
prompts is covered greedily by the largest tiers ≤ n plus one padded tail
tier, so XLA compiles at most log2(batch_size)+1 programs per expert
(cached across requests) and padding waste stays < the smallest tier that
covers the tail — instead of up to batch_size-1 slots per group. The
ServingQueue below adds continuous batching across submit() calls: pending
prompts accumulate per expert and flush() drains them at the best tier
shapes, keeping utilisation high under skewed expert assignment.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from diffusion_pruning_tpu.core.structure import StructureSpec
from diffusion_pruning_tpu.models.unet.config import UNetConfig
from diffusion_pruning_tpu.models.unet.pruned import (
    ExpertPlan,
    expert_macs_ratio,
    make_expert_plan,
    slice_expert_params,
)
from diffusion_pruning_tpu.models.unet.unet import GatedUNet
from diffusion_pruning_tpu.pipelines.pruning_pipeline import PruningPipeline


@dataclasses.dataclass
class ExpertServer:
    """K materialised experts + the router, behind one generate() call."""
    base_pipeline: PruningPipeline          # provides router + vae + text enc
    expert_models: List[GatedUNet]
    expert_params: List[dict]
    expert_ratios: List[float]
    batch_size: int = 4

    @classmethod
    def from_codebook(
        cls,
        pipeline: PruningPipeline,
        dense_params: dict,
        spec: StructureSpec,
        cfg: UNetConfig,
        expert_weights: Optional[Sequence[dict]] = None,
        batch_size: int = 4,
        param_dtype=None,
    ) -> "ExpertServer":
        """Materialise every codebook entry as a pruned expert.

        expert_weights: optional per-expert fine-tuned params (stage-2
        output); defaults to pretrained slices of the dense U-Net.

        Experts are cut from the embedding_gs snapshot (the realisation the
        router assigns against) — a fixed-key re-draw would flip borderline
        gates and serve architectures the prompts were never routed to."""
        codes = (np.asarray(pipeline.quantizer_state["embedding_gs"]) >= 0.5
                 ).astype(np.float32)
        models, params, ratios = [], [], []
        for e in range(codes.shape[0]):
            plan = make_expert_plan(spec, codes[e])
            models.append(GatedUNet(cfg, plan=plan, dtype=pipeline.unet.dtype))
            if expert_weights is not None and expert_weights[e] is not None:
                p = expert_weights[e]
            else:
                p = slice_expert_params(dense_params, plan)
            if param_dtype is not None:
                # serving precision: K materialised experts at f32 can exceed
                # HBM (8 × 0.6-MACs SD-2.1 ≈ 17 GB); bf16 halves that
                p = jax.tree.map(lambda x: jnp.asarray(x, param_dtype), p)
            params.append(p)
            ratios.append(expert_macs_ratio(spec, plan))
        return cls(pipeline, models, params, ratios, batch_size)

    # ------------------------------------------------------------------

    def route(self, input_ids: jax.Array,
              hyper_net_input: Optional[jax.Array] = None) -> np.ndarray:
        prompt_embeds = self.base_pipeline.encode_prompt(input_ids)
        _, indices = self.base_pipeline.route(prompt_embeds, hyper_net_input)
        return np.asarray(indices)

    @property
    def batch_shapes(self) -> Tuple[int, ...]:
        """Power-of-two tier sizes up to batch_size (ascending)."""
        shapes, s = [], 1
        while s < self.batch_size:
            shapes.append(s)
            s *= 2
        shapes.append(self.batch_size)
        return tuple(shapes)

    @staticmethod
    def plan_batches(n: int, shapes: Sequence[int]) -> List[Tuple[int, int]]:
        """Cover n prompts with tier batches: greedy largest-tier-first, then
        one padded tail tier. Returns [(tier_size, real_count), ...] with
        sum(real_count) == n and minimal padded slots."""
        plan: List[Tuple[int, int]] = []
        biggest = shapes[-1]
        while n >= biggest:
            plan.append((biggest, biggest))
            n -= biggest
        if n > 0:
            tail = next(s for s in shapes if s >= n)
            plan.append((tail, n))
        return plan

    def _expert_pipe(self, e: int):
        if not hasattr(self, "_expert_caches"):
            self._expert_caches: Dict[int, dict] = {}
        base = self.base_pipeline
        pipe = dataclasses.replace(
            base, unet=self.expert_models[e],
            unet_params=self.expert_params[e])
        # persist each expert's jitted trajectories across generate() calls
        pipe._denoise_cache = self._expert_caches.setdefault(int(e), {})
        # SHARE the encode/decode jit cache with the base pipeline:
        # dataclasses.replace drops instance attrs, and a fresh jax.jit per
        # expert re-traces the VAE decoder every flush (~seconds each on a
        # slow host — this was an 11× serving slowdown)
        if not hasattr(base, "_fn_cache"):
            base._fn_cache = {}
        pipe._fn_cache = base._fn_cache
        return pipe

    def _run_expert(self, e, rows, input_ids, neg_input_ids, key,
                    num_inference_steps, guidance_scale, out_images):
        """Generate `rows` through expert e using tier-planned batches.
        Returns (device slots used, real images produced)."""
        expert_pipe = self._expert_pipe(int(e))
        used = 0
        lo = 0
        for tier, real in self.plan_batches(len(rows), self.batch_shapes):
            chunk = rows[lo: lo + real]
            lo += real
            padded = np.concatenate([chunk, np.repeat(chunk[-1:], tier - real)])
            key, sub = jax.random.split(key)
            # keep results on device — callers materialise at the end, so
            # dispatches pipeline instead of idling one round trip per batch
            imgs = expert_pipe.generate_samples(
                input_ids[jnp.asarray(padded)],
                neg_input_ids[jnp.asarray(padded)],
                sub, arch=None,
                num_inference_steps=num_inference_steps,
                guidance_scale=guidance_scale)
            for j, r in enumerate(chunk):
                out_images[int(r)] = imgs[j]
            used += tier
        return used

    def _run_gated_leftovers(self, entries, input_ids, neg_input_ids, key,
                             num_inference_steps, guidance_scale, out_images):
        """One combined per-prompt-arch GATED batch for the fragmented
        remainders of every expert group (hybrid dispatch). The gated U-Net
        runs per-prompt architectures for free (PERFORMANCE.md: masking
        fuses into conv/GEMM epilogues), so pooling sub-tier leftovers into
        one large batch beats running each as a tiny expert batch that
        underutilises the MXU."""
        from diffusion_pruning_tpu.core.estimators import hard_concrete
        assert self.base_pipeline.unet_params is not None, (
            "hybrid dispatch routes sub-tier remainders through the dense "
            "gated U-Net — keep its params resident (don't drop them after "
            "materialising experts)")
        rows = np.asarray([r for r, _ in entries])
        experts = np.asarray([e for _, e in entries])
        codes = np.asarray(hard_concrete(
            jnp.asarray(self.base_pipeline.quantizer_state["embedding_gs"])))
        used = 0
        lo = 0
        for tier, real in self.plan_batches(len(rows), self.batch_shapes):
            chunk = rows[lo: lo + real]
            echunk = experts[lo: lo + real]
            lo += real
            pad = np.concatenate([chunk, np.repeat(chunk[-1:], tier - real)])
            epad = np.concatenate([echunk, np.repeat(echunk[-1:], tier - real)])
            key, sub = jax.random.split(key)
            imgs = self.base_pipeline.generate_samples(
                input_ids[jnp.asarray(pad)], neg_input_ids[jnp.asarray(pad)],
                sub, arch=jnp.asarray(codes[epad]),
                num_inference_steps=num_inference_steps,
                guidance_scale=guidance_scale)
            for j, r in enumerate(chunk):
                out_images[int(r)] = imgs[j]
            used += tier
        return used

    def _dispatch_groups(self, groups, input_ids, neg_input_ids, key,
                         num_inference_steps, guidance_scale, out_images,
                         hybrid: bool):
        """groups: {expert: rows}. hybrid=True sends only FULL largest-tier
        batches through materialised experts; every remainder joins one
        pooled gated batch (per-prompt arch)."""
        slots = 0
        leftovers: List[Tuple[int, int]] = []
        for e, rows in groups.items():
            if hybrid:
                biggest = self.batch_size
                n_full = (len(rows) // biggest) * biggest
                full_rows, rest = rows[:n_full], rows[n_full:]
                leftovers.extend((int(r), int(e)) for r in rest)
            else:
                full_rows = rows
            if len(full_rows):
                key, sub = jax.random.split(key)
                slots += self._run_expert(
                    e, full_rows, input_ids, neg_input_ids, sub,
                    num_inference_steps, guidance_scale, out_images)
        if leftovers:
            key, sub = jax.random.split(key)
            slots += self._run_gated_leftovers(
                leftovers, input_ids, neg_input_ids, sub,
                num_inference_steps, guidance_scale, out_images)
        return slots

    def generate(
        self,
        input_ids: jax.Array,             # (N, 77)
        neg_input_ids: jax.Array,         # (1 or N, 77)
        key: jax.Array,
        hyper_net_input: Optional[jax.Array] = None,
        num_inference_steps: int = 25,
        guidance_scale: float = 7.5,
        hybrid: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (images (N, H, W, 3), expert_indices (N,)) with each
        prompt generated by its assigned materialised expert (hybrid=True:
        full tiers by experts, pooled gated batch for the remainders)."""
        n = input_ids.shape[0]
        if neg_input_ids.shape[0] == 1:
            neg_input_ids = jnp.tile(neg_input_ids, (n, 1))
        indices = self.route(input_ids, hyper_net_input)

        out_images: Dict[int, np.ndarray] = {}
        groups = {int(e): np.nonzero(indices == e)[0]
                  for e in np.unique(indices)}
        self.last_slots_used = self._dispatch_groups(
            groups, input_ids, neg_input_ids, key,
            num_inference_steps, guidance_scale, out_images, hybrid)
        images = np.stack([np.asarray(out_images[i]) for i in range(n)])
        return images, indices


@dataclasses.dataclass
class ServingQueue:
    """Continuous batching across requests: submit() enqueues routed prompts;
    flush() drains every expert's pending set at the best tier shapes. Under
    skewed expert assignment this keeps utilisation near 1 where fixed-size
    padding would waste most of the batch (reference has no serving story at
    all — experts are only generated offline)."""
    server: ExpertServer
    num_inference_steps: int = 25
    guidance_scale: float = 7.5
    # hybrid dispatch: full largest-tier batches run materialised experts;
    # all sub-tier remainders pool into ONE gated per-prompt-arch batch —
    # the crossover fix for fragmented routed traffic (PERFORMANCE.md)
    hybrid: bool = False

    def __post_init__(self):
        import threading
        self._pending: List[Tuple[int, np.ndarray, np.ndarray, int]] = []
        self._results: Dict[int, np.ndarray] = {}
        self._next_id = 0
        self._lock = threading.Lock()            # protects _pending/_results
        self._dispatch_lock = threading.Lock()   # one flush on device at a time

    def submit(self, input_ids, neg_input_ids,
               hyper_net_input=None) -> List[int]:
        """Route and enqueue prompts; returns request ids."""
        n = input_ids.shape[0]
        if neg_input_ids.shape[0] == 1:
            neg_input_ids = jnp.tile(neg_input_ids, (n, 1))
        experts = self.server.route(input_ids, hyper_net_input)
        ids = []
        ii = np.asarray(input_ids)
        nn_ = np.asarray(neg_input_ids)
        with self._lock:
            for r in range(n):
                rid = self._next_id
                self._next_id += 1
                self._pending.append((rid, ii[r], nn_[r], int(experts[r])))
                ids.append(rid)
        return ids

    def pending_per_expert(self) -> Dict[int, int]:
        with self._lock:
            pend = list(self._pending)
        out: Dict[int, int] = {}
        for _, _, _, e in pend:
            out[e] = out.get(e, 0) + 1
        return out

    def _flush_entries(self, pending, key) -> Dict[int, np.ndarray]:
        if not pending:
            self.last_slots_used = 0
            return {}
        ids = jnp.asarray(np.stack([x[1] for x in pending]))
        negs = jnp.asarray(np.stack([x[2] for x in pending]))
        experts = np.asarray([x[3] for x in pending])
        groups = {int(e): np.nonzero(experts == e)[0]
                  for e in np.unique(experts)}
        out: Dict[int, np.ndarray] = {}
        self.last_slots_used = self.server._dispatch_groups(
            groups, ids, negs, key, self.num_inference_steps,
            self.guidance_scale, out, self.hybrid)
        # materialise once at the end: all batches are already queued
        flush_results = {pending[j][0]: np.asarray(out[j])
                         for j in range(len(pending))}
        with self._lock:
            self._results.update(flush_results)
        return flush_results

    def flush(self, key) -> Dict[int, np.ndarray]:
        """Run everything pending; returns {request_id: image} for this
        flush. Batches are tier-planned per expert over the FULL pending set,
        so requests from different submit() calls share device batches."""
        with self._lock:
            pending, self._pending = self._pending, []
        with self._dispatch_lock:
            return self._flush_entries(pending, key)

    def flush_async(self, key):
        """Run the pending set in a background thread; returns a
        concurrent.futures.Future resolving to {request_id: image}. The
        caller keeps submit()ing (routing/tokenising on the host) while the
        previous flush's trajectories occupy the device — flushes themselves
        serialise on _dispatch_lock."""
        import threading
        from concurrent.futures import Future
        with self._lock:
            pending, self._pending = self._pending, []
        fut: Future = Future()

        def work():
            with self._dispatch_lock:
                try:
                    fut.set_result(self._flush_entries(pending, key))
                except BaseException as e:  # surface in .result()
                    fut.set_exception(e)

        threading.Thread(target=work, daemon=True).start()
        return fut
