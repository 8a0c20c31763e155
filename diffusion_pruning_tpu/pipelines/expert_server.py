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
            # serving precision: K materialised experts at f32 can exceed
            # HBM (8 × 0.6-MACs SD-2.1 ≈ 17 GB); bf16 halves that. When
            # casting, fuse the whole slice+cast into ONE jitted program:
            # the ~1.4k per-leaf gather/cast dispatches pay ~30 ms tunnel
            # latency each (measured 86 s/expert, 688 s for K=8 SD-2.1);
            # fused it is one dispatch per expert. The uncast path keeps
            # slice_expert_params' Python-level buffer sharing for
            # untouched leaves, so it stays eager.
            if expert_weights is not None and expert_weights[e] is not None:
                p = expert_weights[e]
                if param_dtype is not None:
                    p = jax.jit(lambda t: jax.tree.map(
                        lambda x: jnp.asarray(x, param_dtype), t))(p)
            elif param_dtype is not None:
                def _materialise_expert(dense, _plan=plan):
                    sliced = slice_expert_params(dense, _plan)
                    return jax.tree.map(
                        lambda x: jnp.asarray(x, param_dtype), sliced)
                p = jax.jit(_materialise_expert)(dense_params)
            else:
                p = slice_expert_params(dense_params, plan)
            if getattr(pipeline, "mesh", None) is not None:
                # sharded serving (parallel.tp.shard_pipeline on the base):
                # expert param trees share the dense tree's paths, so the
                # same Megatron specs apply; expert pipes inherit the mesh
                # through dataclasses.replace and their batches data-shard
                from diffusion_pruning_tpu.parallel.tp import shard_params
                p = shard_params(pipeline.mesh, p)
            params.append(p)
            ratios.append(expert_macs_ratio(spec, plan))
        return cls(pipeline, models, params, ratios, batch_size)

    # ------------------------------------------------------------------

    def warmup(self, num_inference_steps: int = 25,
               guidance_scale: float = 7.5, hybrid: bool = False,
               aot_dir: Optional[str] = None, decode: bool = True,
               parallel: int = 1) -> dict:
        """Build every (expert, tier) denoise program — plus the hybrid
        gated programs and the per-tier VAE decodes — BEFORE traffic
        arrives, so no request ever pays trace/compile latency.

        aot_dir: persist each program via jax.export (pipelines/aot.py).
        A later process's warmup() deserializes instead of tracing — with
        the persistent XLA cache also warm, server cold-start drops from
        K×tiers × (trace+compile) to artifact-load time.

        Returns {"loaded": n, "built": n}: loaded = deserialized from
        aot_dir (tracing skipped), built = traced this process (and
        exported to aot_dir when given). Prompt encoding is NOT warmed
        (its batch dim follows request sizes, and the text tower traces
        in ~a second). Mesh-sharded pipelines (parallel.tp.shard_pipeline)
        fall back to built programs — exported modules pin device counts.

        parallel > 1 prepares programs on a thread pool: per-program time
        over a remote runtime is dominated by compile/transfer waits that
        release the GIL, so overlapping them cuts restart wall-clock even
        on a 1-core host (tracing itself still serializes under the GIL).
        Measured at K=8 SD-2.1 × 4 tiers: PERFORMANCE.md round-5 table.
        """
        import threading

        from diffusion_pruning_tpu.pipelines import aot as aot_lib
        cfg = self.base_pipeline.unet.cfg
        tdt = getattr(self.base_pipeline.text_encoder, "dtype", jnp.float32)
        do_cfg = guidance_scale > 1.0
        s = cfg.sample_size
        stats = {"loaded": 0, "built": 0}
        lock = threading.Lock()
        tasks = []

        def collect_programs(pipe, params, arch, tag):
            run = pipe._denoise_fn(num_inference_steps, guidance_scale,
                                   gated=arch is not None)
            disp = aot_lib.ShapeDispatch(run)
            pipe._denoise_cache[(num_inference_steps, guidance_scale,
                                 arch is not None, pipe.sampler)] = disp
            for t in self.batch_shapes:
                ehs = jnp.zeros((2 * t if do_cfg else t, cfg.max_text_len,
                                 cfg.cross_attention_dim), tdt)
                latents = jnp.zeros((t, s, s, cfg.in_channels), jnp.float32)
                a = None if arch is None else jnp.tile(arch, (t, 1))
                tasks.append((run, disp, (params, ehs, a, latents),
                              f"{tag}-t{t}"))

        def warm_one(task):
            run, disp, args, tag_t = task
            if disp is None:  # decode: no dispatch table, no AOT artifact
                jax.block_until_ready(run(*args))
                return
            loaded = None
            path = None
            if aot_dir is not None:
                path = aot_lib.program_path(aot_dir, tag_t, args)
                loaded = aot_lib.try_load(path)
            if loaded is not None:
                # execute once NOW: the deserialized module still XLA-
                # compiles on first call (persistent-cache-backed) —
                # that belongs in warmup, not in the first request. A
                # module that deserializes but cannot RUN here (stale
                # artifact from a different topology) falls back to the
                # traced build — the aot.py contract: correctness never
                # depends on an artifact
                try:
                    jax.block_until_ready(loaded(*args))
                except Exception:
                    loaded = None
            if loaded is not None:
                with lock:
                    disp.add(args, loaded)
                    stats["loaded"] += 1
            else:
                jax.block_until_ready(run(*args))
                with lock:
                    stats["built"] += 1
                if aot_dir is not None and aot_lib.export_to(path, run, args):
                    fn = aot_lib.try_load(path)
                    if fn is not None:
                        with lock:
                            disp.add(args, fn)

        for e in range(len(self.expert_models)):
            collect_programs(self._expert_pipe(e), self.expert_params[e],
                             None, f"denoise-e{e}")
        if decode:
            # the VAE decode is SHARED across experts (_expert_pipe wires
            # base._fn_cache into every expert pipe) — warm once per tier,
            # not once per expert per tier
            for t in self.batch_shapes:
                latents = jnp.zeros((t, s, s, cfg.in_channels), jnp.float32)
                tasks.append((lambda l: self.base_pipeline.decode(l),
                              None, (latents,), f"decode-t{t}"))
        if hybrid:
            from diffusion_pruning_tpu.core.estimators import hard_concrete
            codes = hard_concrete(
                jnp.asarray(self.base_pipeline.quantizer_state["embedding_gs"]))
            # per-prompt archs vary at runtime but the PROGRAM is arch-shape
            # -generic; warm (and export) with code 0's realisation
            collect_programs(self.base_pipeline, self.base_pipeline.unet_params,
                             codes[:1], "denoise-gated")
        if parallel > 1:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=parallel) as ex:
                list(ex.map(warm_one, tasks))
        else:
            for task in tasks:
                warm_one(task)
        return stats

    def route(self, input_ids: jax.Array,
              hyper_net_input: Optional[jax.Array] = None) -> np.ndarray:
        prompt_embeds = self.base_pipeline.encode_prompt(input_ids)
        _, indices = self.base_pipeline.route(prompt_embeds, hyper_net_input)
        return np.asarray(indices)

    def encode_route(self, input_ids: jax.Array, neg_input_ids: jax.Array,
                     hyper_net_input: Optional[jax.Array] = None):
        """Encode prompts ONCE and route. Returns (prompt_embeds (N,77,D),
        neg_embeds (N,77,D), expert indices np (N,)).

        Text encoding used to happen per expert-tier batch (each tier's
        generate_samples re-ran CLIP on its chunk) — at K=8 experts that is
        ~2× the encode FLOPs of the routed path plus 16 extra dispatches per
        flush, each costing a host→tunnel round trip. Encoding the pooled
        pending set once and gathering embedding rows per tier removes both."""
        pe = self.base_pipeline.encode_prompt(input_ids)
        if neg_input_ids.shape[0] == 1:
            ne = self.base_pipeline.encode_prompt(neg_input_ids)
            ne = jnp.tile(ne, (input_ids.shape[0], 1, 1))
        else:
            ne = self.base_pipeline.encode_prompt(neg_input_ids)
        _, indices = self.base_pipeline.route(pe, hyper_net_input)
        return pe, ne, np.asarray(indices)

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

    def _run_expert(self, e, rows, pe, ne, keys, num_inference_steps,
                    guidance_scale, out_images):
        """Generate `rows` through expert e using tier-planned batches.
        keys: iterator of pre-split PRNG keys (pre-splitting once avoids a
        tiny device dispatch per tier). Images stay ON DEVICE: out_images[r]
        = (tier_array, row) — callers fetch each tier array once at the end,
        so trajectories pipeline instead of idling a tunnel round trip per
        batch (and per image: a per-row device slice + fetch costs two
        dispatches × ~30 ms each over this tunnel)."""
        expert_pipe = self._expert_pipe(int(e))
        used = 0
        lo = 0
        for tier, real in self.plan_batches(len(rows), self.batch_shapes):
            chunk = rows[lo: lo + real]
            lo += real
            padded = np.concatenate([chunk, np.repeat(chunk[-1:], tier - real)])
            sel = jnp.asarray(padded)
            latents = expert_pipe.denoise(
                next(keys), pe[sel], ne[sel], None,
                num_inference_steps, guidance_scale)
            imgs = expert_pipe.decode(latents)
            for j, r in enumerate(chunk):
                out_images[int(r)] = (imgs, j)
            used += tier
        return used

    def _run_gated_leftovers(self, entries, pe, ne, keys,
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
            sel = jnp.asarray(pad)
            latents = self.base_pipeline.denoise(
                next(keys), pe[sel], ne[sel], jnp.asarray(codes[epad]),
                num_inference_steps, guidance_scale)
            imgs = self.base_pipeline.decode(latents)
            for j, r in enumerate(chunk):
                out_images[int(r)] = (imgs, j)
            used += tier
        return used

    def _dispatch_groups(self, groups, pe, ne, key,
                         num_inference_steps, guidance_scale, out_images,
                         hybrid: bool):
        """groups: {expert: rows}. hybrid=True sends only FULL largest-tier
        batches through materialised experts; every remainder joins one
        pooled gated batch (per-prompt arch)."""
        n = sum(len(rows) for rows in groups.values())
        keys = iter(jax.random.split(key, n + 1))  # ≥ 1 key per tier
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
                slots += self._run_expert(
                    e, full_rows, pe, ne, keys,
                    num_inference_steps, guidance_scale, out_images)
        if leftovers:
            slots += self._run_gated_leftovers(
                leftovers, pe, ne, keys,
                num_inference_steps, guidance_scale, out_images)
        return slots

    @staticmethod
    def _materialise(out_images) -> Dict[int, np.ndarray]:
        """Fetch each tier's device array ONCE, then index rows on the host."""
        fetched: Dict[int, np.ndarray] = {}
        res: Dict[int, np.ndarray] = {}
        for r, (arr, j) in out_images.items():
            kid = id(arr)
            if kid not in fetched:
                fetched[kid] = np.asarray(arr)
            res[r] = fetched[kid][j]
        return res

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
        pe, ne, indices = self.encode_route(input_ids, neg_input_ids,
                                            hyper_net_input)

        out_images: Dict[int, Tuple[jax.Array, int]] = {}
        groups = {int(e): np.nonzero(indices == e)[0]
                  for e in np.unique(indices)}
        self.last_slots_used = self._dispatch_groups(
            groups, pe, ne, key,
            num_inference_steps, guidance_scale, out_images, hybrid)
        res = self._materialise(out_images)
        images = np.stack([res[i] for i in range(n)])
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
        # pending entry: (request id, submit batch index, row in batch, expert)
        self._pending: List[Tuple[int, int, int, int]] = []
        # per-submit (prompt_embeds, neg_embeds) kept ON DEVICE until flushed:
        # prompts are encoded exactly once, at submit (routing needs the
        # embeddings anyway); flush gathers rows straight out of these
        self._embeds: Dict[int, Tuple[jax.Array, jax.Array]] = {}
        self._results: Dict[int, np.ndarray] = {}
        self._next_id = 0
        self._next_batch = 0
        self._lock = threading.Lock()            # protects _pending/_results
        self._dispatch_lock = threading.Lock()   # one flush on device at a time

    def submit(self, input_ids, neg_input_ids,
               hyper_net_input=None) -> List[int]:
        """Encode + route and enqueue prompts; returns request ids."""
        n = input_ids.shape[0]
        pe, ne, experts = self.server.encode_route(input_ids, neg_input_ids,
                                                   hyper_net_input)
        ids = []
        with self._lock:
            bi = self._next_batch
            self._next_batch += 1
            self._embeds[bi] = (pe, ne)
            for r in range(n):
                rid = self._next_id
                self._next_id += 1
                self._pending.append((rid, bi, r, int(experts[r])))
                ids.append(rid)
        return ids

    def pending_per_expert(self) -> Dict[int, int]:
        with self._lock:
            pend = list(self._pending)
        out: Dict[int, int] = {}
        for _, _, _, e in pend:
            out[e] = out.get(e, 0) + 1
        return out

    def _flush_entries(self, pending, embeds, key) -> Dict[int, np.ndarray]:
        if not pending:
            self.last_slots_used = 0
            return {}
        # pool the flushed submits' embeddings into one (N, 77, D) pair —
        # one concatenate dispatch; per-tier gathers index into it
        batches = sorted({bi for _, bi, _, _ in pending})
        offset = {}
        off = 0
        for bi in batches:
            offset[bi] = off
            off += embeds[bi][0].shape[0]
        if len(batches) == 1:
            pe, ne = embeds[batches[0]]
        else:
            pe = jnp.concatenate([embeds[bi][0] for bi in batches])
            ne = jnp.concatenate([embeds[bi][1] for bi in batches])
        rows = np.asarray([offset[bi] + r for _, bi, r, _ in pending])
        experts = np.asarray([x[3] for x in pending])
        groups = {int(e): rows[experts == e] for e in np.unique(experts)}
        out: Dict[int, Tuple[jax.Array, int]] = {}
        self.last_slots_used = self.server._dispatch_groups(
            groups, pe, ne, key, self.num_inference_steps,
            self.guidance_scale, out, self.hybrid)
        res = self.server._materialise(out)
        flush_results = {pending[j][0]: res[int(rows[j])]
                         for j in range(len(pending))}
        with self._lock:
            self._results.update(flush_results)
        return flush_results

    def _take_pending(self):
        with self._lock:
            pending, self._pending = self._pending, []
            embeds = {bi: self._embeds.pop(bi)
                      for _, bi, _, _ in pending if bi in self._embeds}
        return pending, embeds

    def flush(self, key) -> Dict[int, np.ndarray]:
        """Run everything pending; returns {request_id: image} for this
        flush. Batches are tier-planned per expert over the FULL pending set,
        so requests from different submit() calls share device batches."""
        pending, embeds = self._take_pending()
        with self._dispatch_lock:
            return self._flush_entries(pending, embeds, key)

    def flush_async(self, key):
        """Run the pending set in a background thread; returns a
        concurrent.futures.Future resolving to {request_id: image}. The
        caller keeps submit()ing (routing/tokenising on the host) while the
        previous flush's trajectories occupy the device — flushes themselves
        serialise on _dispatch_lock."""
        import threading
        from concurrent.futures import Future
        pending, embeds = self._take_pending()
        fut: Future = Future()

        def work():
            with self._dispatch_lock:
                try:
                    fut.set_result(self._flush_entries(pending, embeds, key))
                except BaseException as e:  # surface in .result()
                    fut.set_exception(e)

        threading.Thread(target=work, daemon=True).start()
        return fut
