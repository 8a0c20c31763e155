"""Routed text-to-image pipeline.

Functional equivalent of the reference's `StableDiffusionPruningPipeline`
(/root/reference/pdm/pipelines/pruning_pipelines.py): encode prompt → route
(hypernet → quantizer eval forward: cosine argmax vs the frozen codebook
snapshot + hard-concrete) → run the CFG denoising loop with the per-prompt
arch vector fixed for the whole trajectory → decode.

TPU design: the entire trajectory (sampler scan + CFG + gated U-Net) is one
jitted function; per-prompt architectures ride along as a (B, vq_dim) array
(no module mutation between steps). Methods mirror the reference surface:
  __call__            routed generation (+ expert indices, resource ratios)
  generate_samples    fixed-arch generation (materialised/pruned experts)
  quantizer_samples   generation from each codebook entry
  depth_analysis      all-ones arch with chosen depth gates zeroed
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from diffusion_pruning_tpu.core.estimators import hard_concrete
from diffusion_pruning_tpu.core.resource import ResourceModel
from diffusion_pruning_tpu.models.hypernet import HyperStructure
from diffusion_pruning_tpu.models.quantizer import StructureQuantizer
from diffusion_pruning_tpu.models.text_encoders import CLIPTextEncoder
from diffusion_pruning_tpu.models.unet.unet import GatedUNet
from diffusion_pruning_tpu.models.vae import AutoencoderKL
from diffusion_pruning_tpu.schedulers import DDIMSampler, DiffusionSchedule, PNDMSampler


@dataclasses.dataclass
class PruningPipeline:
    unet: GatedUNet
    unet_params: dict
    vae: AutoencoderKL
    vae_params: dict
    text_encoder: CLIPTextEncoder
    text_params: dict
    hypernet: Optional[HyperStructure] = None
    hypernet_params: Optional[dict] = None
    quantizer: Optional[StructureQuantizer] = None
    quantizer_params: Optional[dict] = None
    quantizer_state: Optional[dict] = None
    schedule: DiffusionSchedule = dataclasses.field(default_factory=DiffusionSchedule)
    sampler: str = "ddim"
    # optional models/safety.SafetyChecker (the reference pipeline's
    # safety_checker + feature_extractor, pruning_pipelines.py:160-178,
    # applied at :826-839); None = requires_safety_checker=False behaviour
    safety_checker: Optional[object] = None
    # optional jax.sharding.Mesh with a "data" axis (and usually a "model"
    # axis): batches are constrained onto the data axis inside the jitted
    # stages and XLA's SPMD partitioner distributes the work — set via
    # parallel.tp.shard_pipeline, which also places the params. Beyond the
    # reference (serving there is single-GPU per process); built for 512px+
    # multi-chip serving where one chip's HBM/latency budget is the limit.
    mesh: Optional[object] = None

    def _sampler(self):
        if self.sampler == "pndm":
            return PNDMSampler(self.schedule)
        if self.sampler == "dpm++":
            from diffusion_pruning_tpu.schedulers import DPMSolverPPSampler
            return DPMSolverPPSampler(self.schedule)
        return DDIMSampler(self.schedule)

    def _data_shard(self, x):
        """Constrain a batch-leading array onto the mesh's data axis (no-op
        without a mesh, or when the batch doesn't divide — e.g. a (1, 77)
        negative-prompt row). Used INSIDE jitted stages so GSPMD partitions
        the batch and places the TP collectives on ICI."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        dp = dict(zip(self.mesh.axis_names, self.mesh.devices.shape)).get("data", 1)
        if x.shape[0] % dp != 0:
            return x
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, P("data")))

    def _jitted(self, name, fn):
        """Per-instance jit cache — every pipeline stage must run as one
        compiled program (eager op-by-op dispatch is pathological on remote
        TPU runtimes; params stay jit ARGUMENTS, never closure constants)."""
        cache = getattr(self, "_fn_cache", None)
        if cache is None:
            cache = self._fn_cache = {}
        if name not in cache:
            cache[name] = jax.jit(fn)
        return cache[name]

    # ------------------------------------------------------------------

    def encode_prompt(self, input_ids: jax.Array) -> jax.Array:
        fn = self._jitted("encode_prompt",
                          lambda p, ids: self.text_encoder.apply(
                              {"params": p}, self._data_shard(ids)))
        return fn(self.text_params, input_ids)

    def route(self, prompt_embeds: jax.Array, hyper_net_input: Optional[jax.Array] = None):
        """Hypernet + quantizer eval routing (pruning_pipelines.py:746-759).

        Returns (arch (B, vq_dim) hard gates, expert indices)."""
        feats = hyper_net_input if hyper_net_input is not None else prompt_embeds.mean(axis=1)

        def _route(hp, qstate, f):
            logits = self.hypernet.apply({"params": hp}, f)
            return self.quantizer.forward_eval(qstate, logits)

        fn = self._jitted("route", _route)
        return fn(self.hypernet_params, self.quantizer_state, feats)

    def _denoise_fn(self, num_inference_steps: int, guidance_scale: float, gated: bool):
        """Jitted CFG denoising trajectory, cached per (steps, scale, gated).

        Params/embeddings/arch are jit ARGUMENTS — closure capture would bake
        multi-GB weights into the HLO as constants."""
        cache = getattr(self, "_denoise_cache", None)
        if cache is None:
            cache = self._denoise_cache = {}
        cache_key = (num_inference_steps, guidance_scale, gated, self.sampler)
        if cache_key in cache:
            return cache[cache_key]
        sampler = self._sampler()
        do_cfg = guidance_scale > 1.0
        unet = self.unet

        @jax.jit
        def run(unet_params, ehs, arch, latents):
            latents = self._data_shard(latents)
            ehs = self._data_shard(ehs)

            def model_fn(x, t):
                if do_cfg:
                    x_in = self._data_shard(jnp.concatenate([x, x]))
                    t_in = jnp.concatenate([t, t])
                    out = unet.apply({"params": unet_params}, x_in, t_in, ehs, arch=arch)
                    uncond, cond = jnp.split(out, 2)
                    return uncond + guidance_scale * (cond - uncond)
                return unet.apply({"params": unet_params}, x, t, ehs, arch=arch)

            return sampler.sample(model_fn, latents, num_inference_steps)

        cache[cache_key] = run
        return run

    def denoise(self, key, prompt_embeds, neg_embeds, arch,
                num_inference_steps=50, guidance_scale=7.5, height=None, width=None):
        cfg = self.unet.cfg
        vs = self.vae.cfg.spatial_scale
        h = (height or cfg.sample_size * vs) // vs
        w = (width or cfg.sample_size * vs) // vs
        b = prompt_embeds.shape[0]
        latents = jax.random.normal(key, (b, h, w, cfg.in_channels))
        do_cfg = guidance_scale > 1.0
        ehs = jnp.concatenate([neg_embeds, prompt_embeds]) if do_cfg else prompt_embeds
        run = self._denoise_fn(num_inference_steps, guidance_scale, arch is not None)
        return run(self.unet_params, ehs, arch, latents)

    def decode(self, latents: jax.Array) -> jax.Array:
        """Latents → uint8-range images in [0, 1], NHWC."""
        fn = self._jitted("decode", lambda p, z: jnp.clip(
            self.vae.apply({"params": p}, self._data_shard(z),
                           method=AutoencoderKL.decode
                           ).astype(jnp.float32) / 2 + 0.5, 0.0, 1.0))
        return fn(self.vae_params, latents)

    # ------------------------------------------------------------------

    def __call__(self, input_ids, neg_input_ids, key,
                 hyper_net_input=None, num_inference_steps=50, guidance_scale=7.5,
                 output_type="pil"):
        """Routed generation. Returns (images, expert_indices, resource_ratios)
        — or a 4-tuple (+ nsfw_flags) when a safety_checker is configured,
        with flagged images blacked out (pruning_pipelines.py:826-839)."""
        prompt_embeds = self.encode_prompt(input_ids)
        neg_embeds = self.encode_prompt(neg_input_ids)
        arch, indices = self.route(prompt_embeds, hyper_net_input)
        latents = self.denoise(key, prompt_embeds, neg_embeds, arch,
                               num_inference_steps, guidance_scale)
        ratios = ResourceModel(self.unet.spec).resource_ratio(arch)
        images = self.decode(latents) if output_type != "latent" else latents
        if self.safety_checker is not None and output_type != "latent":
            images, nsfw = self.safety_checker(images)
            return images, indices, ratios, nsfw
        return images, indices, ratios

    def generate_samples(self, input_ids, neg_input_ids, key, arch=None,
                         num_inference_steps=50, guidance_scale=7.5):
        """Plain SD loop with a fixed (or absent) architecture — used for
        materialised experts (pruning_pipelines.py:856-999)."""
        prompt_embeds = self.encode_prompt(input_ids)
        neg_embeds = self.encode_prompt(neg_input_ids)
        latents = self.denoise(key, prompt_embeds, neg_embeds, arch,
                               num_inference_steps, guidance_scale)
        return self.decode(latents)

    def quantizer_samples(self, input_ids, neg_input_ids, key, expert_ids: Sequence[int],
                          num_inference_steps=50, guidance_scale=7.5):
        """Generate with each requested codebook entry's architecture
        (pruning_pipelines.py:1232-1448). Architectures come from the
        embedding_gs snapshot — the same realisation eval routing and
        expert materialisation use — never a fresh gumbel draw."""
        codes = hard_concrete(jnp.asarray(self.quantizer_state["embedding_gs"]))
        arch = codes[jnp.asarray(expert_ids)]
        prompt_embeds = self.encode_prompt(input_ids)
        neg_embeds = self.encode_prompt(neg_input_ids)
        latents = self.denoise(key, prompt_embeds, neg_embeds, arch,
                               num_inference_steps, guidance_scale)
        return self.decode(latents)

    def sample_progressive(self, input_ids, neg_input_ids, key,
                           hyper_net_input=None, num_inference_steps=50,
                           guidance_scale=7.5, snapshot_every=10):
        """Routed generation returning intermediate decoded images every
        `snapshot_every` steps (pruning_pipelines.py:1003-1231). Runs the
        trajectory in host-stepped chunks so snapshots stay cheap."""
        prompt_embeds = self.encode_prompt(input_ids)
        neg_embeds = self.encode_prompt(neg_input_ids)
        arch, indices = self.route(prompt_embeds, hyper_net_input)
        cfg = self.unet.cfg
        b = prompt_embeds.shape[0]
        latents = jax.random.normal(
            key, (b, cfg.sample_size, cfg.sample_size, cfg.in_channels))
        sampler = self._sampler()
        ts = sampler.timesteps(num_inference_steps)
        do_cfg = guidance_scale > 1.0
        ehs = jnp.concatenate([neg_embeds, prompt_embeds]) if do_cfg else prompt_embeds
        sched = self.schedule
        ratio = sched.num_train_timesteps // num_inference_steps
        ac = sched.alphas_cumprod

        @jax.jit
        def chunk_run(p, ehs_in, arch_in, x_in, chunk_ts):
            def model_fn(xx, tt):
                if do_cfg:
                    out = self.unet.apply({"params": p},
                                          jnp.concatenate([xx, xx]),
                                          jnp.concatenate([tt, tt]),
                                          ehs_in, arch=arch_in)
                    u, c = jnp.split(out, 2)
                    return u + guidance_scale * (c - u)
                return self.unet.apply({"params": p}, xx, tt, ehs_in, arch=arch_in)

            def step(xc, t):
                t_b = jnp.full((xc.shape[0],), t, jnp.int32)
                eps, x0 = sched.to_epsilon_and_x0(model_fn(xc, t_b), xc, t_b)
                t_prev = t - ratio
                ac_prev = jnp.where(t_prev >= 0, ac[jnp.maximum(t_prev, 0)], ac[0])
                return (jnp.sqrt(ac_prev) * x0
                        + jnp.sqrt(1 - ac_prev) * eps).astype(xc.dtype), None

            out, _ = jax.lax.scan(step, x_in, chunk_ts)
            return out

        snaps = []
        x = latents
        for start in range(0, num_inference_steps, snapshot_every):
            chunk = jnp.asarray(ts[start:start + snapshot_every])
            x = chunk_run(self.unet_params, ehs, arch, x, chunk)
            snaps.append(self.decode(x))
        return snaps, indices

    def depth_analysis_arch(self, depth_indices: Sequence[int], batch: int = 1) -> jax.Array:
        """All-ones arch with the given depth gates zeroed
        (pruning_pipelines.py:1510-1516)."""
        spec = self.unet.spec
        arch = jnp.ones((batch, spec.vq_dim))
        for d in depth_indices:
            arch = arch.at[:, spec.num_width + d].set(0.0)
        return arch
