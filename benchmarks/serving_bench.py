"""End-to-end serving throughput on the real chip.

Two serving stories at SD-2.1 scale, 256px, DDIM-25 CFG:
  * routed  — the reference's pipeline semantics: CLIP encode → route →
    gated U-Net denoise → VAE decode (no FLOP savings, gates as masks);
  * experts — materialised 0.6-MACs experts via the ExpertServer queue
    (real FLOP savings + tiered continuous batching).

  JAX_PLATFORMS='' python benchmarks/serving_bench.py
Env: DPT_RES (256), DPT_BATCH (4), DPT_N (16 prompts), DPT_MODE
(routed,experts).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

RES = int(os.environ.get("DPT_RES", "256"))
BATCH = int(os.environ.get("DPT_BATCH", "4"))
N = int(os.environ.get("DPT_N", "16"))
MODES = os.environ.get("DPT_MODE", "routed,experts").split(",")
# codebook size: K resident bf16 experts ≈ K × 1.2 GB HBM. K=8 fits at
# 256px; at 512px one 16 GB chip fits K=4 (K=8 needs the dp×tp sharded
# server across chips — parallel/tp.shard_pipeline)
NE = int(os.environ.get("DPT_NE", "8"))
# expert operating point: fraction of width gates kept per codebook entry.
# A fresh random quantizer snapshots a ~dense codebook (MACs ratios ≈ 1.0 —
# the convergence harness's "codebook parks dense" effect), which would
# benchmark dense replicas instead of pruned experts; APTP's SD-2.1 design
# point is ~0.6 MACs (configs/pruning/sd-2-1_coco2014.yaml), and the
# convergence run's materialised experts landed at 0.61/0.75.
KEEP = float(os.environ.get("DPT_KEEP", "0.6"))
STEPS = 25


def log(m):
    print(f"# serving: {m}", file=sys.stderr, flush=True)


def build_pipeline():
    from diffusion_pruning_tpu.core import build_structure
    from diffusion_pruning_tpu.models.hypernet import HyperStructure
    from diffusion_pruning_tpu.models.quantizer import StructureQuantizer
    from diffusion_pruning_tpu.models.text_encoders import CLIPTextConfig, CLIPTextEncoder
    from diffusion_pruning_tpu.models.unet.config import UNetConfig
    from diffusion_pruning_tpu.models.unet.unet import GatedUNet
    from diffusion_pruning_tpu.models.vae import AutoencoderKL, VAEConfig
    from diffusion_pruning_tpu.pipelines import PruningPipeline
    from diffusion_pruning_tpu.schedulers import DiffusionSchedule
    from diffusion_pruning_tpu.utils.init_utils import random_params_like, shape_tree

    ucfg = UNetConfig.sd21(resolution=RES)
    tcfg = CLIPTextConfig.sd21()
    vcfg = VAEConfig.sd()
    spec = build_structure(ucfg)
    unet = GatedUNet(ucfg, dtype=jnp.bfloat16)
    text = CLIPTextEncoder(tcfg, dtype=jnp.bfloat16)
    vae = AutoencoderKL(vcfg, dtype=jnp.bfloat16)
    hyper = HyperStructure(spec, input_dim=tcfg.hidden_size)
    quant = StructureQuantizer(
        spec, n_e=NE, base=3.0,
        depth_order=(-1, -2, 0, 1, -3, -4, 2, 3, -5, -6, 4, 5, -7, 6))

    rng = jax.random.PRNGKey(0)
    log("materialising params on device (bf16 serving precision)")

    def bf16(st):
        return jax.tree.map(lambda s: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16), st)

    unet_params = random_params_like(bf16(shape_tree(
        lambda: unet.init_params(rng, batch=1))))
    text_params = random_params_like(bf16(shape_tree(
        lambda: text.init(rng, jnp.zeros((1, 77), jnp.int32))["params"])), 1)
    vae_params = random_params_like(bf16(shape_tree(
        lambda: vae.init(rng, jnp.zeros((1, RES, RES, 3)), rng)["params"])), 2)
    hyper_params = hyper.init(rng, jnp.zeros((1, tcfg.hidden_size)))["params"]
    q_params = quant.init_params(rng)
    q_state = quant.init_state(q_params)
    if KEEP < 1.0:
        # seed the codebook at the pruning operating point: Bernoulli(KEEP)
        # width gates with ≥1 kept per gate site, depth fully kept
        rs = np.random.RandomState(7)
        gs = np.ones((NE, spec.vq_dim), np.float32)
        for sb in spec.subblocks:
            for site in sb.sites:
                m = (rs.rand(NE, site.width) < KEEP).astype(np.float32)
                m[m.sum(axis=1) == 0, 0] = 1.0
                gs[:, site.start: site.start + site.width] = m
        q_state = {"embedding_gs": jnp.asarray(gs)}
        log(f"codebook seeded at keep={KEEP}")
    jax.block_until_ready(unet_params)
    log("params ready")
    return PruningPipeline(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        text_encoder=text, text_params=text_params,
        hypernet=hyper, hypernet_params=hyper_params,
        quantizer=quant, quantizer_params=q_params, quantizer_state=q_state,
    ), spec, ucfg


def main():
    pipe, spec, ucfg = build_pipeline()
    results = {}
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 49408, (N, 77)))
    neg = jnp.zeros((1, 77), jnp.int32)

    if "routed" in MODES:
        # full reference pipeline per BATCH-sized call, pipelined fetches
        nb = N // BATCH
        log("routed: compile")
        outs = pipe(ids[:BATCH], jnp.tile(neg, (BATCH, 1)), jax.random.PRNGKey(9),
                    num_inference_steps=STEPS)
        np.asarray(outs[0])
        t0 = time.perf_counter()
        pend = []
        for i in range(nb):
            imgs, _, _ = pipe(ids[i * BATCH:(i + 1) * BATCH],
                              jnp.tile(neg, (BATCH, 1)),
                              jax.random.PRNGKey(10 + i),
                              num_inference_steps=STEPS)
            pend.append(imgs)
        for im in pend:
            np.asarray(im)
        dt = time.perf_counter() - t0
        results["routed_img_per_sec"] = round(N / dt, 3)
        log(f"routed: {results['routed_img_per_sec']} img/s")

    server = None
    if ("experts" in MODES) or ("hybrid" in MODES):
        from diffusion_pruning_tpu.pipelines.expert_server import (
            ExpertServer, ServingQueue,
        )
        log("experts: materialising (bf16 serving precision)")
        server = ExpertServer.from_codebook(pipe, pipe.unet_params, spec, ucfg,
                                            batch_size=BATCH,
                                            param_dtype=jnp.bfloat16)

    if "hybrid" in MODES:
        # hybrid KEEPS the dense gated U-Net resident: full tiers run
        # materialised experts, sub-tier remainders pool into one gated
        # per-prompt-arch batch
        q = ServingQueue(server, num_inference_steps=STEPS, hybrid=True)
        q.submit(ids, neg)
        log("hybrid: compile + first flush")
        t0 = time.perf_counter()
        q.flush(jax.random.PRNGKey(30))
        log(f"first flush (incl. compiles) {time.perf_counter() - t0:.1f}s")
        q.submit(ids, neg)
        t0 = time.perf_counter()
        q.flush(jax.random.PRNGKey(31))
        dt = time.perf_counter() - t0
        results["hybrid_img_per_sec"] = round(N / dt, 3)
        results["hybrid_slots_used"] = int(q.last_slots_used)
        log(f"hybrid: {results['hybrid_img_per_sec']} img/s "
            f"({q.last_slots_used} slots for {N})")
        # async double-buffering: overlap host routing of flush i+1 with
        # device trajectories of flush i
        q.submit(ids, neg)
        t0 = time.perf_counter()
        f1 = q.flush_async(jax.random.PRNGKey(32))
        q.submit(ids, neg)
        f2 = q.flush_async(jax.random.PRNGKey(33))
        f1.result()
        f2.result()
        dt = time.perf_counter() - t0
        results["hybrid_async_img_per_sec"] = round(2 * N / dt, 3)
        log(f"hybrid async 2-flush: {results['hybrid_async_img_per_sec']} img/s")

    if "experts" in MODES:
        # the dense f32 copy is only needed for slicing; free ~3.5 GB HBM
        import dataclasses as _dc
        pipe_light = _dc.replace(pipe, unet_params=None)
        pipe_light._fn_cache = getattr(pipe, "_fn_cache", {})
        server.base_pipeline = pipe_light
        pipe = pipe_light
        q = ServingQueue(server, num_inference_steps=STEPS)
        q.submit(ids, neg)
        log("experts: compile + first flush")
        t0 = time.perf_counter()
        q.flush(jax.random.PRNGKey(20))
        log(f"first flush (incl. compiles) {time.perf_counter() - t0:.1f}s")
        q.submit(ids, neg)
        t0 = time.perf_counter()
        q.flush(jax.random.PRNGKey(21))
        dt = time.perf_counter() - t0
        results["experts_img_per_sec"] = round(N / dt, 3)
        results["experts_slots_used"] = int(q.last_slots_used)
        log(f"experts: {results['experts_img_per_sec']} img/s "
            f"({q.last_slots_used} slots for {N})")

    print(json.dumps({"metric": f"serving_e2e_{RES}px_ddim{STEPS}", **results}))


if __name__ == "__main__":
    main()
