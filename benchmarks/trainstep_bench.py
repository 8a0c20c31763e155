"""Stage-1 pruning train-step throughput on the real chip.

Full compound step: (cached-latent or VAE) encode + CLIP text encode +
hypernet + Sinkhorn + teacher U-Net fwd + student U-Net fwd/bwd + all six
losses + AdamW. Reference config: 256px, per-device batch 64
(configs/pruning/sd-2-1_coco2014.yaml:61,69).

  JAX_PLATFORMS='' python benchmarks/trainstep_bench.py
Env: DPT_RES (256), DPT_BATCH (64), DPT_FLASH (1), DPT_LATENT_CACHE (1),
DPT_REMAT (0).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

RES = int(os.environ.get("DPT_RES", "256"))
BATCH = int(os.environ.get("DPT_BATCH", "64"))
FLASH = os.environ.get("DPT_FLASH", "1") == "1"
LATENT_CACHE = os.environ.get("DPT_LATENT_CACHE", "1") == "1"
REMAT = os.environ.get("DPT_REMAT", "0") == "1"
FUSED_NC = os.environ.get("DPT_FUSED_NC", "0") == "1"


def log(m):
    print(f"# trainstep: {m}", file=sys.stderr, flush=True)


def main():
    from diffusion_pruning_tpu.core import build_structure
    from diffusion_pruning_tpu.models.hypernet import HyperStructure
    from diffusion_pruning_tpu.models.quantizer import StructureQuantizer
    from diffusion_pruning_tpu.models.text_encoders import CLIPTextConfig, CLIPTextEncoder
    from diffusion_pruning_tpu.models.unet.config import UNetConfig
    from diffusion_pruning_tpu.models.unet.unet import GatedUNet
    from diffusion_pruning_tpu.models.vae import AutoencoderKL, VAEConfig
    from diffusion_pruning_tpu.schedulers import DiffusionSchedule
    from diffusion_pruning_tpu.training import PrunerConfig, PrunerModules, make_pruner_step
    from diffusion_pruning_tpu.training.pruner import make_optimizer
    from diffusion_pruning_tpu.utils.init_utils import random_params_like, shape_tree

    ucfg = UNetConfig.sd21(resolution=RES, use_flash_attention=FLASH, remat=REMAT,
                           fused_norm_conv=FUSED_NC)
    tcfg = CLIPTextConfig.sd21()
    vcfg = VAEConfig.sd()
    spec = build_structure(ucfg)
    mods = PrunerModules(
        unet=GatedUNet(ucfg, dtype=jnp.bfloat16),
        vae=AutoencoderKL(vcfg, dtype=jnp.bfloat16),
        text_encoder=CLIPTextEncoder(tcfg, dtype=jnp.bfloat16),
        hypernet=HyperStructure(spec, input_dim=768),
        quantizer=StructureQuantizer(
            spec, n_e=8, base=3.0,
            depth_order=(-1, -2, 0, 1, -3, -4, 2, 3, -5, -6, 4, 5, -7, 6)),
        schedule=DiffusionSchedule(),
    )
    log("materialising params on device")
    rng = jax.random.PRNGKey(0)
    # every model in `frozen` really is frozen in stage 1 → bf16 params
    # (the reference's mixed-precision weight_dtype cast, trainer.py:456-466)
    mp_bf16 = os.environ.get("DPT_MP_BF16", "1") == "1"

    def maybe_bf16(st):
        if not mp_bf16:
            return st
        return jax.tree.map(lambda s: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16), st)

    frozen = {
        "unet": random_params_like(maybe_bf16(shape_tree(
            lambda: mods.unet.init_params(rng, batch=1)))),
        "text": random_params_like(maybe_bf16(shape_tree(
            lambda: mods.text_encoder.init(rng, jnp.zeros((1, 77), jnp.int32))["params"])), 1),
    }
    if LATENT_CACHE:
        frozen["vae"] = {}
    else:
        frozen["vae"] = random_params_like(shape_tree(
            lambda: mods.vae.init(rng, jnp.zeros((1, RES, RES, 3)), rng)["params"]), 2)
    trainable = {
        "hypernet": random_params_like(shape_tree(
            lambda: mods.hypernet.init(rng, jnp.zeros((1, 768)))["params"]), 3),
        "quantizer": mods.quantizer.init_params(rng),
    }
    jax.block_until_ready(trainable)
    log("params ready")

    cfg = PrunerConfig()
    opt = make_optimizer(cfg, global_batch=BATCH)
    step = make_pruner_step(mods, cfg, opt, mesh=None, pretrain=False)
    opt_state = opt.init(trainable)

    s = ucfg.sample_size
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    batch = {
        "input_ids": jax.random.randint(ks[1], (BATCH, 77), 0, tcfg.vocab_size),
        "mpnet_embeddings": jax.random.normal(ks[2], (BATCH, 768)),
    }
    if LATENT_CACHE:
        batch["latent_mean"] = jax.random.normal(ks[0], (BATCH, s, s, 4))
        batch["latent_logvar"] = jnp.full((BATCH, s, s, 4), -6.0)
    else:
        batch["pixel_values"] = jax.random.normal(ks[0], (BATCH, RES, RES, 3)) * 0.5

    log("compiling step")
    t0 = time.perf_counter()
    tr, ost, qs, metrics, aux = step(trainable, frozen, opt_state, batch,
                                     jax.random.PRNGKey(2))
    loss0 = float(metrics["loss"])  # forces completion
    log(f"compile+first step {time.perf_counter() - t0:.1f}s loss={loss0:.4f}")

    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        tr, ost, qs, metrics, aux = step(tr, frozen, ost, batch,
                                         jax.random.PRNGKey(3 + i))
        _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    from _mfu import step_mfu
    mfu = step_mfu(step, (tr, frozen, ost, batch, jax.random.PRNGKey(2)), dt)
    print(json.dumps({
        "metric": f"stage1_trainstep_samples_per_sec_per_chip_{RES}px_b{BATCH}",
        "value": round(BATCH / dt, 2),
        "ms_per_step": round(dt * 1000, 1),
        "flash": FLASH, "latent_cache": LATENT_CACHE, "remat": REMAT,
        **mfu,
    }))


if __name__ == "__main__":
    main()
