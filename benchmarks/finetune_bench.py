"""Stage-2 expert fine-tune step throughput on the real chip (VERDICT r1 #7).

Teacher (dense) fwd + student (materialised 0.6-MACs expert) fwd/bwd +
min-SNR diffusion + output/block distillation + AdamW, at the reference
config: 256px, batch 128 (configs/finetuning/sd-2-1_coco2014.yaml:46,54).

  JAX_PLATFORMS='' python benchmarks/finetune_bench.py
Env: DPT_RES (256), DPT_BATCH (128), DPT_FLASH (1), DPT_REMAT (0),
DPT_KEEP (0.6 — target expert MACs ratio for the random plan).
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
BATCH = int(os.environ.get("DPT_BATCH", "128"))
FLASH = os.environ.get("DPT_FLASH", "1") == "1"
REMAT = os.environ.get("DPT_REMAT", "0") == "1"
FUSED_NC = os.environ.get("DPT_FUSED_NC", "0") == "1"
KEEP = float(os.environ.get("DPT_KEEP", "0.6"))


def log(m):
    print(f"# finetune: {m}", file=sys.stderr, flush=True)


def main():
    from diffusion_pruning_tpu.core import build_structure
    from diffusion_pruning_tpu.models.text_encoders import CLIPTextConfig, CLIPTextEncoder
    from diffusion_pruning_tpu.models.unet.config import UNetConfig
    from diffusion_pruning_tpu.models.unet.pruned import (
        expert_macs_ratio, make_expert_plan, slice_expert_params,
    )
    from diffusion_pruning_tpu.models.unet.unet import GatedUNet
    from diffusion_pruning_tpu.models.vae import AutoencoderKL, VAEConfig
    from diffusion_pruning_tpu.schedulers import DiffusionSchedule
    from diffusion_pruning_tpu.training.finetuner import (
        FineTuneConfig, FineTunerModules, make_finetune_optimizer, make_finetune_step,
    )
    from diffusion_pruning_tpu.utils.init_utils import random_params_like, shape_tree

    ucfg = UNetConfig.sd21(resolution=RES, use_flash_attention=FLASH, remat=REMAT,
                           fused_norm_conv=FUSED_NC)
    spec = build_structure(ucfg)

    # a realistic expert: random gates at the KEEP point, depth gates kept
    rng = np.random.RandomState(0)
    arch = (rng.rand(spec.vq_dim) < KEEP).astype(np.float32)
    arch[spec.num_width:] = 1.0
    for sb in spec.subblocks:
        for site in sb.sites:
            arch[site.start] = 1.0
    plan = make_expert_plan(spec, arch)
    log(f"expert MACs ratio {expert_macs_ratio(spec, plan):.3f}")

    teacher = GatedUNet(ucfg, dtype=jnp.bfloat16)
    student = GatedUNet(ucfg, plan=plan, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    log("materialising teacher params on device")
    dense = random_params_like(shape_tree(lambda: teacher.init_params(key, batch=1)))
    jax.block_until_ready(dense)
    log("slicing expert params")
    student_params = jax.jit(lambda p: jax.tree.map(
        jnp.asarray, slice_expert_params(p, plan)))(dense)
    jax.block_until_ready(student_params)

    tcfg = CLIPTextConfig.sd21()
    text = CLIPTextEncoder(tcfg, dtype=jnp.bfloat16)
    # frozen models are bf16-compute; keeping their params f32 wastes ~2.5 GB
    frozen = {
        "teacher": jax.jit(lambda p: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16), p), donate_argnums=0)(dense),
        "vae": {},
        "text": random_params_like(jax.tree.map(
            lambda s: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16),
            shape_tree(lambda: text.init(key, jnp.zeros((1, 77), jnp.int32))["params"])), 1),
    }
    mods = FineTunerModules(student=student, teacher=teacher,
                            vae=AutoencoderKL(VAEConfig.sd(), dtype=jnp.bfloat16),
                            text_encoder=text, schedule=DiffusionSchedule())
    cfg = FineTuneConfig(adam_mu_bf16=os.environ.get("DPT_MU_BF16", "0") == "1")
    accum = int(os.environ.get("DPT_ACCUM", "1"))
    opt = make_finetune_optimizer(cfg, global_batch=BATCH)
    step = make_finetune_step(mods, cfg, opt, mesh=None, donate=True,
                              accum_steps=accum)
    opt_state = opt.init(student_params)

    s = ucfg.sample_size
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    batch = {
        "latent_mean": jax.random.normal(ks[0], (BATCH, s, s, 4)),
        "latent_logvar": jnp.full((BATCH, s, s, 4), -6.0),
        "input_ids": jax.random.randint(ks[1], (BATCH, 77), 0, tcfg.vocab_size),
    }
    log("compiling step")
    t0 = time.perf_counter()
    params, opt_state, metrics = step(student_params, frozen, opt_state, batch,
                                      jax.random.PRNGKey(2))
    loss0 = float(metrics["loss"])
    log(f"compile+first step {time.perf_counter() - t0:.1f}s loss={loss0:.4f}")

    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, metrics = step(params, frozen, opt_state, batch,
                                          jax.random.PRNGKey(3 + i))
        _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    from _mfu import step_mfu
    mfu = step_mfu(step, (params, frozen, opt_state, batch,
                          jax.random.PRNGKey(2)), dt)
    if accum > 1 and mfu.get("flops"):
        # XLA cost analysis counts a while/scan body ONCE; the gradient-
        # accumulation scan runs `accum` times and dominates the step (the
        # once-run optimizer update is elementwise — negligible flops), so
        # scale. Error < 1%.
        for k_ in ("flops", "tflops_per_s", "mfu"):
            if mfu.get(k_) is not None:
                mfu[k_] = round(mfu[k_] * accum, 4)
    print(json.dumps({
        "metric": f"stage2_finetune_samples_per_sec_per_chip_{RES}px_b{BATCH}"
                  + (f"_accum{accum}" if accum > 1 else ""),
        "value": round(BATCH / dt, 2),
        "ms_per_step": round(dt * 1000, 1),
        "flash": FLASH, "remat": REMAT, "expert_keep": KEEP,
        **mfu,
    }))


if __name__ == "__main__":
    main()
