"""Benchmark: routed DDIM generation throughput on the real chip.

Measures images/sec for the APTP headline serving workload — CFG DDIM
sampling through the gated SD-2.1-topology U-Net with per-prompt expert
architectures (the reference's validation/generation path,
pruning_pipelines.py:767-814). Weights are random (no checkpoint egress);
throughput depends only on architecture + shapes.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the reference paper's A100 PyTorch pipeline for SD-2.1 at
256px/batch runs ~O(1) img/s/GPU at DDIM-25 with CFG; BASELINE.md pins no
wall-clock number, so we report against a conservative 1.0 img/s/chip
placeholder until the A100 recipe is measured.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

A100_BASELINE_IMG_PER_SEC = 1.0  # placeholder; see BASELINE.md

BATCH = 4
STEPS = 25
RES = 256


def main():
    from diffusion_pruning_tpu.core import build_structure
    from diffusion_pruning_tpu.models.unet.config import UNetConfig
    from diffusion_pruning_tpu.models.unet.unet import GatedUNet
    from diffusion_pruning_tpu.schedulers import DDIMSampler, DiffusionSchedule

    cfg = UNetConfig.sd21(resolution=RES)
    spec = build_structure(cfg)
    model = GatedUNet(cfg, dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0), batch=1)

    ehs = jax.random.normal(jax.random.PRNGKey(1),
                            (2 * BATCH, cfg.max_text_len, cfg.cross_attention_dim),
                            jnp.bfloat16)
    # a realistic expert architecture: ~60% of width groups kept
    arch = (jax.random.uniform(jax.random.PRNGKey(2), (BATCH, spec.vq_dim)) < 0.6
            ).astype(jnp.float32)
    arch = arch.at[:, spec.num_width:].set(1.0)

    schedule = DiffusionSchedule()
    sampler = DDIMSampler(schedule)
    guidance = 7.5

    def model_fn(x, t):
        x_in = jnp.concatenate([x, x])
        t_in = jnp.concatenate([t, t])
        out = model.apply({"params": params}, x_in, t_in, ehs, arch=arch)
        uncond, cond = jnp.split(out, 2)
        return uncond + guidance * (cond - uncond)

    @jax.jit
    def generate(key):
        latents = jax.random.normal(
            key, (BATCH, cfg.sample_size, cfg.sample_size, cfg.in_channels), jnp.bfloat16)
        return sampler.sample(model_fn, latents, STEPS)

    # compile + warmup
    generate(jax.random.PRNGKey(3)).block_until_ready()

    n_iters = 3
    t0 = time.perf_counter()
    for i in range(n_iters):
        generate(jax.random.PRNGKey(10 + i)).block_until_ready()
    dt = (time.perf_counter() - t0) / n_iters

    img_per_sec = BATCH / dt
    print(json.dumps({
        "metric": f"ddim{STEPS}_cfg_images_per_sec_per_chip_{RES}px",
        "value": round(img_per_sec, 4),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / A100_BASELINE_IMG_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
