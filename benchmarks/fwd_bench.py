"""U-Net forward micro-bench: variants in one process (shared tunnel, less
noise than full bench.py reruns).

  JAX_PLATFORMS='' python benchmarks/fwd_bench.py
Env: DPT_RES (256), DPT_BATCH (8 — the CFG-doubled generation batch),
DPT_VARIANTS (comma list of flash,sdpa).
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
BATCH = int(os.environ.get("DPT_BATCH", "8"))
VARIANTS = os.environ.get("DPT_VARIANTS", "flash,sdpa").split(",")


def log(m):
    print(f"# fwd: {m}", file=sys.stderr, flush=True)


def main():
    from diffusion_pruning_tpu.core import build_structure
    from diffusion_pruning_tpu.models.unet.config import UNetConfig
    from diffusion_pruning_tpu.models.unet.unet import GatedUNet
    from diffusion_pruning_tpu.utils.init_utils import random_params_like, shape_tree

    results = {}
    params = None
    for variant in VARIANTS:
        cfg = UNetConfig.sd21(resolution=RES,
                              use_flash_attention=(variant == "flash"))
        spec = build_structure(cfg)
        model = GatedUNet(cfg, dtype=jnp.bfloat16)
        if params is None:
            log("materialising params")
            params = random_params_like(shape_tree(
                lambda: model.init_params(jax.random.PRNGKey(0), batch=1)))
            jax.block_until_ready(params)
            ks = jax.random.split(jax.random.PRNGKey(1), 3)
            sample = jax.random.normal(
                ks[0], (BATCH, cfg.sample_size, cfg.sample_size, cfg.in_channels),
                jnp.bfloat16)
            t = jnp.zeros((BATCH,), jnp.int32)
            ehs = jax.random.normal(ks[1], (BATCH, 77, cfg.cross_attention_dim),
                                    jnp.bfloat16)
            arch = (jax.random.uniform(ks[2], (BATCH, spec.vq_dim)) < 0.6
                    ).astype(jnp.float32)
            arch = arch.at[:, spec.num_width:].set(1.0)

        SCAN = 20

        # amortise the ~30 ms axon per-dispatch latency: SCAN chained
        # forwards inside ONE jitted program (CLAUDE.md)
        @jax.jit
        def fwd_loop(p, x, tt, e, a):
            def body(carry, _):
                out = model.apply({"params": p}, carry, tt, e, arch=a)
                return out.astype(carry.dtype), None

            out, _ = jax.lax.scan(body, x, None, length=SCAN)
            return jnp.sum(out.astype(jnp.float32))

        t0 = time.perf_counter()
        float(fwd_loop(params, sample, t, ehs, arch))
        log(f"{variant}: compile {time.perf_counter() - t0:.1f}s")
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            float(fwd_loop(params, sample, t, ehs, arch))
        ms = (time.perf_counter() - t0) / (iters * SCAN) * 1000
        results[variant] = round(ms, 2)
        log(f"{variant}: {ms:.2f} ms/fwd (batch {BATCH})")
    print(json.dumps({"metric": f"unet_fwd_ms_{RES}px_b{BATCH}", **results}))


if __name__ == "__main__":
    main()
