"""Serving cold-start: time ExpertServer.warmup() with/without AOT artifacts.

Run TWICE with DPT_AOT_DIR set: the first run traces + compiles + exports
every (expert, tier) denoise program; the second deserializes them all
(pipelines/aot.py) and shows the cold-start a production server restart
actually pays. Without DPT_AOT_DIR it times the pure trace+compile path
(the persistent .jax_cache still skips recompiles across runs).

  JAX_PLATFORMS='' DPT_AOT_DIR=/tmp/dpt_aot python benchmarks/coldstart_bench.py
Env: DPT_RES (256), DPT_BATCH (8 — tier set {1,2,4,8}), DPT_NE (8),
DPT_KEEP (0.6), DPT_AOT_DIR (unset = no AOT), DPT_STEPS (25),
DPT_WARM_PAR (1 — thread-pool width for warmup program prep).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

AOT_DIR = os.environ.get("DPT_AOT_DIR") or None
STEPS = int(os.environ.get("DPT_STEPS", "25"))
WARM_PAR = int(os.environ.get("DPT_WARM_PAR", "1"))


def main():
    import jax.numpy as jnp
    from serving_bench import build_pipeline, BATCH, NE, log
    from diffusion_pruning_tpu.pipelines.expert_server import ExpertServer

    pipe, spec, ucfg = build_pipeline()
    t0 = time.perf_counter()
    server = ExpertServer.from_codebook(
        pipe, pipe.unet_params, spec, ucfg,
        batch_size=BATCH, param_dtype=jnp.bfloat16)
    t_mat = time.perf_counter() - t0
    log(f"materialised {NE} experts in {t_mat:.1f}s")

    t0 = time.perf_counter()
    stats = server.warmup(num_inference_steps=STEPS, aot_dir=AOT_DIR,
                          parallel=WARM_PAR)
    t_warm = time.perf_counter() - t0
    print(json.dumps({
        "metric": "serving_coldstart_warmup_s",
        "value": round(t_warm, 1),
        "materialise_s": round(t_mat, 1),
        "aot": AOT_DIR is not None, "parallel": WARM_PAR, **stats,
    }))


if __name__ == "__main__":
    main()
