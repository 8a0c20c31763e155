"""On-chip profile of the DDIM generation hot loop.

Captures a jax.profiler device trace of the bench.py workload (CFG DDIM,
gated SD-2.1 U-Net) and prints the framework-op busy-time table — the map
for kernel work (which fusions/convs/kernels own the device time).

  JAX_PLATFORMS='' python benchmarks/profile_gen.py
Env: DPT_RES (256), DPT_BATCH (4), DPT_STEPS (5 denoise steps — enough for
stable op stats, keeps the trace small).
"""
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

RES = int(os.environ.get("DPT_RES", "256"))
BATCH = int(os.environ.get("DPT_BATCH", "4"))
STEPS = int(os.environ.get("DPT_STEPS", "5"))
TRACE_DIR = os.environ.get("DPT_TRACE_DIR", "/tmp/dpt_trace")


def log(m):
    print(f"# profile: {m}", file=sys.stderr, flush=True)


def main():
    from diffusion_pruning_tpu.core import build_structure
    from diffusion_pruning_tpu.models.unet.config import UNetConfig
    from diffusion_pruning_tpu.models.unet.unet import GatedUNet
    from diffusion_pruning_tpu.schedulers import DDIMSampler, DiffusionSchedule
    from diffusion_pruning_tpu.utils.init_utils import random_params_like, shape_tree

    cfg = UNetConfig.sd21(resolution=RES)
    spec = build_structure(cfg)
    model = GatedUNet(cfg, dtype=jnp.bfloat16)
    st = shape_tree(lambda: model.init_params(jax.random.PRNGKey(0), batch=1))
    st = jax.tree.map(lambda s: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16), st)
    params = random_params_like(st)
    jax.block_until_ready(params)
    log("params ready")

    ehs = jax.random.normal(jax.random.PRNGKey(1),
                            (2 * BATCH, cfg.max_text_len, cfg.cross_attention_dim),
                            jnp.bfloat16)
    arch = (jax.random.uniform(jax.random.PRNGKey(2), (BATCH, spec.vq_dim)) < 0.6
            ).astype(jnp.float32)
    arch = arch.at[:, spec.num_width:].set(1.0)
    sampler = DDIMSampler(DiffusionSchedule())

    @jax.jit
    def generate(p, ehs_in, arch_in, key):
        def model_fn(x, t):
            out = model.apply({"params": p}, jnp.concatenate([x, x]),
                              jnp.concatenate([t, t]), ehs_in, arch=arch_in)
            u, c = jnp.split(out, 2)
            return u + 7.5 * (c - u)

        latents = jax.random.normal(
            key, (BATCH, cfg.sample_size, cfg.sample_size, cfg.in_channels),
            jnp.bfloat16)
        return jnp.sum(sampler.sample(model_fn, latents, STEPS).astype(jnp.float32))

    log("compile+warmup")
    float(generate(params, ehs, arch, jax.random.PRNGKey(3)))
    log("tracing")
    jax.profiler.start_trace(TRACE_DIR)
    float(generate(params, ehs, arch, jax.random.PRNGKey(4)))
    jax.profiler.stop_trace()

    pbs = sorted(glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
                           recursive=True), key=os.path.getmtime)
    assert pbs, f"no xplane under {TRACE_DIR}"
    from xprof.convert.raw_to_tool_data import xspace_to_tool_data
    data, _ = xspace_to_tool_data([pbs[-1]], "framework_op_stats", {})
    # Google DataTable: {"cols": [{id,label},...], "rows": [{"c": [{"v": x},...]}]}
    table = json.loads(data)
    if isinstance(table, list):
        table = table[0]
    ids = [c["id"] for c in table["cols"]]
    i_host = ids.index("host_or_device")
    i_type, i_op = ids.index("type"), ids.index("operation")
    i_self = ids.index("total_self_time")
    out = []
    for r in table["rows"]:
        vals = [c.get("v") for c in r["c"]]
        if vals[i_host] != "Device":
            continue
        out.append((float(vals[i_self] or 0.0), str(vals[i_type]),
                    str(vals[i_op])[:110]))
    out.sort(reverse=True)
    total = sum(t for t, _, _ in out)
    print(f"total device self-time {total/1e3:.1f} ms over {STEPS} denoise steps")
    by_type = {}
    for t, cat, _ in out:
        by_type[cat] = by_type.get(cat, 0.0) + t
    print("-- by op type --")
    for cat, t in sorted(by_type.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{t/1e3:9.2f} ms  {100*t/total:5.1f}%  {cat}")
    print("-- top ops --")
    for t, cat, op in out[:30]:
        print(f"{t/1e3:9.2f} ms  {100*t/total:5.1f}%  {cat:24s} {op}")


if __name__ == "__main__":
    main()
