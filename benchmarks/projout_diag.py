"""Diagnose the slow transformer `proj_out` dots (round-4 profile finding).

The on-chip profile (PERFORMANCE.md round-4) shows each level-0/1
`proj_out` dot_general at ~1.8 TFLOP/s — ~70x off roofline — while the
same-shaped attention `to_out` dots and the 8x-bigger FF dots never appear
in the top ops. This script separates "the matmul is slow" from "XLA fused
something expensive into the dot at that site":

  part A: isolated (2B, HW, C) @ (C, C) + bias (+residual) microbench at
          the exact level-0 shapes, scan-timed (one fetch).
  part B: compile the EXACT bench.py generate program, dump optimized HLO,
          and print every fusion computation that contains a proj_out dot.

  JAX_PLATFORMS='' python benchmarks/projout_diag.py
Env: DPT_RES (256), DPT_BATCH (8), DPT_PART (ab).
"""
import os
import re
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
PART = os.environ.get("DPT_PART", "ab")


def log(m):
    print(f"# projout: {m}", file=sys.stderr, flush=True)


def scan_time(fn, args, iters=30):
    """Chain fn inside one jitted scan, fetch once (verify-skill recipe)."""
    @jax.jit
    def run(a):
        def body(c, _):
            return fn(*c), None
        out, _ = jax.lax.scan(body, a, None, length=iters)
        return jax.tree.map(lambda x: x.astype(jnp.float32).sum(), out)

    r = run(args)
    jax.tree.map(float, r)  # compile + warm
    t0 = time.perf_counter()
    r = run(args)
    jax.tree.map(float, r)
    return (time.perf_counter() - t0) / iters


def part_a():
    hw = (RES // 8) ** 2  # level-0 spatial tokens (latent = RES/8)
    b2 = 2 * BATCH        # CFG doubles the batch
    c = 320
    key = jax.random.PRNGKey(0)
    y = jax.random.normal(key, (b2, hw, c), jnp.bfloat16)
    w = jax.random.normal(key, (c, c), jnp.bfloat16) * 0.05
    bias = jnp.zeros((c,), jnp.bfloat16)
    res = jax.random.normal(key, (b2, hw, c), jnp.bfloat16)

    flops = 2 * b2 * hw * c * c

    def plain(y, w, bias, res):
        return (y @ w + bias, w, bias, res)

    def with_residual(y, w, bias, res):
        return ((y @ w + bias) + res, w, bias, res)

    def with_reshape_residual(y, w, bias, res):
        s = int(hw ** 0.5)
        o = (y @ w + bias).reshape(b2, s, s, c) + res.reshape(b2, s, s, c)
        return (o.reshape(b2, hw, c), w, bias, res)

    for name, fn in [("plain dot+bias", plain),
                     ("dot+bias+residual", with_residual),
                     ("dot+bias+reshape+residual", with_reshape_residual)]:
        dt = scan_time(fn, (y, w, bias, res))
        print(f"A {name:28s} ({b2},{hw},{c})@({c},{c}): "
              f"{dt*1e3:7.3f} ms  {flops/dt/1e12:7.2f} TFLOP/s")


def part_b():
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
        return jnp.sum(sampler.sample(model_fn, latents, 5).astype(jnp.float32))

    log("compiling generate (warm cache expected)")
    compiled = generate.lower(params, ehs, arch, jax.random.PRNGKey(3)).compile()
    txt = compiled.as_text()
    path = f"/tmp/gen_hlo_{RES}.txt"
    with open(path, "w") as f:
        f.write(txt)
    log(f"optimized HLO ({len(txt)/1e6:.1f} MB) -> {path}")

    # computations whose body contains a proj_out-attributed dot
    blocks = re.split(r"\n(?=[%\w].*\{\n)", txt)
    hits = [b for b in blocks
            if re.search(r'op_name="[^"]*proj_out/dot_general', b)]
    # dedupe by structure: keep one exemplar per (linecount, first-line name root)
    print(f"B {len(hits)} computations contain a proj_out dot")
    seen = set()
    for b in hits:
        head = b.splitlines()[0]
        sig = (len(b.splitlines()), re.sub(r"[.\d]+", "", head)[:80])
        if sig in seen:
            continue
        seen.add(sig)
        lines = b.splitlines()
        print("=" * 100)
        print("\n".join(lines[:80]))
        if len(lines) > 80:
            print(f"... ({len(lines) - 80} more lines)")


if __name__ == "__main__":
    if "a" in PART:
        part_a()
    if "b" in PART:
        part_b()
