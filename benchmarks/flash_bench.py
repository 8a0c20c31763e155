"""Isolated flash-attention bench at the SD-2.1 level-0 shapes (round 4).

The on-chip profile shows our packed-pair kernel at ~12 TFLOP/s at S=4096
(25% of the 512px step). This times our kernel against the XLA fused path
and jax's library TPU flash kernel (jax.experimental.pallas.ops.tpu
.flash_attention, ungated) as an upper bar, per shape, scan-timed.

  JAX_PLATFORMS='' python benchmarks/flash_bench.py
Env: DPT_SHAPES ("8x4096x5x64,16x1024x5x64"), DPT_ITERS (20),
DPT_ARMS (ours,ours_nogate,jaxlib,xla).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ITERS = int(os.environ.get("DPT_ITERS", "20"))
SHAPES = os.environ.get("DPT_SHAPES", "8x4096x5x64,16x1024x5x64")
ARMS = os.environ.get("DPT_ARMS", "ours,ours_nogate,jaxlib,xla").split(",")


def bench(name, fn, q, k, v, gate, flops):
    @jax.jit
    def run(q, k, v, gate):
        def body(acc, _):
            qi = q * (1.0 + 1e-12 * acc).astype(q.dtype)
            o = fn(qi, k, v, gate)
            return acc + o.astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return acc

    try:
        float(run(q, k, v, gate))
        t0 = time.perf_counter()
        float(run(q, k, v, gate))
        dt = (time.perf_counter() - t0) / ITERS
    except Exception as e:
        print(f"  {name:12s} FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return
    print(f"  {name:12s} {dt*1e3:8.3f} ms  {flops/dt/1e12:7.2f} TFLOP/s",
          flush=True)


def main():
    from diffusion_pruning_tpu.ops.flash_attention import flash_attention

    for spec in SHAPES.split(","):
        b, s, h, d = map(int, spec.split("x"))
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 4)
        q = jax.random.normal(ks[0], (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, s, h, d), jnp.bfloat16)
        gate = jax.nn.sigmoid(jax.random.normal(ks[3], (b, h)))
        flops = 4 * b * h * s * s * d
        print(f"(B={b}, S={s}, H={h}, D={d})  {flops/1e9:.1f} GFLOP",
              flush=True)

        if "ours" in ARMS:
            bench("ours(gated)",
                  lambda q, k, v, g: flash_attention(q, k, v, g, 512, False),
                  q, k, v, gate, flops)
        if "ours_nogate" in ARMS:
            bench("ours",
                  lambda q, k, v, g: flash_attention(q, k, v, None, 512, False),
                  q, k, v, gate, flops)
        if "jaxlib" in ARMS:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention as jl_flash,
            )
            # library kernel wants (B, H, S, D)
            def jl(q, k, v, g):
                o = jl_flash(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                             v.transpose(0, 2, 1, 3))
                return o.transpose(0, 2, 1, 3)
            bench("jaxlib", jl, q, k, v, gate, flops)
        if "xla" in ARMS:
            bench("xla_sdpa",
                  lambda q, k, v, g: jax.nn.dot_product_attention(q, k, v),
                  q, k, v, gate, flops)


if __name__ == "__main__":
    main()
