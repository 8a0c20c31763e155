"""A/B the GEGLU feed-forward forms (round-4 `mul` target).

Post-`dense_2d`, the GEGLU split+gelu+multiply stands alone as a kLoop
fusion (12.2% of the 256px step, PERFORMANCE.md round-4 profile). This
times the full FF chain (proj GEMM -> gate/gelu/mul -> out GEMM + residual)
at the SD-2.1 transformer shapes for candidate rewrites, all exact-math
reparameterisations of the same checkpoint tree:

  split     current module form: one (C, 2I) GEMM, jnp.split, gelu, mul
  split2d   same but the elementwise chain stays rank-2 (one reshape at
            entry/exit) - tests whether the (B,S,*) bitcasts block fusion
  twodot    h = x@W[:, :I], g = x@W[:, I:] (sliced views of the SAME
            param): gelu can ride g's GEMM epilogue and the mul can fuse
            into the consumer GEMM
  twodot_f32g  twodot but gelu computed in f32 (numerics probe, not a
            candidate default)

  JAX_PLATFORMS='' python benchmarks/geglu_bench.py
Env: DPT_ITERS (20), DPT_GATED (1), DPT_SHAPES
     ("16x1024x320,16x256x640,16x64x1280,8x4096x320"), DPT_DUMP (unset;
     =arm name dumps optimized HLO fusions containing gelu/mul for that arm).
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
GATED = os.environ.get("DPT_GATED", "1") == "1"
SHAPES = os.environ.get("DPT_SHAPES", "16x1024x320,16x256x640,16x64x1280,8x4096x320")
DUMP = os.environ.get("DPT_DUMP")
GATE_WIDTH = 4  # ff_gate_width in the SD-2.1 config


def gate_mask(gate, inner, b):
    from diffusion_pruning_tpu.ops.gates import channel_mask
    return channel_mask(gate, inner, b)


def make_arms(b, s, c, inner):
    """Each arm: fn(x, w, bias, wo, bo, gate, res) -> (B, S, C)."""

    def apply_gate3(h, gate):
        if gate is None:
            return h
        m = gate_mask(gate, h.shape[-1], h.shape[0])
        return h * m[:, None, :].astype(h.dtype)

    def split(x, w, bias, wo, bo, gate, res):
        x2 = x.reshape(b * s, c)
        hg = (x2 @ w + bias).reshape(b, s, 2 * inner)
        h, g = jnp.split(hg, 2, axis=-1)
        h = apply_gate3(h, gate)
        g = apply_gate3(g, gate)
        y = h * jax.nn.gelu(g, approximate=False)
        return (y.reshape(b * s, inner) @ wo + bo).reshape(b, s, c) + res

    def split2d(x, w, bias, wo, bo, gate, res):
        x2 = x.reshape(b * s, c)
        hg = x2 @ w + bias
        h, g = jnp.split(hg, 2, axis=-1)
        if gate is not None:
            m = gate_mask(gate, inner, b)                      # (B, I)
            m2 = jnp.broadcast_to(m[:, None, :], (b, s, inner)
                                  ).reshape(b * s, inner).astype(h.dtype)
            h = h * m2
            g = g * m2
        y = h * jax.nn.gelu(g, approximate=False)
        return (y @ wo + bo).reshape(b, s, c) + res

    def _twodot(x, w, bias, wo, bo, gate, res, gdt):
        x2 = x.reshape(b * s, c)
        h = (x2 @ w[:, :inner] + bias[:inner]).reshape(b, s, inner)
        g = (x2 @ w[:, inner:] + bias[inner:]).reshape(b, s, inner)
        h = apply_gate3(h, gate)
        g = apply_gate3(g, gate)
        y = h * jax.nn.gelu(g.astype(gdt), approximate=False).astype(h.dtype)
        return (y.reshape(b * s, inner) @ wo + bo).reshape(b, s, c) + res

    def twodot(x, w, bias, wo, bo, gate, res):
        return _twodot(x, w, bias, wo, bo, gate, res, jnp.bfloat16)

    def twodot_f32g(x, w, bias, wo, bo, gate, res):
        return _twodot(x, w, bias, wo, bo, gate, res, jnp.float32)

    return {"split": split, "split2d": split2d, "twodot": twodot,
            "twodot_f32g": twodot_f32g}


def bench_arm(name, fn, args, flops):
    @jax.jit
    def run(x, w, bias, wo, bo, gate, res):
        def body(acc, _):
            xi = x * (1.0 + 1e-12 * acc).astype(x.dtype)
            o = fn(xi, w, bias, wo, bo, gate, res)
            return acc + o.astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return acc

    if DUMP == name:
        lowered = jax.jit(fn).lower(*args)
        txt = lowered.compile().as_text()
        for block in txt.split("\n\n"):
            if ("gelu" in block or "erf" in block.lower() or
                    ("fusion" in block and "multiply" in block)):
                print(block[:4000])
                print("=" * 80)
    try:
        v1 = float(run(*args))
        t0 = time.perf_counter()
        v2 = float(run(*args))
        dt = (time.perf_counter() - t0) / ITERS
    except Exception as e:
        print(f"  {name:12s} FAILED: {type(e).__name__}: {str(e)[:110]}",
              flush=True)
        return None, None
    return dt, (v1, v2)


def main():
    key = jax.random.PRNGKey(0)
    for spec in SHAPES.split(","):
        b, s, c = map(int, spec.split("x"))
        inner = 4 * c
        ks = jax.random.split(key, 6)
        x = jax.random.normal(ks[0], (b, s, c), jnp.bfloat16)
        w = jax.random.normal(ks[1], (c, 2 * inner), jnp.bfloat16) * 0.03
        bias = jnp.zeros((2 * inner,), jnp.bfloat16)
        wo = jax.random.normal(ks[2], (inner, c), jnp.bfloat16) * 0.03
        bo = jnp.zeros((c,), jnp.bfloat16)
        gate = (0.5 + 0.5 * jax.random.uniform(ks[3], (b, GATE_WIDTH),
                                               jnp.float32)) if GATED else None
        res = jax.random.normal(ks[4], (b, s, c), jnp.bfloat16)
        flops = 2 * b * s * c * 2 * inner + 2 * b * s * inner * c
        print(f"shape B={b} S={s} C={c} I={inner} gated={GATED} "
              f"({flops/1e9:.1f} GFLOP)", flush=True)
        base = None
        vals = {}
        for name, fn in make_arms(b, s, c, inner).items():
            dt, v = bench_arm(name, fn, (x, w, bias, wo, bo, gate, res), flops)
            if dt is None:
                continue
            vals[name] = v
            if base is None:
                base = dt
            print(f"  {name:12s} {dt*1e3:8.3f} ms  {flops/dt/1e12:7.2f} TFLOP/s"
                  f"  d={1e3*(dt-base):+6.3f} ms", flush=True)
        # numerics: all arms are the same math modulo bf16 association
        if "split" in vals and "twodot" in vals:
            a, t = vals["split"][1], vals["twodot"][1]
            rel = abs(a - t) / max(abs(a), 1e-9)
            print(f"  checksum rel-diff split vs twodot: {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
