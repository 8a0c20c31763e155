"""Microbench: fused GroupNorm(+SiLU)→conv3x3 kernel vs the XLA chain.

Times the resnet norm→conv pair at the SD-2.1 shapes the 256px generation
workload runs (CFG-doubled batch 16), fused (ops/norm_conv.py) vs unfused
(GroupNorm fusion + standalone conv HLO). The end-to-end ladder lives in
bench.py (DPT_BENCH_FUSED_NC=1).

  JAX_PLATFORMS='' python benchmarks/norm_conv_bench.py

Env: DPT_BATCH (16), DPT_RES (256), DPT_ITERS (30), DPT_SCAN_TIMING (0).

DPT_SCAN_TIMING=1 wraps each op in a lax.scan chain inside ONE jitted
program and fetches a single scalar — the per-call timing mode pays the
~30 ms tunnel RTT per fetch, which swamps ~1 ms kernels; scan timing
amortises it (the chain's feedback add costs both arms equally, so the
Δms/iter between arms stays meaningful even though ratios compress).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(os.path.join(os.path.dirname(__file__),
                                               "..", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from diffusion_pruning_tpu.ops.norm_conv import (  # noqa: E402
    _pick_tiles, _reference, group_norm_silu_conv3x3)

BATCH = int(os.environ.get("DPT_BATCH", "16"))
RES = int(os.environ.get("DPT_RES", "256"))
ITERS = int(os.environ.get("DPT_ITERS", "30"))
GROUPS = 32


def shapes():
    s = RES // 8
    # (H, W, C_in, C_out): the resnet norm→conv pairs of the SD-2.1 levels,
    # incl. the concat-input up-block norm1→conv1 cases
    return [
        (s, s, 320, 320),
        (s, s, 640, 320),        # up level-0 concat
        (s // 2, s // 2, 640, 640),
        (s // 2, s // 2, 1280, 640),
        (s // 4, s // 4, 1280, 1280),
        (s // 4, s // 4, 2560, 1280),
        (s // 8, s // 8, 1280, 1280),
        (s // 8, s // 8, 2560, 1280),
    ]


SCAN_TIMING = os.environ.get("DPT_SCAN_TIMING", "0") == "1"


def time_fn(fn, args, iters):
    if SCAN_TIMING:
        return time_fn_scan(fn, args, iters)
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))  # force completion (compile)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    for o in outs:
        float(jnp.sum(o.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def time_fn_scan(fn, args, iters, reps=3):
    """Time `iters` chained applications inside one jitted scan.

    Fetches one scalar per `run` call: one compile fetch, then `reps` timed
    fetches (so reps*iters op applications amortise reps tunnel RTTs).
    The carry feeds each output back into the input's leading channels
    (cout <= cin for every shape here) so XLA cannot hoist or elide the op;
    that feedback add costs both arms identically.
    """
    x0, rest = args[0], args[1:]

    def body(carry, _):
        out = fn(carry, *rest)
        cout = out.shape[-1]
        upd = (carry[..., :cout] + out.astype(carry.dtype) *
               jnp.asarray(1e-3, carry.dtype))
        carry = jnp.concatenate([upd, carry[..., cout:]], axis=-1)
        return carry, ()

    @jax.jit
    def run(x, *rest_):
        y, _ = jax.lax.scan(lambda c, u: body(c, u), x, None, length=iters)
        return jnp.sum(y.astype(jnp.float32))

    float(run(x0, *rest))  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        float(run(x0, *rest))
    return (time.perf_counter() - t0) / (reps * iters) * 1e3


def main():
    key = jax.random.PRNGKey(0)
    print(f"# norm_conv bench: B={BATCH} res={RES} iters={ITERS}")
    if SCAN_TIMING:
        print("# scan timing: a ~0.9 ms/iter feedback pedestal is shared by"
              " both arms — compare the Δms column, not the ratio")
    tot_f = tot_r = 0.0
    cov_f = cov_r = 0.0  # totals over shapes where the Pallas kernel RAN
    n_fallback = 0
    for (h, w, c, cout) in shapes():
        ks = jax.random.split(key, 5)
        x = jax.random.normal(ks[0], (BATCH, h, w, c), jnp.bfloat16)
        scale = jnp.ones((c,), jnp.float32)
        bias = jnp.zeros((c,), jnp.float32)
        kern = (0.05 * jax.random.normal(ks[1], (3, 3, c, cout))
                ).astype(jnp.bfloat16)
        cb = jnp.zeros((cout,), jnp.float32)

        fused = jax.jit(lambda x, s, b, k, cb: group_norm_silu_conv3x3(
            x, s, b, k, cb, None, GROUPS, 1e-5, True, False))
        ref = jax.jit(lambda x, s, b, k, cb: _reference(
            x, s, b, k, cb, None, GROUPS, 1e-5, True))
        tr = time_fn(ref, (x, scale, bias, kern, cb), ITERS)
        tf = time_fn(fused, (x, scale, bias, kern, cb), ITERS)
        tot_f += tf
        tot_r += tr
        # _forward falls back to _reference when the shape exceeds the VMEM
        # budget — that row times XLA vs XLA and must not be read as kernel
        # coverage.
        fallback = _pick_tiles(h, w, c, cout, x.dtype.itemsize) is None
        if fallback:
            n_fallback += 1
        else:
            cov_f += tf
            cov_r += tr
        note = "  FALLBACK — fused arm is _reference" if fallback else ""
        extra = f"  Δ{tr - tf:+7.3f} ms" if SCAN_TIMING else ""
        print(f"  ({BATCH},{h:3d},{w:3d},{c:4d})->{cout:4d}: "
              f"xla {tr:7.3f} ms  fused {tf:7.3f} ms  ({tr / tf:.2f}x)"
              f"{extra}{note}")
    print(f"# totals (all shapes): xla {tot_r:.2f} ms  fused {tot_f:.2f} ms  "
          f"({tot_r / tot_f:.2f}x)")
    if n_fallback:
        print(f"# kernel-covered shapes only ({8 - n_fallback}/8; "
              f"{n_fallback} VMEM-budget fallbacks excluded): "
              f"xla {cov_r:.2f} ms  fused {cov_f:.2f} ms  "
              f"({(cov_r / cov_f) if cov_f else float('nan'):.2f}x)")

    # transformer norm→proj_in (1×1 / Dense) variant
    from diffusion_pruning_tpu.ops.norm_conv import (
        _linear_reference, group_norm_linear)
    s = RES // 8
    for (hw, c) in [(s * s, 320), (s * s // 4, 640), (s * s // 16, 1280)]:
        ks = jax.random.split(jax.random.PRNGKey(1), 2)
        x = jax.random.normal(ks[0], (BATCH, hw, c), jnp.bfloat16)
        kern = (0.05 * jax.random.normal(ks[1], (c, c))).astype(jnp.bfloat16)
        scale = jnp.ones((c,), jnp.float32)
        bias = jnp.zeros((c,), jnp.float32)
        lb = jnp.zeros((c,), jnp.float32)
        fused = jax.jit(lambda x, s_, b, k, lb: group_norm_linear(
            x, s_, b, k, lb, None, GROUPS, 1e-6, False))
        ref = jax.jit(lambda x, s_, b, k, lb: _linear_reference(
            x, s_, b, k, lb, None, GROUPS, 1e-6))
        tr = time_fn(ref, (x, scale, bias, kern, lb), ITERS)
        tf = time_fn(fused, (x, scale, bias, kern, lb), ITERS)
        print(f"  linear ({BATCH},{hw:5d},{c:4d}): "
              f"xla {tr:7.3f} ms  fused {tf:7.3f} ms  ({tr / tf:.2f}x)")


if __name__ == "__main__":
    main()
