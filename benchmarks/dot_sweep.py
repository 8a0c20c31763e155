"""Shape sweep for the slow small-N/K dot lowering (round-4 proj_out bug).

Times 2D bf16 matmuls (M, K) @ (K, N) in one jitted scan each (single
fetch; there is a ~0.9 ms/iter scan pedestal on this tunnel — the BIG
calibration rows expose it, compare deltas).

  JAX_PLATFORMS='' python benchmarks/dot_sweep.py
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

ITERS = int(os.environ.get("DPT_ITERS", "30"))


def scan_time(m, k, n, dtype=jnp.bfloat16, pet=None):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m, k), dtype)
    w = jax.random.normal(key, (k, n), dtype) * 0.05

    @jax.jit
    def run(x, w):
        def body(acc, _):
            # acc-dependent input defeats loop-invariant hoisting; the
            # full-output reduction keeps every dot live. Costs one (M, K)
            # elementwise pass per iter (~0.03 ms at the shapes here).
            xi = x * (1.0 + 1e-12 * acc).astype(dtype)
            o = jax.lax.dot_general(xi, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=pet)
            return acc + o.astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return acc

    float(run(x, w))
    t0 = time.perf_counter()
    float(run(x, w))
    dt = (time.perf_counter() - t0) / ITERS
    flops = 2 * m * k * n
    print(f"({m:6d},{k:5d})@({k:5d},{n:5d}) {str(dtype.__name__):9s}"
          f" pet={str(pet and pet.__name__):9s} {dt*1e3:8.3f} ms"
          f" {flops/dt/1e12:8.2f} TFLOP/s", flush=True)


if __name__ == "__main__":
    M = 16384
    # calibration: big K — exposes the scan pedestal
    scan_time(M, 2560, 320)
    scan_time(M, 1280, 1280)
    # the suspect and neighbours
    scan_time(M, 320, 320)
    scan_time(M, 320, 320, pet=jnp.float32)
    scan_time(M, 320, 320, dtype=jnp.float32)
    scan_time(M, 384, 384)
    scan_time(M, 256, 256)
    scan_time(M, 512, 512)
    scan_time(M, 640, 640)
    scan_time(M, 320, 640)
    scan_time(M, 640, 320)
    scan_time(M, 128, 128)
    # smaller M at the suspect shape
    scan_time(4096, 320, 320)
    scan_time(65536, 320, 320)
