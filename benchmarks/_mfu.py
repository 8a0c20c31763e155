"""MFU from XLA's own cost analysis of the compiled step (VERDICT r3 #7).

The reference publishes no wall-clock numbers, so the defensible perf
statement for the training steps is model-FLOPs utilisation: XLA-counted
executable FLOPs (the same source tests/test_structure.py:137 cross-checks
the analytic MACs model against) divided by measured step time and the
chip's bf16 peak. Conservative in the usual MFU sense: the count includes
every op XLA keeps (optimizer, losses, gating), not just the matmuls.
"""
from __future__ import annotations

import sys

import jax

# bf16 peak FLOP/s per chip by device_kind prefix. v5e: 197 TFLOP/s
# (v5litepod published spec); v4: 275; v5p: 459; v6e (trillium): 918.
_PEAKS = (
    ("TPU v5 lite", 197e12),
    ("TPU v5e", 197e12),
    ("TPU v4", 275e12),
    ("TPU v5p", 459e12),
    ("TPU v6", 918e12),
)


def device_peak_flops() -> float | None:
    kind = jax.devices()[0].device_kind
    for prefix, peak in _PEAKS:
        if kind.startswith(prefix):
            return peak
    return None


def step_mfu(jitted_step, args, dt_s: float) -> dict:
    """{"flops": executable FLOPs, "tflops_per_s": achieved, "mfu": ratio}.

    `jitted_step` must be the jax.jit-wrapped callable; `.lower()` re-traces
    with the same shapes so the (persistent-cache-warm) compile is cheap and
    nothing executes — safe with donated buffers.
    """
    out = {"flops": None, "tflops_per_s": None, "mfu": None}
    try:
        cost = jitted_step.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        flops = float(cost["flops"])
    except Exception as e:  # axon backends may not expose cost analysis
        print(f"# mfu: cost_analysis unavailable ({e!r})", file=sys.stderr)
        return out
    out["flops"] = flops
    out["tflops_per_s"] = round(flops / dt_s / 1e12, 2)
    peak = device_peak_flops()
    if peak:
        out["mfu"] = round(flops / dt_s / peak, 4)
    return out
