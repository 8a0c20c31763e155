"""AOT-persisted serving programs: eliminate serving cold-start.

The persistent XLA compile cache (.jax_cache) removes recompiles across
processes, but a fresh serving process still pays Python trace+lower time
for every (expert, tier) denoise program — K experts × (log2(B)+1) tiers,
seconds each on a slow host, before the first request can be answered.
`jax.export` captures each program's StableHLO once; later processes
deserialize and call it directly, skipping tracing entirely (the XLA
compile of the deserialized module still hits the persistent cache, so a
warm restart compiles nothing either).

Artifacts are keyed by platform + jax version + the program's abstract
call signature, so CPU-mesh tests and TPU serving never collide, and any
mismatch (version bump, shape drift, exotic PJRT plugin without export
support) silently falls back to the traced path — correctness never
depends on an artifact being present or loadable.

Reference counterpart: none — the reference has no online serving runtime
(experts only generate offline, scripts/metrics/generate_fid_images.py);
this extends the beyond-reference serving layer (expert_server.py).
"""
from __future__ import annotations

import hashlib
import os
from typing import Callable, Optional

import jax


def signature(args) -> str:
    """Stable hash of a call's abstract signature (treedef + leaf
    shape/dtype). Static Python leaves hash by repr."""
    leaves, treedef = jax.tree.flatten(args)
    parts = [str(treedef)]
    for x in leaves:
        shape = getattr(x, "shape", None)
        dtype = getattr(x, "dtype", None)
        if shape is None or dtype is None:
            parts.append(repr(x))
        else:
            parts.append(f"{tuple(shape)}:{dtype}")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


def program_path(aot_dir: str, tag: str, args) -> str:
    # device count is part of the key: exported modules pin the lowering's
    # device topology, so an 8-device export must never resolve for a
    # 1-device process (and vice versa)
    plat = jax.default_backend()
    ndev = len(jax.devices())
    return os.path.join(
        aot_dir,
        f"{tag}-{plat}{ndev}-jax{jax.__version__}-{signature(args)}.jaxpgm")


def try_load(path: str) -> Optional[Callable]:
    """Deserialize a persisted program → jitted callable, or None when the
    artifact is absent or incompatible (never raises: the traced path is
    always a correct fallback)."""
    if not os.path.exists(path):
        return None
    try:
        with open(path, "rb") as f:
            exported = jax.export.deserialize(bytearray(f.read()))
        # jit the exported call so the in-process executable is cached
        # across invocations (a bare exported.call re-dispatches each time)
        return jax.jit(exported.call)
    except Exception:
        return None


def export_to(path: str, jit_fn, args) -> bool:
    """Serialize jit_fn's program at args' signature. False (no artifact)
    when the backend can't export — callers keep the traced fn."""
    try:
        blob = jax.export.export(jit_fn)(*args).serialize()
    except Exception:
        return False
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(bytes(blob))
    os.replace(tmp, path)   # atomic: concurrent servers race benignly
    return True


class ShapeDispatch:
    """Dispatch a call to the AOT program persisted for its exact abstract
    signature; fall back to the traced jit for any other shapes. Drop-in
    replacement for a pipeline's cached denoise fn (same positional
    calling convention: (params, *operands)).

    Dispatch keys hash only the OPERANDS (args[1:]): the leading params
    tree is constant for a pipeline, and flattening + hashing the full
    SD-2.1 tree per request is measurable host overhead on a 1-core
    serving host. Artifact paths (program_path) still key the full
    signature, params included."""

    def __init__(self, fallback: Callable):
        self.fallback = fallback
        self._by_sig = {}

    def add(self, args, fn: Callable) -> None:
        self._by_sig[signature(args[1:])] = fn

    def __call__(self, *args):
        fn = self._by_sig.get(signature(args[1:]))
        if fn is not None:
            return fn(*args)
        return self.fallback(*args)
