"""Fast host-side parameter initialisation.

`module.init` traces and XLA-compiles the full forward just to produce
parameters — expensive for benchmark/smoke flows on hosts where compiles are
slow. `random_params_like` materialises a parameter pytree from
`jax.eval_shape` (no compile at all) with fan-in-scaled gaussians — adequate
wherever only shapes/throughput matter (bench.py, dry runs), never used for
real training init.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def shape_tree(init_fn):
    """Shape pytree of `init_fn()` without running it."""
    return jax.eval_shape(init_fn)


def random_params_like(shapes, seed: int = 0):
    """Materialise a parameter pytree ON DEVICE in ONE jitted program: no
    multi-GB host→device transfer and no per-leaf eager dispatch (both
    pathological over remote-device tunnels). Leaves are fan-in-scaled
    gaussians (matrices/kernels), ONES for norm `scale`s, zeros for biases.

    Norm scales must be 1, not 0: a zeroed GroupNorm/LayerNorm scale kills
    every normalised path (the whole U-Net collapses to its skip
    connections and outputs exactly zero — distillation/diffusion losses go
    silently degenerate; caught in the round-3 convergence run)."""
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(shapes)

    def _leaf_name(path):
        last = path[-1]
        return str(getattr(last, "key", getattr(last, "name", last)))

    def build(key):
        out = []
        for i, (path, leaf) in enumerate(leaves_with_path):
            shp, dt = leaf.shape, leaf.dtype
            if _leaf_name(path) == "scale":
                out.append(jnp.ones(shp, dt))
            elif len(shp) <= 1:
                out.append(jnp.zeros(shp, dt))
            else:
                sub = jax.random.fold_in(key, i)
                fan_in = float(np.prod(shp[:-1]))
                out.append((jax.random.normal(sub, shp, jnp.float32)
                            / np.sqrt(max(fan_in, 1.0))).astype(dt))
        return tuple(out)

    out = jax.jit(build)(jax.random.PRNGKey(seed))
    return jax.tree_util.tree_unflatten(treedef, list(out))
