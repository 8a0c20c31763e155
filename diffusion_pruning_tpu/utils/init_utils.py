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
    gaussians (matrices/kernels) or zeros (biases/norm params)."""
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    def build(key):
        out = []
        for i, leaf in enumerate(leaves):
            shp, dt = leaf.shape, leaf.dtype
            if len(shp) <= 1:
                out.append(jnp.zeros(shp, dt))
            else:
                sub = jax.random.fold_in(key, i)
                fan_in = float(np.prod(shp[:-1]))
                out.append((jax.random.normal(sub, shp, jnp.float32)
                            / np.sqrt(max(fan_in, 1.0))).astype(dt))
        return tuple(out)

    out = jax.jit(build)(jax.random.PRNGKey(seed))
    return jax.tree_util.tree_unflatten(treedef, list(out))
