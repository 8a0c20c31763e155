"""Device mesh + sharding helpers.

The reference's entire distributed story is DDP over NCCL orchestrated by
accelerate (SURVEY.md §2.4). The TPU-native equivalent: a 1-D `data` mesh,
parameters replicated, batches sharded on the leading axis, gradients
averaged with `lax.pmean` inside the jitted step, Sinkhorn/contrastive
collectives as `lax.psum`/`all_gather` over the same axis name — all riding
ICI. Multi-host extends the same mesh across processes via
`jax.distributed.initialize` (utils/launch.py).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (DATA_AXIS,))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch sharded along the data axis.

    Non-numeric leaves (e.g. the loader's object-dtype `captions` column —
    host-side metadata for logging, never consumed by a jitted step) are
    dropped: they can't live on device, and leaving them in the dict would
    break tracing of steps that take the whole batch pytree.
    """
    sharding = NamedSharding(mesh, P(DATA_AXIS))

    def _place(x):
        dtype = np.asarray(x).dtype if not hasattr(x, "dtype") else x.dtype
        if not (np.issubdtype(dtype, np.number) or dtype == np.bool_):
            return None
        return jax.device_put(x, sharding)

    placed = jax.tree.map(_place, batch)
    if isinstance(placed, dict):
        return {k: v for k, v in placed.items() if v is not None}
    return placed


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
