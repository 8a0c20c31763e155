"""Multi-host initialisation.

The reference's cluster layer is SLURM/PBS scripts wrapping
`accelerate launch` / `torchrun` with c10d NCCL rendezvous
(cluster_scripts/slurm/pruning/sd2-1_coco.slurm:55-75,
cluster_scripts/pbs/pruning/helper.sh:14-28). On TPU pods none of that
plumbing exists: every host runs the same program and
`jax.distributed.initialize()` discovers the pod topology from the TPU
metadata (or from explicit coordinator args on CPU/GPU clusters). The data
mesh in parallel/mesh.py then spans all hosts' devices automatically.
"""
from __future__ import annotations

import logging
import os
from typing import Optional

import jax

logger = logging.getLogger("diffusion_pruning_tpu")


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialise multi-host JAX. On TPU pods all arguments are discovered
    automatically; on other platforms pass coordinator='host:port' etc., or
    set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.

    MUST run before any backend touch: even `jax.process_count()` initialises
    the single-process backend and makes `jax.distributed.initialize` fail —
    a failure the old single-host fallback silently swallowed (caught by
    tests/test_multihost_launch.py)."""
    if jax.distributed.is_initialized():
        return
    kwargs = {}
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator:
        kwargs = dict(
            coordinator_address=coordinator,
            num_processes=num_processes or int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=process_id or int(os.environ["JAX_PROCESS_ID"]),
        )
        jax.distributed.initialize(**kwargs)  # explicit config: never swallow
        logger.info("distributed: process %d/%d, %d local / %d global devices",
                    jax.process_index(), jax.process_count(),
                    jax.local_device_count(), jax.device_count())
        return
    try:
        jax.distributed.initialize()   # TPU-pod auto-discovery
        logger.info("distributed: process %d/%d, %d local / %d global devices",
                    jax.process_index(), jax.process_count(),
                    jax.local_device_count(), jax.device_count())
    except Exception as e:  # genuine single-host run
        logger.info("single-host run (%s)", e)


def process_slice(n: int) -> slice:
    """This host's shard of n items (the reference's
    `accelerator.split_between_processes`, trainer.py:650)."""
    per = (n + jax.process_count() - 1) // jax.process_count()
    lo = jax.process_index() * per
    return slice(lo, min(lo + per, n))
