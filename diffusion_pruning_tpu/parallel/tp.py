"""Tensor parallelism for the gated U-Net — GSPMD sharding rules.

The reference is data-parallel only (SURVEY §2.4); this module adds a
2-D (data × model) mesh option for serving and training at 512px+, where a
single chip's HBM or latency budget is the limit. TPU-first design: instead
of hand-written collectives, parameters get Megatron-style PartitionSpecs
(attention q/k/v column-split by head, to_out row-split; GEGLU column-split,
ff out row-split; conv1 out-channel-split, conv2 in-channel-split) and XLA's
SPMD partitioner inserts the all_reduces — the scaling-book recipe: pick a
mesh, annotate shardings, let XLA place collectives on ICI.

GroupNorm stays replicated-friendly: norms read full-channel activations,
and XLA re-gathers automatically; the channel splits are chosen on the
matmul-heavy params where TP pays.

Use:
    mesh = dp_tp_mesh(n_data, n_model)
    specs = unet_param_specs(params)
    sharded = shard_params(mesh, params, specs)
    fwd = jax.jit(lambda p, x, t, e: model.apply({"params": p}, x, t, e),
                  in_shardings=(NamedSharding(mesh, s) for param specs, ...))
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def dp_tp_mesh(n_data: int, n_model: int,
               devices: Optional[Sequence] = None) -> Mesh:
    devs = np.asarray(devices if devices is not None else
                      jax.devices()[: n_data * n_model])
    assert devs.size == n_data * n_model, (devs.size, n_data, n_model)
    return Mesh(devs.reshape(n_data, n_model), (DATA_AXIS, MODEL_AXIS))


def _spec_for(path: tuple, leaf) -> P:
    """Megatron-style rule by parameter path. Conservative: anything not
    matched stays replicated (norms, biases, time embedding, proj_in/out)."""
    names = [str(k.key) if hasattr(k, "key") else str(k) for k in path]
    joined = "/".join(names)
    ndim = getattr(leaf, "ndim", 0)

    # attention: column-parallel qkv (output dim = heads·head_dim), row-
    # parallel output projection
    if "to_q" in joined or "to_k" in joined or "to_v" in joined:
        if names[-1] == "kernel" and ndim == 2:
            return P(None, MODEL_AXIS)
    if "to_out_0" in joined and names[-1] == "kernel" and ndim == 2:
        return P(MODEL_AXIS, None)

    # GEGLU ff: column-parallel in, row-parallel out
    if "ff" in names and "proj" in joined and names[-1] == "kernel" and ndim == 2:
        return P(None, MODEL_AXIS)
    if "ff" in names and names[-2:] == ["out", "kernel"] and ndim == 2:
        return P(MODEL_AXIS, None)

    # resnet hidden: conv1/time_emb_proj emit the gated hidden channels
    # (out-channel split), conv2 consumes them (in-channel split). norm2's
    # stats are per-group; XLA gathers as needed.
    if "conv1" in names and names[-1] == "kernel" and ndim == 4:
        return P(None, None, None, MODEL_AXIS)
    if "time_emb_proj" in names and names[-1] == "kernel" and ndim == 2:
        return P(None, MODEL_AXIS)
    if "conv2" in names and names[-1] == "kernel" and ndim == 4:
        return P(None, None, MODEL_AXIS, None)
    return P()


def unet_param_specs(params) -> "jax.tree_util.PyTreeDef":
    """PartitionSpec pytree for a GatedUNet param tree."""
    return jax.tree_util.tree_map_with_path(_spec_for, params)


def shard_params(mesh: Mesh, params, specs=None):
    specs = specs if specs is not None else unet_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def shard_pipeline(pipe, mesh: Mesh):
    """Place a PruningPipeline's params over a data×model mesh for sharded
    serving: the gated U-Net gets the Megatron specs above (TP contractions
    over the model axis); VAE/text/router params replicate (their cost is a
    small fraction of the denoise loop — DP over the data axis is enough);
    batches shard on the data axis inside every jitted stage (the pipeline's
    `mesh` field + `_data_shard`). Returns a NEW pipeline — jit caches are
    intentionally dropped (placements changed, traces must rebuild).

    Beyond-reference capability: the reference serves one GPU per process
    (generate_fid_images.py slices work across processes); this runs ONE
    batch across the whole mesh with XLA-placed ICI collectives — the only
    option when 512px+ activations or K resident experts exceed one chip."""
    import dataclasses
    repl = NamedSharding(mesh, P())

    def put_repl(tree):
        if tree is None:
            return None
        return jax.tree.map(lambda x: jax.device_put(x, repl), tree)

    return dataclasses.replace(
        pipe,
        unet_params=(None if pipe.unet_params is None
                     else shard_params(mesh, pipe.unet_params)),
        vae_params=put_repl(pipe.vae_params),
        text_params=put_repl(pipe.text_params),
        hypernet_params=put_repl(pipe.hypernet_params),
        quantizer_params=put_repl(pipe.quantizer_params),
        quantizer_state=put_repl(pipe.quantizer_state),
        mesh=mesh,
    )


def tp_jit_forward(model, mesh: Mesh, specs=None):
    """Jitted U-Net forward with TP params and data-sharded batch. Returns
    fn(params, sample, t, ehs, arch) — params must be placed by
    shard_params; activations enter sharded on the data axis and XLA
    partitions the contractions over the model axis."""
    data = NamedSharding(mesh, P(DATA_AXIS))

    def fwd(params, sample, t, ehs, arch):
        sample = jax.lax.with_sharding_constraint(sample, data)
        return model.apply({"params": params}, sample, t, ehs, arch=arch)

    return jax.jit(fwd, out_shardings=data)
