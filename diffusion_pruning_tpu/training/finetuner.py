"""Stage-2 expert fine-tuning + baseline fine-tuners.

Re-implements the reference `FineTuner` (/root/reference/pdm/training/
trainer.py:1405-1851): materialise one codebook expert as a physically
pruned U-Net, fine-tune it on the prompts the router assigns to it, with the
dense SD U-Net as distillation teacher (min-SNR diffusion + output
distillation + block distillation — trainer.py:1683-1765). Also covers the
baseline variants (trainer.py:1854-2030): `no-pruning` (dense student),
`random` (random arch vector), `magnitude` (global magnitude plan), and
`single-arch` (uni-arch expert).

One jitted SPMD step: teacher fwd (stop-grad) + student fwd/bwd, grads
pmean'd over the data mesh, AdamW (unet lr, √global-batch scaled).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.flatten_util  # noqa: F401 (registers jax.flatten_util.ravel_pytree)
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from diffusion_pruning_tpu.losses import diffusion_loss, snr_weights
from diffusion_pruning_tpu.models.text_encoders import CLIPTextEncoder
from diffusion_pruning_tpu.models.unet.unet import GatedUNet
from diffusion_pruning_tpu.models.vae import AutoencoderKL
from diffusion_pruning_tpu.parallel.mesh import DATA_AXIS
from diffusion_pruning_tpu.schedulers import DiffusionSchedule


@dataclasses.dataclass(frozen=True)
class FineTuneConfig:
    snr_gamma: Optional[float] = 5.0
    diffusion_weight: float = 1.0
    distillation_weight: float = 0.2
    block_weight: float = 0.2
    unet_lr: float = 1e-5
    weight_decay: float = 0.0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    lr_warmup_steps: int = 100
    scale_lr: bool = True
    max_grad_norm: Optional[float] = None
    noise_offset: float = 0.0
    input_perturbation: float = 0.0
    # bf16 first moment (optax mu_dtype): frees ~1.7 GB for the SD-2.1 U-Net
    # — with remat this fits the reference per-device batch 128 on one v5e
    adam_mu_bf16: bool = False
    # Use the dense teacher's prediction as the diffusion target instead of
    # the schedule's eps/v target. Same rationale as PrunerConfig.
    # self_distill_target: with frozen RANDOM teacher weights the true eps/v
    # target is unlearnable gradient noise whose weight-1.0 pull overwhelms
    # the 0.2-weighted distillation terms and drags the student AWAY from
    # the teacher (observed: distill loss RISES during synthetic-convergence
    # fine-tuning). Off for real training — reference loss semantics
    # (trainer.py:1683-1765) unchanged.
    self_distill_target: bool = False


@dataclasses.dataclass(frozen=True)
class FineTunerModules:
    student: GatedUNet            # usually plan-carrying (pruned expert)
    teacher: GatedUNet            # dense
    vae: AutoencoderKL
    text_encoder: CLIPTextEncoder
    schedule: DiffusionSchedule


def make_finetune_optimizer(cfg: FineTuneConfig, global_batch: int,
                            elementwise: bool = False):
    """elementwise=True omits the global-norm clip wrapper — required for
    ZeRO-1, where the optimizer sees only a 1/N shard and a shard-local
    "global" norm would be wrong; the step clips the full gradients instead."""
    lr = cfg.unet_lr * (global_batch ** 0.5 if cfg.scale_lr else 1.0)
    sched = optax.join_schedules(
        [optax.linear_schedule(0.0, lr, cfg.lr_warmup_steps),
         optax.constant_schedule(lr)],
        [cfg.lr_warmup_steps])
    tx = optax.adamw(sched, b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps,
                     weight_decay=cfg.weight_decay,
                     mu_dtype=jnp.bfloat16 if cfg.adam_mu_bf16 else None)
    if cfg.max_grad_norm and not elementwise:
        tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), tx)
    return tx


def _losses(mods: FineTunerModules, cfg: FineTuneConfig,
            student_params, frozen, batch, key):
    k_vae, k_noise, k_t, k_off, k_pert = jax.random.split(key, 5)
    sched = mods.schedule
    if "latent_mean" in batch:
        mean = batch["latent_mean"]
        std = jnp.exp(0.5 * batch["latent_logvar"])
        latents = (mean + std * jax.random.normal(k_vae, mean.shape, mean.dtype)
                   ) * mods.vae.cfg.scaling_factor
    else:
        latents = mods.vae.apply({"params": frozen["vae"]}, batch["pixel_values"],
                                 k_vae, method=AutoencoderKL.encode)
    latents = jax.lax.stop_gradient(latents)
    ehs = mods.text_encoder.apply({"params": frozen["text"]}, batch["input_ids"])
    ehs = jax.lax.stop_gradient(ehs)

    b = latents.shape[0]
    noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
    if cfg.noise_offset:
        noise = noise + cfg.noise_offset * jax.random.normal(
            k_off, (b, 1, 1, latents.shape[-1]), latents.dtype)
    timesteps = jax.random.randint(k_t, (b,), 0, sched.num_train_timesteps)
    noise_in = noise
    if cfg.input_perturbation:
        noise_in = noise + cfg.input_perturbation * jax.random.normal(
            k_pert, noise.shape, noise.dtype)
    noisy = sched.add_noise(latents, noise_in, timesteps)

    teacher_pred, teacher_feats = mods.teacher.apply(
        {"params": frozen["teacher"]}, noisy, timesteps, ehs, return_features=True)
    teacher_pred = jax.lax.stop_gradient(teacher_pred)
    teacher_feats = jax.lax.stop_gradient(teacher_feats)

    student_pred, student_feats = mods.student.apply(
        {"params": student_params}, noisy, timesteps, ehs, return_features=True)

    if cfg.self_distill_target:
        target = teacher_pred
    else:
        target = sched.target(latents, noise, timesteps)
    w = snr_weights(sched.alphas_cumprod, timesteps, cfg.snr_gamma, sched.prediction_type)
    d_loss = diffusion_loss(student_pred, target, w)
    distill = jnp.mean((student_pred.astype(jnp.float32)
                        - teacher_pred.astype(jnp.float32)) ** 2)
    block = jnp.mean(jnp.stack([
        jnp.mean((student_feats[k].astype(jnp.float32)
                  - teacher_feats[k].astype(jnp.float32)) ** 2)
        for k in sorted(student_feats)]))
    total = (cfg.diffusion_weight * d_loss
             + cfg.distillation_weight * distill
             + cfg.block_weight * block)
    return total, {"loss": total, "diffusion_loss": d_loss,
                   "distillation_loss": distill, "block_loss": block}


def make_finetune_step(mods: FineTunerModules, cfg: FineTuneConfig,
                       optimizer, mesh: Optional[Mesh] = None,
                       donate: bool = False, zero1: bool = False,
                       accum_steps: int = 1) -> Callable:
    """zero1=True shards the AdamW moments over the data axis (ZeRO-1,
    parallel/zero1.py): pass an ELEMENTWISE optimizer
    (make_finetune_optimizer(..., elementwise=True)) and an opt_state from
    parallel.zero1.init_global_opt_state.

    accum_steps>1 = gradient accumulation (the reference's accelerate
    `gradient_accumulation_steps`, trainer.py:114): the per-device batch is
    split into accum_steps micro-batches scanned inside the one jitted step
    (one optimizer update, averaged grads/metrics). Activation memory scales
    with the micro-batch — the route to the reference's effective batch 128
    on a 16 GB chip."""
    axis_name = DATA_AXIS if mesh is not None else None
    if zero1:
        assert mesh is not None, "ZeRO-1 needs a mesh"
    local_step = make_local_finetune_step(mods, cfg, optimizer, axis_name,
                                          zero1=zero1,
                                          axis_size=mesh.shape[DATA_AXIS] if mesh else 1,
                                          accum_steps=accum_steps)
    donate_kw = {"donate_argnums": (0, 2)} if donate else {}
    if mesh is None:
        return jax.jit(local_step, **donate_kw)
    if zero1:
        from diffusion_pruning_tpu.parallel.zero1 import state_spec
        opt_spec = state_spec(optimizer.init({"flat": jnp.zeros((8,))}))
    else:
        opt_spec = P()
    step = shard_map(local_step, mesh=mesh,
                     in_specs=(P(), P(), opt_spec, P(DATA_AXIS), P()),
                     out_specs=(P(), opt_spec, P()),
                     check_vma=False)
    return jax.jit(step, **donate_kw)


def make_local_finetune_step(mods: FineTunerModules, cfg: FineTuneConfig,
                             optimizer, axis_name: Optional[str],
                             zero1: bool = False, axis_size: int = 1,
                             accum_steps: int = 1) -> Callable:
    """Per-shard step body (pre-shard_map); exposed for the vmap-emulation
    equivalence tests (shard_map ≡ vmap over the data axis)."""

    def local_step(student_params, frozen, opt_state, batch, key):
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))

        if accum_steps > 1:
            micro = {k: v.reshape(accum_steps, v.shape[0] // accum_steps,
                                  *v.shape[1:]) for k, v in batch.items()}
            keys = jax.random.split(key, accum_steps)
            zero_g = jax.tree.map(jnp.zeros_like, student_params)

            def body(acc, xs):
                mb, kk = xs
                (l, m), g = jax.value_and_grad(
                    lambda p: _losses(mods, cfg, p, frozen, mb, kk),
                    has_aux=True)(student_params)
                acc_g, acc_m = acc
                return (jax.tree.map(jnp.add, acc_g, g),
                        jax.tree.map(jnp.add, acc_m, m)), None

            zero_m = {k: jnp.zeros((), jnp.float32)
                      for k in ("loss", "diffusion_loss",
                                "distillation_loss", "block_loss")}
            (grads, metrics), _ = jax.lax.scan(body, (zero_g, zero_m),
                                               (micro, keys))
            grads = jax.tree.map(lambda g: g / accum_steps, grads)
            metrics = jax.tree.map(lambda m: m / accum_steps, metrics)
        else:
            (loss, metrics), grads = jax.value_and_grad(
                lambda p: _losses(mods, cfg, p, frozen, batch, key), has_aux=True
            )(student_params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        gnorm = optax.global_norm(grads)
        good = jnp.isfinite(metrics["loss"]) & jnp.isfinite(gnorm)
        grads = jax.tree.map(lambda g: jnp.where(good, g, jnp.zeros_like(g)), grads)

        if zero1:
            from diffusion_pruning_tpu.parallel.zero1 import gather_shards, local_shard
            if cfg.max_grad_norm:
                # global clip on the FULL tree; the sharded optimizer is
                # elementwise and must not see a shard-local norm
                scale = jnp.minimum(1.0, cfg.max_grad_norm / (gnorm + 1e-12))
                grads = jax.tree.map(lambda g: g * scale, grads)
            p_flat, unravel = jax.flatten_util.ravel_pytree(student_params)
            total = p_flat.shape[0]
            g_shard, _ = local_shard(grads, axis_name, axis_size)
            p_shard, _ = local_shard(student_params, axis_name, axis_size)
            updates, new_opt = optimizer.update({"flat": g_shard}, opt_state,
                                                {"flat": p_shard})
            new_shard = jnp.where(good, p_shard + updates["flat"], p_shard)
            new_opt = jax.tree.map(lambda n, o: jnp.where(good, n, o),
                                   new_opt, opt_state)
            new_params = unravel(gather_shards(new_shard, total, axis_name))
        else:
            updates, new_opt = optimizer.update(grads, opt_state, student_params)
            new_params = optax.apply_updates(student_params, updates)
            new_params = jax.tree.map(lambda n, o: jnp.where(good, n, o),
                                      new_params, student_params)
            new_opt = jax.tree.map(lambda n, o: jnp.where(good, n, o),
                                   new_opt, opt_state)
        return new_params, new_opt, metrics

    return local_step


def make_finetune_step_gspmd(mods: FineTunerModules, cfg: FineTuneConfig,
                             optimizer, mesh: Mesh,
                             donate: bool = False) -> Callable:
    """2-D data×model (dp×tp) fine-tune step via the GSPMD partitioner.

    TPU-first alternative to the shard_map step for 512px+ or tight-HBM
    configs: student/teacher params carry Megatron-style PartitionSpecs
    (parallel/tp.py), the batch is sharded on the data axis, and XLA places
    every collective (grad reductions over dp, activation all_reduces over
    tp) — no hand-written pmean. Semantics are GLOBAL-batch (mathematically
    identical to the single-device step with the same key, which the
    equivalence test exploits). Params/opt-state should be pre-placed with
    parallel.tp.shard_params (the moments inherit the param specs: a free
    ZeRO-ish side effect of TP sharding on the model axis)."""
    from jax.sharding import NamedSharding
    from diffusion_pruning_tpu.parallel.tp import DATA_AXIS as TP_DATA_AXIS

    data = NamedSharding(mesh, P(TP_DATA_AXIS))

    def step(student_params, frozen, opt_state, batch, key):
        batch = {k: jax.lax.with_sharding_constraint(v, data)
                 for k, v in batch.items()}

        (loss, metrics), grads = jax.value_and_grad(
            lambda p: _losses(mods, cfg, p, frozen, batch, key), has_aux=True
        )(student_params)
        gnorm = optax.global_norm(grads)
        good = jnp.isfinite(metrics["loss"]) & jnp.isfinite(gnorm)
        grads = jax.tree.map(lambda g: jnp.where(good, g, jnp.zeros_like(g)), grads)
        updates, new_opt = optimizer.update(grads, opt_state, student_params)
        new_params = optax.apply_updates(student_params, updates)
        new_params = jax.tree.map(lambda n, o: jnp.where(good, n, o),
                                  new_params, student_params)
        new_opt = jax.tree.map(lambda n, o: jnp.where(good, n, o),
                               new_opt, opt_state)
        return new_params, new_opt, metrics

    donate_kw = {"donate_argnums": (0, 2)} if donate else {}
    return jax.jit(step, **donate_kw)


def make_finetune_validation_step(mods: FineTunerModules, cfg: FineTuneConfig,
                                  mesh: Optional[Mesh] = None) -> Callable:
    """Loss-only eval step (reference FineTuner.validate, trainer.py:1767-1818)."""
    axis_name = DATA_AXIS if mesh is not None else None

    def local_val(student_params, frozen, batch, key):
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        _, metrics = _losses(mods, cfg, student_params, frozen, batch, key)
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
        return metrics

    if mesh is None:
        return jax.jit(local_val)
    return jax.jit(shard_map(local_val, mesh=mesh,
                             in_specs=(P(), P(), P(DATA_AXIS), P()),
                             out_specs=P(), check_vma=False))
