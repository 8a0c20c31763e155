"""Stage-1 (APTP pruning) train step — one jitted SPMD program.

Re-implements the reference `Pruner.step` (/root/reference/pdm/training/
trainer.py:1092-1254) as a single pure function shard_mapped over a 1-D
`data` mesh:

  VAE encode (frozen) → noise/timestep sampling → CLIP text encode (frozen)
  → hypernet → quantizer (Sinkhorn OT balancing via `lax.psum`)
  → contrastive loss over the GLOBAL batch (`lax.all_gather`)
  → teacher U-Net pass (dense gates — same weights, no second model in HBM)
  → student U-Net pass (per-prompt gates)
  → min-SNR diffusion + distillation + block-distillation
    + analytic resource + std/max losses
  → grads for hypernet+quantizer only (the U-Net is frozen in stage 1, as in
    the reference — unet_2d_conditional.py:2118-2122 freezes everything and
    the third optimizer group is empty, trainer.py:827-829)
  → `lax.pmean` grad sync → AdamW (per-group LRs, √global-batch scaled).

The NaN-batch skip (trainer.py:921-929) is a `jnp.where` gate on the update.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from diffusion_pruning_tpu.core.resource import ResourceModel
from diffusion_pruning_tpu.losses import contrastive_loss, diffusion_loss, resource_loss, snr_weights
from diffusion_pruning_tpu.models.hypernet import HyperStructure
from diffusion_pruning_tpu.models.quantizer import StructureQuantizer
from diffusion_pruning_tpu.models.text_encoders import CLIPTextEncoder
from diffusion_pruning_tpu.models.unet.unet import GatedUNet
from diffusion_pruning_tpu.models.vae import AutoencoderKL
from diffusion_pruning_tpu.parallel.mesh import DATA_AXIS
from diffusion_pruning_tpu.schedulers import DiffusionSchedule


@dataclasses.dataclass(frozen=True)
class PrunerConfig:
    # loss weights (configs/pruning/sd-2-1_coco2014.yaml:82-107)
    diffusion_weight: float = 1.0
    snr_gamma: Optional[float] = 5.0
    resource_weight: float = 2.0
    resource_type: str = "log"
    pruning_target: float = 0.6        # in total-MACs space; rescaled below
    contrastive_weight: float = 100.0
    arch_temperature: float = 0.03
    prompt_temperature: float = 0.03
    distillation_weight: float = 0.2
    block_weight: float = 0.2
    std_weight: float = 0.1
    max_weight: float = 0.1
    # optim (yaml:110-126)
    hypernet_lr: float = 2e-4
    quantizer_lr: float = 2e-4
    weight_decay: float = 0.0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    lr_warmup_steps: int = 100
    scale_lr: bool = True
    max_grad_norm: Optional[float] = None
    # schedule options
    noise_offset: float = 0.0
    input_perturbation: float = 0.0
    max_scheduler_steps: Optional[int] = None
    # Synthetic-validation objective: use the DENSE teacher's prediction as
    # the diffusion target instead of ε/v. With real SD weights the data is
    # (approximately) realisable by the dense model — small residuals, so
    # the resource signal is visible through Adam's noise floor. A frozen
    # RANDOM U-Net can't denoise anything (stage 1 trains only the router),
    # making the ε/v target pure gradient noise that drowns the resource
    # loss; this flag restores the realisability property for synthetic
    # convergence runs (scripts/other/convergence_run.py). Off for real
    # training — reference semantics unchanged.
    self_distill_target: bool = False


@dataclasses.dataclass(frozen=True)
class PrunerModules:
    unet: GatedUNet
    vae: AutoencoderKL
    text_encoder: CLIPTextEncoder
    hypernet: HyperStructure
    quantizer: StructureQuantizer
    schedule: DiffusionSchedule

    @property
    def resource_model(self) -> ResourceModel:
        return ResourceModel(self.unet.spec)


def make_optimizer(cfg: PrunerConfig, global_batch: int) -> optax.GradientTransformation:
    scale = (global_batch ** 0.5) if cfg.scale_lr else 1.0

    def sched(lr):
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr * scale, cfg.lr_warmup_steps),
             optax.constant_schedule(lr * scale)],
            [cfg.lr_warmup_steps],
        )

    def adamw(lr):
        tx = optax.adamw(sched(lr), b1=cfg.adam_b1, b2=cfg.adam_b2,
                         eps=cfg.adam_eps, weight_decay=cfg.weight_decay)
        if cfg.max_grad_norm:
            tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), tx)
        return tx

    return optax.multi_transform(
        {"hypernet": adamw(cfg.hypernet_lr), "quantizer": adamw(cfg.quantizer_lr)},
        param_labels={"hypernet": "hypernet", "quantizer": "quantizer"},
    )


def _compute_losses(
    mods: PrunerModules,
    cfg: PrunerConfig,
    trainable: Dict[str, Any],
    frozen: Dict[str, Any],
    batch: Dict[str, jax.Array],
    key: jax.Array,
    shared_key: jax.Array,
    pretrain: bool,
    axis_name: Optional[str],
    axis_size: int,
    p_actual: float,
):
    """Loss + aux for one local shard. Pure; differentiable in `trainable`.

    `key` is per-device (folded with the axis index); `shared_key` is
    identical on every device — the quantizer's codebook gumbel noise must be
    replicated so the embedding_gs snapshot and Sinkhorn scores agree across
    the mesh (the reference lets DDP ranks drift here; SPMD requires
    consistency and it is strictly more correct)."""
    k_vae, k_noise, k_t, k_g, k_off, k_pert = jax.random.split(key, 6)
    k_q = shared_key
    sched = mods.schedule

    # frozen encoders; with a latent cache (data/latent_cache.py) the VAE
    # encode drops out of the step entirely
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
    max_t = cfg.max_scheduler_steps or sched.num_train_timesteps
    timesteps = jax.random.randint(k_t, (b,), 0, max_t)
    noise_for_q = noise
    if cfg.input_perturbation:
        noise_for_q = noise + cfg.input_perturbation * jax.random.normal(
            k_pert, noise.shape, noise.dtype)
    noisy = sched.add_noise(latents, noise_for_q, timesteps)

    # router
    text_emb = batch["mpnet_embeddings"]
    logits = mods.hypernet.apply({"params": trainable["hypernet"]}, text_emb)
    z_q, indices, q_state = mods.quantizer.forward_train(
        trainable["quantizer"], logits, k_q, axis_name=axis_name, axis_size=axis_size)
    gates = mods.quantizer.gumbel_sigmoid_trick(logits, k_g)
    if mods.hypernet.single_arch_param:
        gates = jnp.tile(gates, (text_emb.shape[0], 1))
    gates_norm = mods.quantizer.width_depth_normalize(gates)

    # Global-batch contrastive (trainer.py:1147-1170) with DDP gradient
    # semantics: torch's all_gather detaches non-local entries, so each rank
    # differentiates the global similarity matrix only through its OWN shard
    # and DDP's grad average yields full_grad / world_size. A naively
    # differentiable lax.all_gather would give every device the FULL matrix
    # gradient (its transpose sums the other devices' cotangents back), and
    # pmean would keep it full — an axis_size× overweighted contrastive term.
    # Reproduce torch exactly: gather stop-gradient shards, splice the live
    # local shard back in at this device's slot.
    if axis_name is not None:
        text_all = jax.lax.all_gather(text_emb, axis_name).reshape(-1, text_emb.shape[-1])
        arch_gath = jax.lax.all_gather(jax.lax.stop_gradient(gates_norm), axis_name)
        arch_gath = jax.lax.dynamic_update_index_in_dim(
            arch_gath, gates_norm, jax.lax.axis_index(axis_name), 0)
        arch_all = arch_gath.reshape(-1, gates_norm.shape[-1])
    else:
        text_all, arch_all = text_emb, gates_norm
    c_loss, arch_sim = contrastive_loss(text_all, arch_all,
                                        cfg.prompt_temperature, cfg.arch_temperature)

    arch_used = gates if pretrain else z_q

    # teacher (dense) + student passes — same weights resident once in HBM
    teacher_pred, teacher_feats = mods.unet.apply(
        {"params": frozen["unet"]}, noisy, timesteps, ehs, arch=None, return_features=True)
    teacher_pred = jax.lax.stop_gradient(teacher_pred)
    teacher_feats = jax.lax.stop_gradient(teacher_feats)
    student_pred, student_feats = mods.unet.apply(
        {"params": frozen["unet"]}, noisy, timesteps, ehs, arch=arch_used,
        return_features=True)

    if cfg.self_distill_target:
        target = teacher_pred
    else:
        target = sched.target(latents, noise, timesteps)
    w = snr_weights(sched.alphas_cumprod, timesteps, cfg.snr_gamma, sched.prediction_type)
    d_loss = diffusion_loss(student_pred, target, w)
    distill = jnp.mean((student_pred.astype(jnp.float32) - teacher_pred.astype(jnp.float32)) ** 2)
    block = jnp.mean(jnp.stack([
        jnp.mean((student_feats[k].astype(jnp.float32)
                  - teacher_feats[k].astype(jnp.float32)) ** 2)
        for k in sorted(student_feats)]))

    # local-batch resource statistics (per-rank in the reference too —
    # trainer.py:1232-1248 — DDP then averages the gradients, which pmean
    # reproduces exactly)
    rm = mods.resource_model
    ratios = rm.resource_ratio(arch_used)
    mean_ratio = ratios.mean()
    r_loss = resource_loss(mean_ratio, p_actual, cfg.resource_type)
    max_loss = 1.0 - jnp.max(ratios)
    # eps-guarded std: torch.std/jnp.std have a NaN gradient at exactly-zero
    # variance, which REALLY occurs whenever every sample in a local batch
    # routes to the same expert (identical arch rows → identical ratios).
    # The reference's loss-only NaN check (trainer.py:921-929) would let that
    # poison params via DDP; our grad-norm skip caught it but silently
    # dropped the update. sqrt(var + 1e-12) keeps the value within 1e-6 and
    # the gradient finite (→ 0 at the degenerate point).
    std_loss = -jnp.sqrt(ratios.var() + 1e-12)

    total = (cfg.diffusion_weight * d_loss
             + cfg.resource_weight * r_loss
             + cfg.contrastive_weight * c_loss
             + cfg.distillation_weight * distill
             + cfg.block_weight * block
             + cfg.std_weight * std_loss
             + cfg.max_weight * max_loss)

    aux = {
        "loss": total,
        "diffusion_loss": d_loss,
        "distillation_loss": distill,
        "block_loss": block,
        "contrastive_loss": c_loss,
        "resource_loss": r_loss,
        "resource_ratio": mean_ratio,
        "batch_resource_ratios": ratios,
        "expert_indices": indices,
        "q_state": q_state,
        "arch_similarity": arch_sim,
    }
    return total, aux


def make_pruner_step(
    mods: PrunerModules,
    cfg: PrunerConfig,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    pretrain: bool = False,
    donate: bool = False,
    accum_steps: int = 1,
) -> Callable:
    """Build the jitted train step.

    step(trainable, frozen, opt_state, batch, key)
      -> (trainable, opt_state, q_state, metrics)

    With a mesh, the batch is consumed sharded on the data axis and all
    collectives (Sinkhorn psum, contrastive all_gather, grad pmean) run over
    ICI inside the one compiled program. accum_steps>1 scans micro-batches
    inside the step (the reference's accelerate gradient_accumulation_steps;
    Sinkhorn/contrastive span one micro-batch×mesh like the reference's
    per-micro-batch step calls).
    """
    p_actual = mods.resource_model.actual_pruning_target(cfg.pruning_target)
    axis_name = DATA_AXIS if mesh is not None else None
    axis_size = mesh.shape[DATA_AXIS] if mesh is not None else 1
    return _wrap_step(make_local_pruner_step(
        mods, cfg, optimizer, axis_name, axis_size, pretrain, p_actual,
        accum_steps=accum_steps), mesh, donate)


def make_local_pruner_step(mods, cfg, optimizer, axis_name, axis_size,
                           pretrain, p_actual, accum_steps: int = 1):
    """Per-shard step body (pre-shard_map). Exposed so tests can run it under
    `jax.vmap(..., axis_name=DATA_AXIS)` — the single-device emulation of the
    mesh collectives — and assert shard_map ≡ vmap semantics."""

    def local_step(trainable, frozen, opt_state, batch, key):
        # shared vs per-device keys from disjoint derivation domains:
        # fold_in(key, CONST) would collide with fold_in(key, axis_index)
        # whenever CONST < axis_size, correlating the replicated codebook
        # gumbel noise with one device's data noise.
        shared_key, key = jax.random.split(key)
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))

        def loss_fn(tr, mb, k, sk):
            return _compute_losses(mods, cfg, tr, frozen, mb, k, sk,
                                   pretrain, axis_name, axis_size, p_actual)

        if accum_steps > 1:
            micro = {k2: v.reshape(accum_steps, v.shape[0] // accum_steps,
                                   *v.shape[1:]) for k2, v in batch.items()}
            keys = jax.random.split(key, accum_steps)
            shared_keys = jax.random.split(shared_key, accum_steps)

            def body(acc, xs):
                mb, kk, sk = xs
                (l, a), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    trainable, mb, kk, sk)
                acc_l, acc_g, acc_m = acc
                m = {k3: v for k3, v in a.items()
                     if k3 not in ("q_state", "batch_resource_ratios",
                                   "expert_indices", "arch_similarity")}
                return ((acc_l + l, jax.tree.map(jnp.add, acc_g, g),
                         jax.tree.map(jnp.add, acc_m, m)),
                        {"q_state": a["q_state"],
                         "batch_resource_ratios": a["batch_resource_ratios"],
                         "expert_indices": a["expert_indices"]})

            zero_m = {k3: jnp.zeros(()) for k3 in
                      ("loss", "diffusion_loss", "distillation_loss",
                       "block_loss", "contrastive_loss", "resource_loss",
                       "resource_ratio")}
            (loss, grads, msum), stacked = jax.lax.scan(
                body, (jnp.zeros(()), jax.tree.map(jnp.zeros_like, trainable),
                       zero_m), (micro, keys, shared_keys))
            loss = loss / accum_steps
            grads = jax.tree.map(lambda g: g / accum_steps, grads)
            aux = {k3: v / accum_steps for k3, v in msum.items()}
            # per-sample aux re-flattened to the full local batch; the
            # quantizer snapshot is the LAST micro-batch's (the reference's
            # embedding_gs buffer likewise holds the last step's realisation)
            aux["q_state"] = jax.tree.map(lambda x: x[-1], stacked["q_state"])
            aux["batch_resource_ratios"] = stacked["batch_resource_ratios"].reshape(-1)
            aux["expert_indices"] = stacked["expert_indices"].reshape(-1)
        else:
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(trainable, batch, key, shared_key)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)

        # NaN/Inf-batch skip, hardened beyond the reference (trainer.py:921-929):
        # a finite loss can still carry inf/NaN grads (e.g. contrastive at
        # tiny batches), which would poison params for the rest of the run —
        # gate the update on the global grad norm too.
        gnorm = optax.global_norm(grads)
        good = jnp.isfinite(loss) & jnp.isfinite(gnorm)
        grads = jax.tree.map(lambda g: jnp.where(good, g, jnp.zeros_like(g)), grads)
        updates, new_opt_state = optimizer.update(grads, opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        new_trainable = jax.tree.map(
            lambda new, old: jnp.where(good, new, old), new_trainable, trainable)
        new_opt_state = jax.tree.map(
            lambda new, old: jnp.where(good, new, old), new_opt_state, opt_state)

        metrics = {k: v for k, v in aux.items()
                   if k not in ("q_state", "batch_resource_ratios",
                                "expert_indices", "arch_similarity")}
        metrics["grad_norm"] = gnorm
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
        out_aux = {
            "batch_resource_ratios": aux["batch_resource_ratios"],
            "expert_indices": aux["expert_indices"],
        }
        return new_trainable, new_opt_state, aux["q_state"], metrics, out_aux

    return local_step


def _wrap_step(local_step, mesh, donate):
    donate_kw = {"donate_argnums": (0, 2)} if donate else {}
    if mesh is None:
        return jax.jit(local_step, **donate_kw)
    rep = P()
    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(rep, rep, rep, P(DATA_AXIS), rep),
        out_specs=(rep, rep, rep, rep, P(DATA_AXIS)),
        check_vma=False,
    )
    return jax.jit(step, **donate_kw)


def make_validation_step(mods: PrunerModules, cfg: PrunerConfig,
                         mesh: Optional[Mesh] = None, pretrain: bool = False) -> Callable:
    """Loss-only step for the held-out split, metrics pmean'd across the mesh
    (trainer.py:1026-1090)."""
    p_actual = mods.resource_model.actual_pruning_target(cfg.pruning_target)
    axis_name = DATA_AXIS if mesh is not None else None
    axis_size = mesh.shape[DATA_AXIS] if mesh is not None else 1

    def local_val(trainable, frozen, batch, key):
        shared_key, key = jax.random.split(key)
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        _, aux = _compute_losses(mods, cfg, trainable, frozen, batch, key, shared_key,
                                 pretrain, axis_name, axis_size, p_actual)
        metrics = {k: v for k, v in aux.items()
                   if k not in ("q_state", "batch_resource_ratios",
                                "expert_indices", "arch_similarity")}
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
        return metrics

    if mesh is None:
        return jax.jit(local_val)
    return jax.jit(shard_map(
        local_val, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P()),
        out_specs=P(),
        check_vma=False,
    ))
