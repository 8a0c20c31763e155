"""Shared build code for the multi-process pruner-step smoke.

Imported both by tests/test_multihost_launch.py (in-process baseline) and by
the spawned worker processes — identical PRNG keys on every side guarantee
identical models/batches, so the 2-process run can be compared numerically
against the single-process 8-device run (the reference's multi-node DDP
deployment shape, cluster_scripts/slurm/pruning/sd2-1_coco.slurm:55-75).
"""
import numpy as np
import jax
import jax.numpy as jnp


def build_tiny_pruner():
    from diffusion_pruning_tpu.core import build_structure
    from diffusion_pruning_tpu.models.hypernet import HyperStructure
    from diffusion_pruning_tpu.models.quantizer import StructureQuantizer
    from diffusion_pruning_tpu.models.text_encoders import CLIPTextConfig, CLIPTextEncoder
    from diffusion_pruning_tpu.models.unet.config import UNetConfig
    from diffusion_pruning_tpu.models.unet.unet import GatedUNet
    from diffusion_pruning_tpu.models.vae import AutoencoderKL, VAEConfig
    from diffusion_pruning_tpu.schedulers import DiffusionSchedule
    from diffusion_pruning_tpu.training import PrunerConfig, PrunerModules
    from diffusion_pruning_tpu.training.pruner import make_optimizer

    rng = jax.random.PRNGKey(0)
    ucfg = UNetConfig.tiny(cross_attention_dim=32)
    tcfg = CLIPTextConfig.tiny()
    vcfg = VAEConfig.tiny()
    mods = PrunerModules(
        unet=GatedUNet(ucfg),
        vae=AutoencoderKL(vcfg),
        text_encoder=CLIPTextEncoder(tcfg),
        hypernet=HyperStructure(build_structure(ucfg), input_dim=24),
        quantizer=StructureQuantizer(build_structure(ucfg), n_e=4, base=3.0),
        schedule=DiffusionSchedule(),
    )
    res = ucfg.sample_size * 8
    frozen = {
        "unet": mods.unet.init_params(rng, batch=1),
        "vae": mods.vae.init(rng, jnp.zeros((1, res, res, 3)), rng)["params"],
        "text": mods.text_encoder.init(rng, jnp.zeros((1, 77), jnp.int32))["params"],
    }
    trainable = {
        "hypernet": mods.hypernet.init(rng, jnp.zeros((1, 24)))["params"],
        "quantizer": mods.quantizer.init_params(rng),
    }
    cfg = PrunerConfig(lr_warmup_steps=0, scale_lr=False)
    opt = make_optimizer(cfg, global_batch=8)
    return mods, cfg, opt, frozen, trainable, tcfg, res


def global_batch_arrays(res, vocab, b=8):
    """Deterministic global batch as host numpy (identical on every process)."""
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    return {
        "pixel_values": np.asarray(jax.random.normal(ks[0], (b, res, res, 3))) * 0.5,
        "input_ids": np.asarray(jax.random.randint(ks[1], (b, 77), 0, vocab)),
        "mpnet_embeddings": np.asarray(jax.random.normal(ks[2], (b, 24))),
    }


def build_tiny_finetuner():
    """Tiny stage-2 setup: one materialised expert (pretrained slices of a
    dense tiny U-Net) + the dense teacher, deterministic on every process."""
    from diffusion_pruning_tpu.core import build_structure
    from diffusion_pruning_tpu.models.text_encoders import CLIPTextConfig, CLIPTextEncoder
    from diffusion_pruning_tpu.models.unet.config import UNetConfig
    from diffusion_pruning_tpu.models.unet.pruned import (make_expert_plan,
                                                          slice_expert_params)
    from diffusion_pruning_tpu.models.unet.unet import GatedUNet
    from diffusion_pruning_tpu.models.vae import AutoencoderKL, VAEConfig
    from diffusion_pruning_tpu.schedulers import DiffusionSchedule
    from diffusion_pruning_tpu.training.finetuner import (
        FineTuneConfig, FineTunerModules, make_finetune_optimizer)

    rng = jax.random.PRNGKey(0)
    ucfg = UNetConfig.tiny(cross_attention_dim=32)
    tcfg = CLIPTextConfig.tiny()
    spec = build_structure(ucfg)
    teacher = GatedUNet(ucfg)
    dense = teacher.init_params(rng, batch=1)
    code = (jax.random.uniform(jax.random.PRNGKey(7), (spec.vq_dim,)) < 0.6
            ).astype(jnp.float32).at[spec.num_width:].set(1.0)
    plan = make_expert_plan(spec, np.asarray(code))
    student = GatedUNet(ucfg, plan=plan)
    sparams = slice_expert_params(dense, plan)
    vcfg = VAEConfig.tiny()
    mods = FineTunerModules(
        student=student, teacher=teacher, vae=AutoencoderKL(vcfg),
        text_encoder=CLIPTextEncoder(tcfg), schedule=DiffusionSchedule())
    res = ucfg.sample_size * 8
    frozen = {
        "teacher": dense,
        "vae": mods.vae.init(rng, jnp.zeros((1, res, res, 3)), rng)["params"],
        "text": mods.text_encoder.init(rng, jnp.zeros((1, 77), jnp.int32))["params"],
    }
    cfg = FineTuneConfig(lr_warmup_steps=0, scale_lr=False)
    opt = make_finetune_optimizer(cfg, global_batch=8)
    return mods, cfg, opt, frozen, sparams, tcfg, res


def run_one_finetune_step(mesh, place_batch, zero1=False):
    """Build the tiny stage-2 setup, run ONE finetune step over `mesh`,
    return metrics + updated-student fingerprint. zero1=True runs the
    sharded-moment step (optimizer state physically split over the mesh —
    across PROCESSES in the 2-process smoke)."""
    from diffusion_pruning_tpu.training.finetuner import (
        make_finetune_optimizer, make_finetune_step)

    mods, cfg, opt, frozen, sparams, tcfg, res = build_tiny_finetuner()
    if zero1:
        from diffusion_pruning_tpu.parallel.zero1 import init_global_opt_state
        opt = make_finetune_optimizer(cfg, global_batch=8, elementwise=True)
        step = make_finetune_step(mods, cfg, opt, mesh=mesh, zero1=True)
        opt_state = init_global_opt_state(opt, sparams, mesh)
    else:
        step = make_finetune_step(mods, cfg, opt, mesh=mesh)
        opt_state = opt.init(sparams)
    arrs = global_batch_arrays(res, tcfg.vocab_size)
    batch = {k: place_batch(v) for k, v in arrs.items()
             if k in ("pixel_values", "input_ids")}
    new_p, _, metrics = step(sparams, frozen, opt_state, batch,
                             jax.random.PRNGKey(2))
    out = {k: float(v) for k, v in metrics.items()}
    flat = jnp.concatenate([jnp.ravel(l).astype(jnp.float32)
                            for l in jax.tree.leaves(new_p)])
    out["student_l2"] = float(jnp.linalg.norm(flat))
    return out


def run_one_finetune_step_gspmd(mesh2d, place_batch):
    """ONE dp×tp GSPMD finetune step over a 2-D mesh (may span processes).

    Params get the Megatron specs (parallel/tp.py) — over a 2-process mesh
    the dp axis crosses the process boundary and tp stays process-local;
    everything else is placed replicated (device_put to a global sharding)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from diffusion_pruning_tpu.parallel.tp import shard_params as tp_shard
    from diffusion_pruning_tpu.training.finetuner import make_finetune_step_gspmd

    mods, cfg, opt, frozen, sparams, tcfg, res = build_tiny_finetuner()
    rep = NamedSharding(mesh2d, P())

    def put(tree):
        return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), rep), tree)

    sparams = tp_shard(mesh2d, sparams)
    frozen = {"teacher": tp_shard(mesh2d, frozen["teacher"]),
              "vae": put(frozen["vae"]), "text": put(frozen["text"])}
    opt_state = opt.init(sparams)
    step = make_finetune_step_gspmd(mods, cfg, opt, mesh2d)
    arrs = global_batch_arrays(res, tcfg.vocab_size)
    batch = {k: place_batch(v) for k, v in arrs.items()
             if k in ("pixel_values", "input_ids")}
    key = jax.device_put(jax.random.PRNGKey(2), rep)
    new_p, _, metrics = step(sparams, frozen, opt_state, batch, key)
    out = {k: float(v) for k, v in metrics.items()}
    out["student_l2"] = float(jax.jit(
        lambda t: jnp.linalg.norm(jnp.concatenate(
            [jnp.ravel(l).astype(jnp.float32) for l in jax.tree.leaves(t)]))
    )(new_p))
    return out


def run_one_step(mesh, place_batch):
    """Build models, run ONE full pruner step over `mesh`, return metrics."""
    from diffusion_pruning_tpu.training import make_pruner_step

    mods, cfg, opt, frozen, trainable, tcfg, res = build_tiny_pruner()
    step = make_pruner_step(mods, cfg, opt, mesh=mesh, pretrain=False)
    opt_state = opt.init(trainable)
    batch = {k: place_batch(v) for k, v in
             global_batch_arrays(res, tcfg.vocab_size).items()}
    new_tr, _, _, metrics, _ = step(trainable, frozen, opt_state, batch,
                                    jax.random.PRNGKey(2))
    out = {k: float(v) for k, v in metrics.items()}
    # parameter-update fingerprint: the l2 norm of the updated trainables
    # (replicated output — identical across processes if the step is right)
    flat = jnp.concatenate([jnp.ravel(l).astype(jnp.float32)
                            for l in jax.tree.leaves(new_tr)])
    out["trainable_l2"] = float(jnp.linalg.norm(flat))
    return out
