"""ZeRO-1 optimizer-state sharding (parallel/zero1.py, VERDICT round 1 #5).

The sharded-moment step must produce EXACTLY the same parameters and metrics
as the replicated-state step — ZeRO-1 is a memory layout, not an algorithm
change — while its state arrays live at 1/N per device.
"""
import numpy as np
import jax
import jax.flatten_util  # noqa: F401
import jax.numpy as jnp
import pytest

from diffusion_pruning_tpu.core import build_structure
from diffusion_pruning_tpu.models.text_encoders import CLIPTextConfig, CLIPTextEncoder
from diffusion_pruning_tpu.models.unet.config import UNetConfig
from diffusion_pruning_tpu.models.unet.pruned import make_expert_plan, slice_expert_params
from diffusion_pruning_tpu.models.unet.unet import GatedUNet
from diffusion_pruning_tpu.models.vae import AutoencoderKL, VAEConfig
from diffusion_pruning_tpu.parallel import data_mesh, shard_batch
from diffusion_pruning_tpu.parallel.zero1 import (
    flat_size,
    init_global_opt_state,
    shard_len,
)
from diffusion_pruning_tpu.schedulers import DiffusionSchedule
from diffusion_pruning_tpu.training.finetuner import (
    FineTuneConfig,
    FineTunerModules,
    make_finetune_optimizer,
    make_finetune_step,
)

N_DEV = 4


@pytest.fixture(scope="module")
def setup():
    rng = jax.random.PRNGKey(0)
    ucfg = UNetConfig.tiny(cross_attention_dim=32)
    spec = build_structure(ucfg)
    teacher = GatedUNet(ucfg)
    dense = teacher.init_params(rng, batch=1)
    arch = np.ones(spec.vq_dim)
    plan = make_expert_plan(spec, arch)
    student = GatedUNet(ucfg, plan=plan)
    student_params = jax.tree.map(jnp.asarray, slice_expert_params(dense, plan))
    res = ucfg.sample_size * 8
    vae = AutoencoderKL(VAEConfig.tiny())
    text = CLIPTextEncoder(CLIPTextConfig.tiny())
    frozen = {
        "teacher": dense,
        "vae": vae.init(rng, jnp.zeros((1, res, res, 3)), rng)["params"],
        "text": text.init(rng, jnp.zeros((1, 77), jnp.int32))["params"],
    }
    mods = FineTunerModules(student=student, teacher=teacher, vae=vae,
                            text_encoder=text, schedule=DiffusionSchedule())
    return mods, frozen, student_params, res


def test_zero1_step_matches_replicated(setup, devices):
    mods, frozen, params, res = setup
    cfg = FineTuneConfig(lr_warmup_steps=0, scale_lr=False, unet_lr=1e-3)
    mesh = data_mesh(devices[:N_DEV])
    b = 2 * N_DEV
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    batch = shard_batch(mesh, {
        "pixel_values": jax.random.normal(ks[0], (b, res, res, 3)) * 0.5,
        "input_ids": jax.random.randint(ks[1], (b, 77), 0, 128)})
    key = jax.random.PRNGKey(2)

    plain_opt = make_finetune_optimizer(cfg, global_batch=b)
    plain_step = make_finetune_step(mods, cfg, plain_opt, mesh=mesh)
    p_params, p_opt, p_metrics = plain_step(params, frozen, plain_opt.init(params),
                                            batch, key)

    z_opt = make_finetune_optimizer(cfg, global_batch=b, elementwise=True)
    z_state = init_global_opt_state(z_opt, params, mesh)
    z_step = make_finetune_step(mods, cfg, z_opt, mesh=mesh, zero1=True)
    z_params, z_state_new, z_metrics = z_step(params, frozen, z_state, batch, key)

    for k in p_metrics:
        np.testing.assert_allclose(float(z_metrics[k]), float(p_metrics[k]),
                                    rtol=1e-5, atol=1e-7, err_msg=k)
    flat_p, _ = jax.flatten_util.ravel_pytree(p_params)
    flat_z, _ = jax.flatten_util.ravel_pytree(z_params)
    np.testing.assert_allclose(np.asarray(flat_z), np.asarray(flat_p),
                               rtol=1e-5, atol=1e-7)

    # state really is 1/N per device: array leaves are (N·shard,) split over
    # the mesh, i.e. the same total as the replicated moments but not ×N
    shard = shard_len(params, N_DEV)
    arr_leaves = [l for l in jax.tree.leaves(z_state_new) if l.ndim >= 1]
    assert all(l.shape[0] == N_DEV * shard for l in arr_leaves)
    for l in arr_leaves:
        db = l.sharding.device_set
        assert len(db) == N_DEV
        # each device holds exactly one shard row
        assert l.addressable_shards[0].data.shape[0] == shard


def test_zero1_second_step_consistency(setup, devices):
    """Two consecutive ZeRO-1 steps track the replicated trajectory (the
    moments actually accumulate correctly across steps)."""
    mods, frozen, params, res = setup
    cfg = FineTuneConfig(lr_warmup_steps=0, scale_lr=False, unet_lr=1e-3)
    mesh = data_mesh(devices[:N_DEV])
    b = 2 * N_DEV

    def batch_for(i):
        ks = jax.random.split(jax.random.PRNGKey(10 + i), 2)
        return shard_batch(mesh, {
            "pixel_values": jax.random.normal(ks[0], (b, res, res, 3)) * 0.5,
            "input_ids": jax.random.randint(ks[1], (b, 77), 0, 128)})

    plain_opt = make_finetune_optimizer(cfg, global_batch=b)
    plain_step = make_finetune_step(mods, cfg, plain_opt, mesh=mesh)
    z_opt = make_finetune_optimizer(cfg, global_batch=b, elementwise=True)
    z_step = make_finetune_step(mods, cfg, z_opt, mesh=mesh, zero1=True)

    pp, po = params, plain_opt.init(params)
    zp, zo = params, init_global_opt_state(z_opt, params, mesh)
    for i in range(2):
        key = jax.random.PRNGKey(20 + i)
        pp, po, _ = plain_step(pp, frozen, po, batch_for(i), key)
        zp, zo, _ = z_step(zp, frozen, zo, batch_for(i), key)
    fp, _ = jax.flatten_util.ravel_pytree(pp)
    fz, _ = jax.flatten_util.ravel_pytree(zp)
    np.testing.assert_allclose(np.asarray(fz), np.asarray(fp), rtol=1e-5, atol=1e-7)
