"""Stage-1 train-step tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pruning_tpu.core import build_structure
from diffusion_pruning_tpu.models.hypernet import HyperStructure
from diffusion_pruning_tpu.models.quantizer import StructureQuantizer
from diffusion_pruning_tpu.models.text_encoders import CLIPTextConfig, CLIPTextEncoder
from diffusion_pruning_tpu.models.unet.config import UNetConfig
from diffusion_pruning_tpu.models.unet.unet import GatedUNet
from diffusion_pruning_tpu.models.vae import AutoencoderKL, VAEConfig
from diffusion_pruning_tpu.parallel import data_mesh, shard_batch
from diffusion_pruning_tpu.schedulers import DiffusionSchedule
from diffusion_pruning_tpu.training import PrunerConfig, PrunerModules, make_pruner_step
from diffusion_pruning_tpu.training.pruner import make_optimizer, make_validation_step


@pytest.fixture(scope="module")
def setup():
    rng = jax.random.PRNGKey(0)
    ucfg = UNetConfig.tiny(cross_attention_dim=32)
    tcfg = CLIPTextConfig.tiny()
    vcfg = VAEConfig.tiny()
    spec = build_structure(ucfg)

    mods = PrunerModules(
        unet=GatedUNet(ucfg),
        vae=AutoencoderKL(vcfg),
        text_encoder=CLIPTextEncoder(tcfg),
        hypernet=HyperStructure(spec, input_dim=24),
        quantizer=StructureQuantizer(spec, n_e=4, base=3.0),
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
    return mods, frozen, trainable, spec


def _batch(mods, batch_size, key=0):
    res = mods.unet.cfg.sample_size * 8
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    return {
        "pixel_values": jax.random.normal(ks[0], (batch_size, res, res, 3)) * 0.5,
        "input_ids": jax.random.randint(ks[1], (batch_size, 77), 0, 128),
        "mpnet_embeddings": jax.random.normal(ks[2], (batch_size, 24)),
    }


def test_single_device_step_runs_and_updates(setup):
    mods, frozen, trainable, spec = setup
    cfg = PrunerConfig(lr_warmup_steps=0, scale_lr=False)
    opt = make_optimizer(cfg, global_batch=8)
    step = make_pruner_step(mods, cfg, opt, mesh=None, pretrain=False)
    opt_state = opt.init(trainable)
    batch = _batch(mods, 8)
    new_tr, new_opt, q_state, metrics, aux = step(trainable, frozen, opt_state,
                                                  batch, jax.random.PRNGKey(1))
    for k in ("loss", "diffusion_loss", "distillation_loss", "block_loss",
              "contrastive_loss", "resource_loss", "resource_ratio"):
        assert np.isfinite(float(metrics[k])), k
    # params actually moved
    delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), new_tr, trainable))
    assert delta > 0
    assert q_state["embedding_gs"].shape == (4, spec.vq_dim)
    assert aux["expert_indices"].shape == (8,)
    assert aux["batch_resource_ratios"].shape == (8,)


def test_pretrain_step_uses_hypernet_gates(setup):
    mods, frozen, trainable, spec = setup
    cfg = PrunerConfig(lr_warmup_steps=0, scale_lr=False)
    opt = make_optimizer(cfg, global_batch=4)
    step = make_pruner_step(mods, cfg, opt, mesh=None, pretrain=True)
    opt_state = opt.init(trainable)
    _, _, _, metrics, _ = step(trainable, frozen, opt_state, _batch(mods, 4),
                               jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))


def test_multi_device_step(setup, devices):
    mods, frozen, trainable, spec = setup
    cfg = PrunerConfig(lr_warmup_steps=0, scale_lr=False)
    opt = make_optimizer(cfg, global_batch=16)
    mesh = data_mesh(devices)
    step = make_pruner_step(mods, cfg, opt, mesh=mesh, pretrain=False)
    opt_state = opt.init(trainable)
    batch = shard_batch(mesh, _batch(mods, 16))
    new_tr, new_opt, q_state, metrics, aux = step(trainable, frozen, opt_state,
                                                  batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    assert aux["expert_indices"].shape == (16,)
    # the quantizer snapshot must be replica-consistent (shared gumbel key)
    gs = np.asarray(q_state["embedding_gs"])
    assert np.isfinite(gs).all()


def test_validation_step(setup, devices):
    mods, frozen, trainable, spec = setup
    cfg = PrunerConfig()
    mesh = data_mesh(devices)
    val = make_validation_step(mods, cfg, mesh=mesh)
    batch = shard_batch(mesh, _batch(mods, 8))
    metrics = val(trainable, frozen, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss"]))


def test_step_with_cached_latents(setup):
    """The train step consumes latent-cache batches (no VAE encode)."""
    mods, frozen, trainable, spec = setup
    cfg = PrunerConfig(lr_warmup_steps=0, scale_lr=False)
    opt = make_optimizer(cfg, global_batch=4)
    step = make_pruner_step(mods, cfg, opt, mesh=None, pretrain=False)
    opt_state = opt.init(trainable)
    # latent spatial size must match the U-Net sample_size
    s = mods.unet.cfg.sample_size
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    batch = {
        "latent_mean": jax.random.normal(ks[0], (4, s, s, 4)),
        "latent_logvar": jnp.full((4, s, s, 4), -6.0),
        "input_ids": jax.random.randint(ks[1], (4, 77), 0, 128),
        "mpnet_embeddings": jax.random.normal(ks[2], (4, 24)),
    }
    _, _, _, metrics, _ = step(trainable, frozen, opt_state, batch,
                               jax.random.PRNGKey(5))
    assert np.isfinite(float(metrics["loss"]))


def test_pruner_gradient_accumulation(setup):
    """accum_steps=2 scans two micro-batches: metrics are finite averages,
    aux re-flattens to the full local batch, q_state is the last micro's,
    and the trainables actually move."""
    mods, frozen, trainable, spec = setup
    cfg = PrunerConfig(lr_warmup_steps=0, scale_lr=False)
    opt = make_optimizer(cfg, global_batch=8)
    step = make_pruner_step(mods, cfg, opt, mesh=None, pretrain=False,
                            accum_steps=2)
    opt_state = opt.init(trainable)
    batch = _batch(mods, 8)
    new_tr, new_opt, q_state, metrics, aux = step(trainable, frozen, opt_state,
                                                  batch, jax.random.PRNGKey(7))
    for k in ("loss", "diffusion_loss", "contrastive_loss", "resource_ratio"):
        assert np.isfinite(float(metrics[k])), k
    assert aux["expert_indices"].shape == (8,)
    assert aux["batch_resource_ratios"].shape == (8,)
    assert q_state["embedding_gs"].shape == (4, spec.vq_dim)
    delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), new_tr, trainable))
    assert delta > 0
