"""Stage-2 fine-tuning step + loop resume tests."""
import numpy as np
import optax
import jax
import jax.numpy as jnp
import pytest

from diffusion_pruning_tpu.core import build_structure
from diffusion_pruning_tpu.models.text_encoders import CLIPTextConfig, CLIPTextEncoder
from diffusion_pruning_tpu.models.unet.config import UNetConfig
from diffusion_pruning_tpu.models.unet.pruned import make_expert_plan, slice_expert_params
from diffusion_pruning_tpu.models.unet.unet import GatedUNet
from diffusion_pruning_tpu.models.vae import AutoencoderKL, VAEConfig
from diffusion_pruning_tpu.schedulers import DiffusionSchedule
from diffusion_pruning_tpu.training.finetuner import (
    FineTuneConfig, FineTunerModules, make_finetune_optimizer, make_finetune_step,
)
from diffusion_pruning_tpu.training.loop import FineTuneLoop, LoopConfig


@pytest.fixture(scope="module")
def setup():
    rng = jax.random.PRNGKey(0)
    ucfg = UNetConfig.tiny(cross_attention_dim=32)
    spec = build_structure(ucfg)
    teacher = GatedUNet(ucfg)
    dense = teacher.init_params(rng, batch=1)
    arch = np.ones(spec.vq_dim)
    arch[: spec.num_width // 2] = 0.0
    for sb in spec.subblocks:
        for s in sb.sites:
            arch[s.start] = 1.0
    plan = make_expert_plan(spec, arch)
    student = GatedUNet(ucfg, plan=plan)
    student_params = slice_expert_params(dense, plan)

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
    return mods, frozen, student_params, arch, res


def _batch(res, b=4, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 2)
    return {"pixel_values": jax.random.normal(ks[0], (b, res, res, 3)) * 0.5,
            "input_ids": jax.random.randint(ks[1], (b, 77), 0, 128)}


def test_finetune_step_updates_student(setup):
    mods, frozen, student_params, arch, res = setup
    cfg = FineTuneConfig(lr_warmup_steps=0, scale_lr=False, unet_lr=1e-4)
    opt = make_finetune_optimizer(cfg, global_batch=4)
    step = make_finetune_step(mods, cfg, opt, mesh=None)
    params = jax.tree.map(jnp.asarray, student_params)
    opt_state = opt.init(params)
    new_params, new_opt, metrics = step(params, frozen, opt_state, _batch(res),
                                        jax.random.PRNGKey(1))
    for k in ("loss", "diffusion_loss", "distillation_loss", "block_loss"):
        assert np.isfinite(float(metrics[k])), k
    delta = jax.tree.reduce(lambda a, b: a + b, jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).sum()), new_params, params))
    assert delta > 0


def test_finetune_loop_checkpoint_and_resume(setup, tmp_path):
    mods, frozen, student_params, arch, res = setup
    cfg = FineTuneConfig(lr_warmup_steps=0, scale_lr=False)
    opt = make_finetune_optimizer(cfg, global_batch=2)
    step = make_finetune_step(mods, cfg, opt, mesh=None)
    lc = LoopConfig(max_train_steps=2, checkpoints_total_limit=2, log_every=1)

    def batches(_epoch=0):
        for i in range(4):
            yield _batch(res, b=2, key=i)

    loop = FineTuneLoop(step, None, student_params, frozen, opt, lc,
                        str(tmp_path), arch_vector=arch)
    loop.train(batches)
    assert loop.ckpt.latest_step() == 2
    # arch_vector.pt beside the checkpoint (reference contract)
    import os
    assert os.path.exists(os.path.join(loop.ckpt.dir_for(2), "arch_vector.pt"))

    # resume continues from step 2
    lc2 = LoopConfig(max_train_steps=3, checkpoints_total_limit=2,
                     log_every=1, resume_from="latest")
    loop2 = FineTuneLoop(step, None, student_params, frozen, opt, lc2,
                         str(tmp_path), arch_vector=arch)
    loop2.train(batches)
    assert loop2.global_step == 3


def test_ema_tracks_params(setup):
    mods, frozen, student_params, arch, res = setup
    cfg = FineTuneConfig(lr_warmup_steps=0, scale_lr=False, unet_lr=1e-3)
    opt = make_finetune_optimizer(cfg, global_batch=2)
    step = make_finetune_step(mods, cfg, opt, mesh=None)
    lc = LoopConfig(max_train_steps=2, log_every=10)
    loop = FineTuneLoop(step, None, student_params, frozen, opt, lc,
                        "/tmp/ema_test", ema_decay=0.5)

    def batches(_epoch=0):
        for i in range(2):
            yield _batch(res, b=2, key=i)

    p0 = jax.tree.map(lambda x: np.asarray(x), loop.params)
    loop.train(batches)
    # EMA sits between the initial and current params
    leaf = "conv_in"
    cur = np.asarray(loop.params[leaf]["kernel"])
    ema = np.asarray(loop.ema_params[leaf]["kernel"])
    init = p0[leaf]["kernel"]
    d_cur = np.abs(ema - cur).mean()
    d_init = np.abs(ema - init).mean()
    assert d_cur > 0 and d_init > 0


def test_gradient_accumulation_matches_manual_average(setup):
    """accum_steps=2: the scanned micro-batch accumulation equals manually
    averaging the two micro-batch gradients (same key split) and applying
    one optimizer update (the reference's accelerate
    gradient_accumulation_steps semantics, trainer.py:114)."""
    from diffusion_pruning_tpu.training.finetuner import _losses, make_local_finetune_step

    mods, frozen, student_params, arch, res = setup
    cfg = FineTuneConfig(lr_warmup_steps=0, scale_lr=False, unet_lr=1e-4)
    opt = make_finetune_optimizer(cfg, global_batch=4)
    params = jax.tree.map(jnp.asarray, student_params)
    opt_state = opt.init(params)
    batch = _batch(res, b=4, key=9)
    key = jax.random.PRNGKey(11)

    acc_step = jax.jit(make_local_finetune_step(mods, cfg, opt, None,
                                                accum_steps=2))
    a_params, a_opt, a_metrics = acc_step(params, frozen, opt_state, batch, key)

    # manual reference: two micro grads with the same split keys, averaged
    keys = jax.random.split(key, 2)
    micro = {k: v.reshape(2, 2, *v.shape[1:]) for k, v in batch.items()}
    grads, metrics = None, None
    for i in range(2):
        mb = {k: v[i] for k, v in micro.items()}
        (_, m), g = jax.value_and_grad(
            lambda p: _losses(mods, cfg, p, frozen, mb, keys[i]), has_aux=True
        )(params)
        grads = g if grads is None else jax.tree.map(jnp.add, grads, g)
        metrics = m if metrics is None else jax.tree.map(jnp.add, metrics, m)
    grads = jax.tree.map(lambda x: x / 2, grads)
    updates, _ = opt.update(grads, opt_state, params)
    want_params = optax.apply_updates(params, updates)

    for k in a_metrics:
        np.testing.assert_allclose(float(a_metrics[k]),
                                   float(metrics[k]) / 2, rtol=1e-5, err_msg=k)
    flat_a, _ = jax.tree_util.tree_flatten(a_params)
    flat_w, _ = jax.tree_util.tree_flatten(want_params)
    for i, (x, y) in enumerate(zip(flat_a, flat_w)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-3, atol=5e-5, err_msg=f"leaf {i}")
