"""PrunerLoop contract tests: checkpoint artifacts, reference-format export,
EMA, resume.

Pins the ADVICE round-1 high finding: `quantizer_embeddings.pt` must be the
training-noise embedding_gs snapshot (soft values — the tensor eval routing
uses), NOT a fixed-key hard re-realisation."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_pruning_tpu.core import build_structure
from diffusion_pruning_tpu.models.hypernet import HyperStructure
from diffusion_pruning_tpu.models.quantizer import StructureQuantizer
from diffusion_pruning_tpu.models.text_encoders import CLIPTextConfig, CLIPTextEncoder
from diffusion_pruning_tpu.models.unet.config import UNetConfig
from diffusion_pruning_tpu.models.unet.unet import GatedUNet
from diffusion_pruning_tpu.models.vae import AutoencoderKL, VAEConfig
from diffusion_pruning_tpu.schedulers import DiffusionSchedule
from diffusion_pruning_tpu.training import PrunerConfig, PrunerModules, make_pruner_step
from diffusion_pruning_tpu.training.loop import LoopConfig, PrunerLoop
from diffusion_pruning_tpu.training.pruner import make_optimizer, make_validation_step
from diffusion_pruning_tpu.utils.checkpoint import load_torch_artifact


@pytest.fixture(scope="module")
def loop_setup():
    rng = jax.random.PRNGKey(0)
    ucfg = UNetConfig.tiny(cross_attention_dim=32)
    spec = build_structure(ucfg)
    mods = PrunerModules(
        unet=GatedUNet(ucfg),
        vae=AutoencoderKL(VAEConfig.tiny()),
        text_encoder=CLIPTextEncoder(CLIPTextConfig.tiny()),
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
    return mods, frozen, trainable, res


def _batches(res, b=2, n=8):
    def gen(_epoch=0):
        rng = np.random.RandomState(0)
        for _ in range(n):
            yield {
                "pixel_values": rng.randn(b, res, res, 3).astype(np.float32) * 0.5,
                "input_ids": rng.randint(0, 128, (b, 77)).astype(np.int32),
                "mpnet_embeddings": rng.randn(b, 24).astype(np.float32),
            }
    return gen


def test_pruner_loop_checkpoint_artifacts_and_ema(loop_setup, tmp_path):
    mods, frozen, trainable, res = loop_setup
    cfg = PrunerConfig(lr_warmup_steps=0, scale_lr=False)
    opt = make_optimizer(cfg, global_batch=2)
    lc = LoopConfig(max_train_steps=3, hypernet_pretraining_steps=1,
                    validation_steps=100, image_logging_steps=0, log_every=1)
    loop = PrunerLoop(mods, cfg, lc, opt, make_pruner_step, make_validation_step,
                      trainable, frozen, str(tmp_path), ema_decay=0.5)
    t0 = jax.tree.map(np.asarray, loop.trainable)
    loop.train(_batches(res))
    assert loop.global_step == 3

    ckpt_dir = loop.ckpt.dir_for(3)
    emb = np.asarray(load_torch_artifact(os.path.join(ckpt_dir, "quantizer_embeddings.pt")))
    # the snapshot the step returned, verbatim — soft gumbel-sigmoid values
    np.testing.assert_array_equal(emb, np.asarray(loop.q_state["embedding_gs"]))
    assert ((emb > 0.0) & (emb < 1.0)).any(), "snapshot must be soft, not hard-binarised"

    # diffusers-style reference subfolders next to the orbax state
    for sub in ("hypernet", "quantizer"):
        assert os.path.exists(os.path.join(ckpt_dir, sub, "config.json")), sub
        assert os.path.exists(os.path.join(
            ckpt_dir, sub, "diffusion_pytorch_model.safetensors")), sub
    try:
        from safetensors.numpy import load_file
        q_sd = load_file(os.path.join(ckpt_dir, "quantizer",
                                      "diffusion_pytorch_model.safetensors"))
        np.testing.assert_allclose(q_sd["embedding_gs"], emb, rtol=1e-6)
    except ImportError:
        pass

    # EMA tracked the trainables: differs from both init and current
    d_init = jax.tree.reduce(lambda a, b: a + b, jax.tree.map(
        lambda e, i: float(jnp.abs(e - i).sum()), loop.ema_trainable, t0))
    d_cur = jax.tree.reduce(lambda a, b: a + b, jax.tree.map(
        lambda e, c: float(jnp.abs(e - c).sum()), loop.ema_trainable, loop.trainable))
    assert d_init > 0 and d_cur > 0

    # resume restores EMA too
    lc2 = LoopConfig(max_train_steps=3, hypernet_pretraining_steps=1,
                     image_logging_steps=0, resume_from="latest")
    loop2 = PrunerLoop(mods, cfg, lc2, opt, make_pruner_step, make_validation_step,
                       trainable, frozen, str(tmp_path), ema_decay=0.5)
    loop2.maybe_resume()
    assert loop2.global_step == 3
    d = jax.tree.reduce(lambda a, b: a + b, jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).sum()),
        loop2.ema_trainable, loop.ema_trainable))
    assert d == 0.0
