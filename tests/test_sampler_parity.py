"""Golden sampler parity: our DDIM/PNDM vs hand-ported diffusers steppers.

The reference's samplers are diffusers `DDIMScheduler` (validation
generation, trainer.py:700-701) and `PNDMScheduler` (FID image generation,
scripts/metrics/generate_fid_images.py:104) with SD-2.1's quirky config:
leading timestep spacing, steps_offset=1, set_alpha_to_one=False, PLMS
duplicated-second-step warm-up, v-space multistep combination. These tests
pin TRAJECTORY equality of schedulers/{ddim,pndm}.py against faithful torch
ports (tests/torch_mini_schedulers.py) over 25/50 steps for both ε- and
v-prediction, plus sample_progressive's chunked trajectory against
DDIMSampler.sample.
"""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from diffusion_pruning_tpu.schedulers import DDIMSampler, DiffusionSchedule, PNDMSampler
from torch_mini_schedulers import RefDDIMScheduler, RefPNDMScheduler

SHAPE = (2, 4, 4, 4)


def _model_jax(x, t_b):
    # deterministic fake denoiser, identical math in torch below
    tt = t_b.astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 1))
    return 0.1 * jnp.sin(3.0 * x) + 0.05 * jnp.cos(tt / 50.0)


def _model_torch(x, t):
    return 0.1 * torch.sin(3.0 * x) + 0.05 * math.cos(t / 50.0)


def _init_latents():
    return np.asarray(jax.random.normal(jax.random.PRNGKey(0), SHAPE),
                      dtype=np.float32)


@pytest.mark.parametrize("prediction_type", ["epsilon", "v_prediction"])
@pytest.mark.parametrize("steps", [25, 50])
def test_ddim_trajectory_matches_diffusers(prediction_type, steps):
    sched = DiffusionSchedule(prediction_type=prediction_type)
    sampler = DDIMSampler(sched)
    x0 = _init_latents()

    ref = RefDDIMScheduler(prediction_type=prediction_type)
    ref.set_timesteps(steps)
    np.testing.assert_array_equal(sampler.timesteps(steps), ref.timesteps)

    x_t = torch.from_numpy(x0.copy())
    for t in ref.timesteps:
        out = _model_torch(x_t, int(t))
        x_t = ref.step(out, int(t), x_t)

    x_j = jax.jit(lambda z: sampler.sample(_model_jax, z, steps))(jnp.asarray(x0))
    np.testing.assert_allclose(np.asarray(x_j), x_t.numpy(),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("prediction_type", ["epsilon", "v_prediction"])
@pytest.mark.parametrize("steps", [25, 50])
def test_pndm_trajectory_matches_diffusers(prediction_type, steps):
    sched = DiffusionSchedule(prediction_type=prediction_type)
    sampler = PNDMSampler(sched)
    x0 = _init_latents()

    ref = RefPNDMScheduler(prediction_type=prediction_type)
    ref.set_timesteps(steps)
    np.testing.assert_array_equal(sampler.timesteps(steps), ref.timesteps)

    x_t = torch.from_numpy(x0.copy())
    for t in ref.timesteps:
        out = _model_torch(x_t, int(t))
        x_t = ref.step(out, int(t), x_t)

    x_j = jax.jit(lambda z: sampler.sample(_model_jax, z, steps))(jnp.asarray(x0))
    np.testing.assert_allclose(np.asarray(x_j), x_t.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_sample_progressive_matches_ddim_sampler():
    """The chunked progressive trajectory must land exactly on
    DDIMSampler.sample — pruning_pipelines.py:1003-1231 semantics with our
    one-scan sampler as ground truth (VERDICT r2 weak #5)."""
    from test_pipeline import build_tiny_pipeline
    p = build_tiny_pipeline()
    cfg = p.unet.cfg
    b = 2
    ids = jnp.ones((b, cfg.max_text_len), jnp.int32)
    neg = jnp.zeros((b, cfg.max_text_len), jnp.int32)
    key = jax.random.PRNGKey(3)

    snaps, indices = p.sample_progressive(ids, neg, key, num_inference_steps=6,
                                          snapshot_every=2)
    assert len(snaps) == 3

    # ground truth: the same routed trajectory through the scan sampler
    prompt_embeds = p.encode_prompt(ids)
    neg_embeds = p.encode_prompt(neg)
    arch, idx2 = p.route(prompt_embeds)
    np.testing.assert_array_equal(np.asarray(indices), np.asarray(idx2))
    latents = p.denoise(key, prompt_embeds, neg_embeds, arch,
                        num_inference_steps=6, guidance_scale=7.5)
    ref_img = p.decode(latents)
    np.testing.assert_allclose(np.asarray(snaps[-1]), np.asarray(ref_img),
                               rtol=2e-4, atol=2e-4)
