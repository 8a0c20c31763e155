"""DDIM sampler (η=0) as a single `lax.scan` over the denoising trajectory.

Replaces the reference's diffusers `DDIMScheduler` usage in validation
generation (trainer.py:700-701, pruning_pipelines.py:767-814). The model
function is passed in, so the same sampler drives the gated U-Net (with a
fixed per-prompt arch), a materialised expert, or the dense baseline. SD
defaults: leading timestep spacing with steps_offset=1,
set_alpha_to_one=False, no sample clipping.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_pruning_tpu.schedulers.ddpm import DiffusionSchedule


@dataclasses.dataclass(frozen=True)
class DDIMSampler:
    schedule: DiffusionSchedule
    steps_offset: int = 1

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        T = self.schedule.num_train_timesteps
        ratio = T // num_inference_steps
        ts = (np.arange(num_inference_steps) * ratio).round().astype(np.int64)
        ts += self.steps_offset
        return ts[::-1].copy()

    def sample(
        self,
        model_fn: Callable[[jax.Array, jax.Array], jax.Array],
        latents: jax.Array,
        num_inference_steps: int = 50,
    ) -> jax.Array:
        """model_fn(latents, t_batch) -> model output (ε or v, per schedule).
        CFG combination happens inside model_fn (pipeline-level)."""
        sched = self.schedule
        ts = jnp.asarray(self.timesteps(num_inference_steps))
        ratio = sched.num_train_timesteps // num_inference_steps
        ac = sched.alphas_cumprod
        final_ac = ac[0]  # set_alpha_to_one=False

        def step(x, t):
            t_b = jnp.full((x.shape[0],), t, jnp.int32)
            out = model_fn(x, t_b)
            eps, x0 = sched.to_epsilon_and_x0(out, x, t_b)
            t_prev = t - ratio
            ac_prev = jnp.where(t_prev >= 0, ac[jnp.maximum(t_prev, 0)], final_ac)
            x_prev = jnp.sqrt(ac_prev) * x0 + jnp.sqrt(1.0 - ac_prev) * eps
            return x_prev.astype(x.dtype), None

        latents, _ = jax.lax.scan(step, latents, ts)
        return latents
