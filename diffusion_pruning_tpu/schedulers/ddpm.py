"""DDPM noise schedule math (α-schedule, q-sampling, v-prediction).

Self-contained equivalent of the scheduler functionality the reference pulls
from diffusers (`DDIMScheduler.from_pretrained(..., subfolder="scheduler")`,
trainer.py:700-701): the scaled-linear β schedule used by SD-2.1, forward
noising `add_noise`, and `get_velocity` for the v-prediction objective.
Everything returns jnp arrays usable inside a jitted train step.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "v_prediction"

    @property
    def betas(self) -> np.ndarray:
        if self.beta_schedule == "scaled_linear":
            return np.linspace(self.beta_start ** 0.5, self.beta_end ** 0.5,
                               self.num_train_timesteps, dtype=np.float64) ** 2
        if self.beta_schedule == "linear":
            return np.linspace(self.beta_start, self.beta_end,
                               self.num_train_timesteps, dtype=np.float64)
        raise ValueError(self.beta_schedule)

    @property
    def alphas_cumprod(self) -> jnp.ndarray:
        return jnp.asarray(np.cumprod(1.0 - self.betas), dtype=jnp.float32)

    def _coeffs(self, timesteps: jax.Array, ndim: int):
        ac = self.alphas_cumprod[timesteps]
        shape = (-1,) + (1,) * (ndim - 1)
        return (ac ** 0.5).reshape(shape), ((1.0 - ac) ** 0.5).reshape(shape)

    def add_noise(self, latents: jax.Array, noise: jax.Array, timesteps: jax.Array) -> jax.Array:
        sa, so = self._coeffs(timesteps, latents.ndim)
        return sa * latents + so * noise

    def get_velocity(self, latents: jax.Array, noise: jax.Array, timesteps: jax.Array) -> jax.Array:
        sa, so = self._coeffs(timesteps, latents.ndim)
        return sa * noise - so * latents

    def target(self, latents: jax.Array, noise: jax.Array, timesteps: jax.Array) -> jax.Array:
        if self.prediction_type == "epsilon":
            return noise
        if self.prediction_type == "v_prediction":
            return self.get_velocity(latents, noise, timesteps)
        raise ValueError(self.prediction_type)

    def to_epsilon_and_x0(self, model_out: jax.Array, sample: jax.Array,
                          timesteps: jax.Array):
        """Convert the model output (ε or v) to (ε, x₀) predictions."""
        sa, so = self._coeffs(timesteps, sample.ndim)
        if self.prediction_type == "epsilon":
            eps = model_out
            x0 = (sample - so * eps) / sa
        elif self.prediction_type == "v_prediction":
            x0 = sa * sample - so * model_out
            eps = sa * model_out + so * sample
        else:
            raise ValueError(self.prediction_type)
        return eps, x0
