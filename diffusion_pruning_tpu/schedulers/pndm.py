"""PNDM/PLMS sampler (skip_prk_steps variant used by Stable Diffusion).

Replaces the diffusers `PNDMScheduler` the reference uses for FID image
generation (scripts/metrics/generate_fid_images.py:104,126-139; 25 steps).
The fourth-order linear multistep runs as a `lax.fori_loop` with a rolling
(4, ...) model-output history buffer (ε or v — the combination lives in the
model's output space, with the v→ε conversion applied after combination, as
in diffusers) and a `lax.switch` over the warm-up order — fully static
shapes, one compiled U-Net call per step.

Timestep plan (leading spacing, steps_offset=1, skip_prk_steps=True): the
second timestep is visited twice; on that repeat the output-history is
averaged and the sampler restarts from the stashed first sample — matching
the diffusers PLMS warm-up exactly (trajectory parity pinned against a
hand-ported golden in tests/test_sampler_parity.py).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_pruning_tpu.schedulers.ddpm import DiffusionSchedule


@dataclasses.dataclass(frozen=True)
class PNDMSampler:
    schedule: DiffusionSchedule
    steps_offset: int = 1

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        T = self.schedule.num_train_timesteps
        ratio = T // num_inference_steps
        base = (np.arange(num_inference_steps) * ratio).round().astype(np.int64)
        base += self.steps_offset
        # [..., t_{n-2}, t_{n-1}] -> reversed with t_{n-2} duplicated:
        ts = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1]
        return ts.copy()

    def sample(
        self,
        model_fn: Callable[[jax.Array, jax.Array], jax.Array],
        latents: jax.Array,
        num_inference_steps: int = 25,
    ) -> jax.Array:
        sched = self.schedule
        ts = jnp.asarray(self.timesteps(num_inference_steps))
        n = int(ts.shape[0])
        ratio = sched.num_train_timesteps // num_inference_steps
        ac = sched.alphas_cumprod
        final_ac = ac[0]

        def prev_sample(x, t, t_prev, mo):
            # PNDM transfer formula (Liu et al. 2022, eq. 11). The history
            # combination (`mo`) is in MODEL-OUTPUT space; for v-prediction
            # the v→ε conversion happens HERE — after the linear-multistep
            # combination, with the (possibly stashed) sample and (possibly
            # shifted) timestep — exactly as diffusers' PNDMScheduler
            # `_get_prev_sample` does (parity pinned by
            # tests/test_sampler_parity.py vs the hand-ported golden).
            a_t = ac[t]
            a_prev = jnp.where(t_prev >= 0, ac[jnp.maximum(t_prev, 0)], final_ac)
            if sched.prediction_type == "v_prediction":
                eps = jnp.sqrt(a_t) * mo + jnp.sqrt(1.0 - a_t) * x
            else:
                eps = mo
            x_coeff = jnp.sqrt(a_prev / a_t)
            denom = a_t * jnp.sqrt(1.0 - a_prev) + jnp.sqrt(a_t * a_prev * (1.0 - a_t))
            eps_coeff = (a_prev - a_t) / denom
            return x_coeff * x - eps_coeff * eps

        def body(i, carry):
            x, ets, n_ets, stash = carry
            t = ts[i]
            t_b = jnp.full((x.shape[0],), t, jnp.int32)
            eps = model_fn(x, t_b).astype(jnp.float32)  # raw ε or v output
            is_repeat = i == 1  # the duplicated second visit

            # push the raw model output into history unless this is the
            # repeat step
            ets_new = jnp.where(is_repeat, ets,
                                jnp.concatenate([ets[1:], eps[None]], axis=0))
            n_new = jnp.where(is_repeat, n_ets, jnp.minimum(n_ets + 1, 4))

            def order1(_):
                return ets_new[-1]

            def order1_repeat(_):
                return (ets_new[-1] + eps) / 2.0

            def order2(_):
                return (3.0 * ets_new[-1] - ets_new[-2]) / 2.0

            def order3(_):
                return (23.0 * ets_new[-1] - 16.0 * ets_new[-2] + 5.0 * ets_new[-3]) / 12.0

            def order4(_):
                return (55.0 * ets_new[-1] - 59.0 * ets_new[-2]
                        + 37.0 * ets_new[-3] - 9.0 * ets_new[-4]) / 24.0

            branch = jnp.where(is_repeat, 0, jnp.minimum(n_new, 4))
            eps_lms = jax.lax.switch(
                branch, [order1_repeat, order1, order2, order3, order4], None)

            # the very first step stashes the sample and steps from it; the
            # repeat step restarts from the stash and re-does the SAME
            # transfer t+ratio -> t with the averaged ε (diffusers PLMS
            # warm-up: prev_timestep=timestep, timestep=timestep+ratio)
            stash_new = jnp.where(i == 0, x, stash)
            x_base = jnp.where(is_repeat, stash_new, x)
            t_step = jnp.where(is_repeat, t + ratio, t)
            t_prev = jnp.where(is_repeat, t, t - ratio)
            x_next = prev_sample(x_base.astype(jnp.float32), t_step, t_prev, eps_lms)
            return x_next.astype(x.dtype), ets_new, n_new, stash_new

        ets0 = jnp.zeros((4,) + latents.shape, jnp.float32)
        stash0 = jnp.zeros_like(latents)
        x, _, _, _ = jax.lax.fori_loop(0, n, body, (latents, ets0, jnp.asarray(0), stash0))
        return x
