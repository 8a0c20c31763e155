"""DPM-Solver++(2M) sampler — beyond-reference serving speedup.

The reference generates with DDIM-50 (validation, trainer.py:700-701) or
PNDM-25 (FID images, scripts/metrics/generate_fid_images.py:104). Both are
first-order in the probability-flow ODE's exponential integrator form.
DPM-Solver++(2M) (Lu et al. 2022, arXiv 2211.01095 — multistep, second
order, data-prediction parametrisation, midpoint variant) reaches the same
sample quality in roughly half the steps, which is a direct img/s win for
serving: one extra latent-sized buffer carried through the scan, zero extra
model evaluations.

Same house shape as DDIMSampler: the whole trajectory is one `lax.scan`,
`model_fn` owns CFG and the gated/pruned U-Net call, timesteps use SD's
leading spacing with steps_offset=1 and the set_alpha_to_one=False final
target (exactly the DDIM plan, so the routed pipeline can switch samplers
without touching its cache keys' semantics).

Update rule (s0 = current eval point, t = integration target, λ = log α/σ):

    h   = λ_t − λ_s0
    1st order (step 0, and the final step when lower_order_final):
        x_t = (σ_t/σ_s0)·x − α_t·(e^{−h}−1)·x0(s0)
    2M  (midpoint): with h_prev = λ_s0 − λ_s1 and D1 = (h/h_prev)·(x0_s0 − x0_s1)
        x_t = (σ_t/σ_s0)·x − α_t·(e^{−h}−1)·(x0_s0 + D1/2)

For a constant x0 prediction both orders integrate the ODE *exactly*
(tests/test_dpm_solver.py pins this to machine precision), and on a
λ-smooth problem with a closed-form ODE solution the 2M error is several
times smaller than DDIM's at every step count — in particular DPM++ at n
steps beats DDIM at 2n (the serving claim). That pair of properties, not
trajectory goldens, is the correctness contract here (there is no reference
implementation to golden against; the update rule itself matches diffusers'
DPMSolverMultistepScheduler midpoint variant term for term).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_pruning_tpu.schedulers.ddpm import DiffusionSchedule


@dataclasses.dataclass(frozen=True)
class DPMSolverPPSampler:
    schedule: DiffusionSchedule
    steps_offset: int = 1
    lower_order_final: bool = True

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
        num_inference_steps: int = 20,
    ) -> jax.Array:
        """model_fn(latents, t_batch) -> model output (ε or v, per schedule).
        CFG combination happens inside model_fn (pipeline-level)."""
        sched = self.schedule
        n = num_inference_steps
        ts = jnp.asarray(self.timesteps(n))
        ratio = sched.num_train_timesteps // n
        ac = sched.alphas_cumprod
        final_ac = ac[0]  # set_alpha_to_one=False

        def lam(ac_t):
            # log(α/σ) = ½(log ac − log(1−ac))
            return 0.5 * (jnp.log(ac_t) - jnp.log1p(-ac_t))

        def step(carry, inp):
            x, x0_prev, h_prev = carry
            t, i = inp
            t_b = jnp.full((x.shape[0],), t, jnp.int32)
            out = model_fn(x, t_b)
            _, x0 = sched.to_epsilon_and_x0(out, x, t_b)
            x0 = x0.astype(jnp.float32)

            ac_s0 = ac[t]
            t_prev = t - ratio
            ac_t = jnp.where(t_prev >= 0, ac[jnp.maximum(t_prev, 0)], final_ac)
            h = lam(ac_t) - lam(ac_s0)
            alpha_t = jnp.sqrt(ac_t)
            sigma_t, sigma_s0 = jnp.sqrt(1.0 - ac_t), jnp.sqrt(1.0 - ac_s0)
            em = jnp.expm1(-h)

            xf = x.astype(jnp.float32)
            # h_prev == 0 can only happen at num_inference_steps ==
            # num_train_timesteps (ts[0] == T clamps to ac[T-1] → first h
            # is 0); the first-order branch is selected there but XLA still
            # evaluates d1, so keep it finite.
            safe_h_prev = jnp.where(h_prev == 0.0, 1.0, h_prev)
            d1 = (h / safe_h_prev) * (x0 - x0_prev)
            first = (sigma_t / sigma_s0) * xf - alpha_t * em * x0
            second = first - 0.5 * alpha_t * em * d1
            use_first = (i == 0) | (self.lower_order_final & (i == n - 1))
            x_new = jnp.where(use_first, first, second)
            return (x_new.astype(x.dtype), x0, h), None

        # h_prev=1 is a dummy: step 0 takes the first-order branch, but XLA
        # evaluates both, so keep d1 finite there.
        carry0 = (latents, jnp.zeros(latents.shape, jnp.float32),
                  jnp.float32(1.0))
        (latents, _, _), _ = jax.lax.scan(
            step, carry0, (ts, jnp.arange(n, dtype=jnp.int32)))
        return latents
