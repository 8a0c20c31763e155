"""Hand-ported diffusers schedulers (torch) — golden references.

Faithful line-level ports of the stepping logic of diffusers 0.23.1
`DDIMScheduler` / `PNDMScheduler` with the exact configuration the reference
uses (SD-2.1 scheduler config: scaled_linear betas 0.00085..0.012, T=1000,
leading timestep spacing, steps_offset=1, set_alpha_to_one=False,
clip_sample=False, skip_prk_steps=True). The reference drives these via
`DDIMScheduler.from_pretrained(...)` (pdm/training/trainer.py:700-701) and
`PNDMScheduler` for FID generation
(scripts/metrics/generate_fid_images.py:104). Written independently from the
published algorithm/API semantics — used only to pin trajectory parity of
schedulers/{ddim,pndm}.py.
"""
import numpy as np
import torch


def make_alphas_cumprod(num_train_timesteps=1000, beta_start=0.00085,
                        beta_end=0.012):
    betas = torch.linspace(beta_start ** 0.5, beta_end ** 0.5,
                           num_train_timesteps, dtype=torch.float32) ** 2
    return torch.cumprod(1.0 - betas, dim=0)


class RefDDIMScheduler:
    """diffusers DDIMScheduler (eta=0, no clipping/thresholding)."""

    def __init__(self, prediction_type="v_prediction", num_train_timesteps=1000,
                 steps_offset=1, set_alpha_to_one=False):
        self.T = num_train_timesteps
        self.prediction_type = prediction_type
        self.steps_offset = steps_offset
        self.alphas_cumprod = make_alphas_cumprod(num_train_timesteps)
        self.final_alpha_cumprod = (torch.tensor(1.0) if set_alpha_to_one
                                    else self.alphas_cumprod[0])
        self.num_inference_steps = None

    def set_timesteps(self, num_inference_steps):
        self.num_inference_steps = num_inference_steps
        step_ratio = self.T // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1]
        self.timesteps = ts.copy().astype(np.int64) + self.steps_offset

    def step(self, model_output, timestep, sample):
        prev_timestep = timestep - self.T // self.num_inference_steps
        alpha_prod_t = self.alphas_cumprod[timestep]
        alpha_prod_t_prev = (self.alphas_cumprod[prev_timestep]
                             if prev_timestep >= 0 else self.final_alpha_cumprod)
        beta_prod_t = 1 - alpha_prod_t
        if self.prediction_type == "epsilon":
            pred_original_sample = (sample - beta_prod_t ** 0.5 * model_output
                                    ) / alpha_prod_t ** 0.5
            pred_epsilon = model_output
        elif self.prediction_type == "v_prediction":
            pred_original_sample = (alpha_prod_t ** 0.5) * sample \
                - (beta_prod_t ** 0.5) * model_output
            pred_epsilon = (alpha_prod_t ** 0.5) * model_output \
                + (beta_prod_t ** 0.5) * sample
        else:
            raise ValueError(self.prediction_type)
        pred_sample_direction = (1 - alpha_prod_t_prev) ** 0.5 * pred_epsilon
        return (alpha_prod_t_prev ** 0.5 * pred_original_sample
                + pred_sample_direction)


class RefPNDMScheduler:
    """diffusers PNDMScheduler with skip_prk_steps=True (the PLMS variant
    Stable Diffusion uses). Stateful: counter / ets / cur_sample exactly as
    in the library."""

    def __init__(self, prediction_type="v_prediction", num_train_timesteps=1000,
                 steps_offset=1, set_alpha_to_one=False):
        self.T = num_train_timesteps
        self.prediction_type = prediction_type
        self.steps_offset = steps_offset
        self.alphas_cumprod = make_alphas_cumprod(num_train_timesteps)
        self.final_alpha_cumprod = (torch.tensor(1.0) if set_alpha_to_one
                                    else self.alphas_cumprod[0])
        self.num_inference_steps = None

    def set_timesteps(self, num_inference_steps):
        self.num_inference_steps = num_inference_steps
        step_ratio = self.T // num_inference_steps
        base = (np.arange(0, num_inference_steps) * step_ratio).round()
        base += self.steps_offset
        # skip_prk_steps=True: no Runge-Kutta warm-up; the second timestep is
        # visited twice
        plms = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1]
        self.timesteps = plms.copy().astype(np.int64)
        self.counter = 0
        self.ets = []
        self.cur_sample = None

    def step(self, model_output, timestep, sample):
        prev_timestep = timestep - self.T // self.num_inference_steps

        if self.counter != 1:
            self.ets = self.ets[-3:]
            self.ets.append(model_output)
        else:
            prev_timestep = timestep
            timestep = timestep + self.T // self.num_inference_steps

        if len(self.ets) == 1 and self.counter == 0:
            model_output = model_output
            self.cur_sample = sample
        elif len(self.ets) == 1 and self.counter == 1:
            model_output = (model_output + self.ets[-1]) / 2
            sample = self.cur_sample
            self.cur_sample = None
        elif len(self.ets) == 2:
            model_output = (3 * self.ets[-1] - self.ets[-2]) / 2
        elif len(self.ets) == 3:
            model_output = (23 * self.ets[-1] - 16 * self.ets[-2]
                            + 5 * self.ets[-3]) / 12
        else:
            model_output = (1 / 24) * (55 * self.ets[-1] - 59 * self.ets[-2]
                                       + 37 * self.ets[-3] - 9 * self.ets[-4])

        prev_sample = self._get_prev_sample(sample, timestep, prev_timestep,
                                            model_output)
        self.counter += 1
        return prev_sample

    def _get_prev_sample(self, sample, timestep, prev_timestep, model_output):
        alpha_prod_t = self.alphas_cumprod[timestep]
        alpha_prod_t_prev = (self.alphas_cumprod[prev_timestep]
                             if prev_timestep >= 0 else self.final_alpha_cumprod)
        beta_prod_t = 1 - alpha_prod_t
        beta_prod_t_prev = 1 - alpha_prod_t_prev
        # NOTE: for v-prediction the conversion happens HERE, after the
        # linear-multistep combination, with the (possibly stashed) sample
        # and (possibly shifted) timestep — the 4th-order history lives in
        # v space, not ε space.
        if self.prediction_type == "v_prediction":
            model_output = (alpha_prod_t ** 0.5) * model_output \
                + (beta_prod_t ** 0.5) * sample
        elif self.prediction_type != "epsilon":
            raise ValueError(self.prediction_type)
        sample_coeff = (alpha_prod_t_prev / alpha_prod_t) ** 0.5
        model_output_denom_coeff = alpha_prod_t * beta_prod_t_prev ** 0.5 + (
            alpha_prod_t * alpha_prod_t_prev * beta_prod_t) ** 0.5
        return (sample_coeff * sample
                - (alpha_prod_t_prev - alpha_prod_t) * model_output
                / model_output_denom_coeff)
