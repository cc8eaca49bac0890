"""Faithful numpy ports of the diffusers==0.24.0 scheduler update rules the
reference actually samples with — the step-for-step oracle for
tests/test_sampler_parity.py (VERDICT r3 next #5; SURVEY "Hard parts":
"scheduler-exactness ... must match diffusers numerics step-for-step").

Ported classes and their reference engagement points:
- ``DPMSolverMultistepScheduler`` — latent-model eval sampler
  (/root/reference/train.py:806-808); algorithm_type="dpmsolver++",
  solver_order=2, solver_type="midpoint", lower_order_final=True,
  timestep_spacing="linspace", no thresholding / karras — the exact config
  path the reference hits via ``from_config`` of the checkpoint scheduler.
- ``EulerDiscreteScheduler`` — SVD sampler (diffusers SVD pipeline);
  use_karras_sigmas=True with config sigma_min/sigma_max (the 0.24 SVD
  hack), timestep_type="continuous" (t = 0.25·logσ), v_prediction.
- ``DDPMScheduler.add_noise`` — the training forward process
  (/root/reference/train.py:691-699).

Only the exercised config paths are implemented; each method mirrors the
0.24 source structure so line-by-line review against upstream is possible.
Everything is float64-free numpy float32, like diffusers on CPU defaults.
"""

from __future__ import annotations

import numpy as np


def make_betas(num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
               beta_schedule="scaled_linear"):
    if beta_schedule == "scaled_linear":
        return (np.linspace(beta_start**0.5, beta_end**0.5,
                            num_train_timesteps, dtype=np.float64) ** 2)
    if beta_schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps,
                           dtype=np.float64)
    raise ValueError(beta_schedule)


class DDPMScheduler:
    """add_noise only (the path train.py:691-699 uses)."""

    def __init__(self, num_train_timesteps=1000, beta_start=0.00085,
                 beta_end=0.012, beta_schedule="scaled_linear"):
        betas = make_betas(num_train_timesteps, beta_start, beta_end,
                           beta_schedule)
        self.alphas_cumprod = np.cumprod(1.0 - betas).astype(np.float32)

    def add_noise(self, original_samples, noise, timesteps):
        sqrt_alpha_prod = self.alphas_cumprod[timesteps] ** 0.5
        sqrt_one_minus_alpha_prod = (1 - self.alphas_cumprod[timesteps]) ** 0.5
        while sqrt_alpha_prod.ndim < original_samples.ndim:
            sqrt_alpha_prod = sqrt_alpha_prod[..., None]
            sqrt_one_minus_alpha_prod = sqrt_one_minus_alpha_prod[..., None]
        return (sqrt_alpha_prod * original_samples
                + sqrt_one_minus_alpha_prod * noise)

    def get_velocity(self, sample, noise, timesteps):
        sqrt_alpha_prod = self.alphas_cumprod[timesteps] ** 0.5
        sqrt_one_minus_alpha_prod = (1 - self.alphas_cumprod[timesteps]) ** 0.5
        while sqrt_alpha_prod.ndim < sample.ndim:
            sqrt_alpha_prod = sqrt_alpha_prod[..., None]
            sqrt_one_minus_alpha_prod = sqrt_one_minus_alpha_prod[..., None]
        return sqrt_alpha_prod * noise - sqrt_one_minus_alpha_prod * sample


class DPMSolverMultistepScheduler:
    """diffusers 0.24 DPMSolverMultistepScheduler, dpmsolver++/2M/midpoint."""

    def __init__(self, num_train_timesteps=1000, beta_start=0.00085,
                 beta_end=0.012, beta_schedule="scaled_linear",
                 prediction_type="epsilon", solver_order=2,
                 lower_order_final=True):
        self.num_train_timesteps = num_train_timesteps
        self.prediction_type = prediction_type
        self.solver_order = solver_order
        self.lower_order_final = lower_order_final
        betas = make_betas(num_train_timesteps, beta_start, beta_end,
                           beta_schedule)
        self.alphas_cumprod = np.cumprod(1.0 - betas)

    def set_timesteps(self, num_inference_steps):
        # timestep_spacing="linspace" (0.24 default), lambda_min_clipped=-inf
        timesteps = (np.linspace(0, self.num_train_timesteps - 1,
                                 num_inference_steps + 1)
                     .round()[::-1][:-1].copy().astype(np.int64))
        sigmas = np.array(((1 - self.alphas_cumprod) / self.alphas_cumprod)
                          ** 0.5)
        sigmas = np.interp(timesteps, np.arange(0, len(sigmas)), sigmas)
        sigma_last = ((1 - self.alphas_cumprod[0])
                      / self.alphas_cumprod[0]) ** 0.5
        self.sigmas = np.concatenate([sigmas, [sigma_last]]).astype(np.float32)
        self.timesteps = timesteps
        self.model_outputs = [None] * self.solver_order
        self.lower_order_nums = 0
        self._step_index = None

    @staticmethod
    def _sigma_to_alpha_sigma_t(sigma):
        alpha_t = 1 / ((sigma**2 + 1) ** 0.5)
        return alpha_t, sigma * alpha_t

    def convert_model_output(self, model_output, sample):
        sigma = self.sigmas[self._step_index]
        alpha_t, sigma_t = self._sigma_to_alpha_sigma_t(sigma)
        if self.prediction_type == "epsilon":
            return (sample - sigma_t * model_output) / alpha_t
        if self.prediction_type == "v_prediction":
            return alpha_t * sample - sigma_t * model_output
        raise ValueError(self.prediction_type)

    def _first_order_update(self, model_output, sample):
        sigma_t, sigma_s = (self.sigmas[self._step_index + 1],
                            self.sigmas[self._step_index])
        alpha_t, sigma_t = self._sigma_to_alpha_sigma_t(sigma_t)
        alpha_s, sigma_s = self._sigma_to_alpha_sigma_t(sigma_s)
        lambda_t = np.log(alpha_t) - np.log(sigma_t)
        lambda_s = np.log(alpha_s) - np.log(sigma_s)
        h = lambda_t - lambda_s
        return ((sigma_t / sigma_s) * sample
                - (alpha_t * (np.exp(-h) - 1.0)) * model_output)

    def _second_order_update(self, model_output_list, sample):
        sigma_t = self.sigmas[self._step_index + 1]
        sigma_s0 = self.sigmas[self._step_index]
        sigma_s1 = self.sigmas[self._step_index - 1]
        m0, m1 = model_output_list[-1], model_output_list[-2]
        alpha_t, sigma_t = self._sigma_to_alpha_sigma_t(sigma_t)
        alpha_s0, sigma_s0 = self._sigma_to_alpha_sigma_t(sigma_s0)
        alpha_s1, sigma_s1 = self._sigma_to_alpha_sigma_t(sigma_s1)
        lambda_t = np.log(alpha_t) - np.log(sigma_t)
        lambda_s0 = np.log(alpha_s0) - np.log(sigma_s0)
        lambda_s1 = np.log(alpha_s1) - np.log(sigma_s1)
        h, h_0 = lambda_t - lambda_s0, lambda_s0 - lambda_s1
        r0 = h_0 / h
        D0, D1 = m0, (1.0 / r0) * (m0 - m1)
        # solver_type="midpoint"
        return ((sigma_t / sigma_s0) * sample
                - (alpha_t * (np.exp(-h) - 1.0)) * D0
                - 0.5 * (alpha_t * (np.exp(-h) - 1.0)) * D1)

    def step(self, model_output, timestep, sample):
        if self._step_index is None:
            self._step_index = int(np.nonzero(self.timesteps == timestep)[0][0])
        n = len(self.timesteps)
        lower_order_final = (self._step_index == n - 1
                             and self.lower_order_final and n < 15)
        lower_order_second = (self._step_index == n - 2
                              and self.lower_order_final and n < 15)

        model_output = self.convert_model_output(model_output, sample)
        for i in range(self.solver_order - 1):
            self.model_outputs[i] = self.model_outputs[i + 1]
        self.model_outputs[-1] = model_output

        if (self.solver_order == 1 or self.lower_order_nums < 1
                or lower_order_final):
            prev_sample = self._first_order_update(model_output, sample)
        else:
            prev_sample = self._second_order_update(self.model_outputs, sample)
        # (solver_order 2 path; the order-3 branch is not configured anywhere
        # in the reference)
        del lower_order_second
        if self.lower_order_nums < self.solver_order:
            self.lower_order_nums += 1
        self._step_index += 1
        return prev_sample


class EulerDiscreteScheduler:
    """diffusers 0.24 EulerDiscreteScheduler on the SVD config path:
    use_karras_sigmas with config sigma_min/max, timestep_type="continuous",
    prediction_type="v_prediction", s_churn=0 (deterministic)."""

    def __init__(self, num_train_timesteps=1000, sigma_min=0.002,
                 sigma_max=700.0, rho=7.0, prediction_type="v_prediction"):
        self.num_train_timesteps = num_train_timesteps
        self.sigma_min, self.sigma_max, self.rho = sigma_min, sigma_max, rho
        self.prediction_type = prediction_type

    def set_timesteps(self, num_inference_steps):
        # _convert_to_karras with the config sigma_min/sigma_max override
        ramp = np.linspace(0, 1, num_inference_steps)
        min_inv_rho = self.sigma_min ** (1 / self.rho)
        max_inv_rho = self.sigma_max ** (1 / self.rho)
        sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** self.rho
        # timestep_type="continuous" + v_prediction → t = 0.25·log σ
        self.timesteps = 0.25 * np.log(sigmas)
        self.sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
        self._step_index = 0

    @property
    def init_noise_sigma(self):
        # timestep_spacing != "linspace" path: (σ_max² + 1)^0.5
        return (self.sigmas[0] ** 2 + 1) ** 0.5

    def scale_model_input(self, sample, timestep=None):
        sigma = self.sigmas[self._step_index]
        return sample / ((sigma**2 + 1) ** 0.5)

    def step(self, model_output, timestep, sample):
        sigma = self.sigmas[self._step_index]
        # s_churn=0 → gamma=0, sigma_hat = sigma
        if self.prediction_type == "v_prediction":
            pred_original_sample = (model_output
                                    * (-sigma / (sigma**2 + 1) ** 0.5)
                                    + (sample / (sigma**2 + 1)))
        elif self.prediction_type == "epsilon":
            pred_original_sample = sample - sigma * model_output
        else:
            raise ValueError(self.prediction_type)
        derivative = (sample - pred_original_sample) / sigma
        dt = self.sigmas[self._step_index + 1] - sigma
        prev_sample = sample + derivative * dt
        self._step_index += 1
        return prev_sample
