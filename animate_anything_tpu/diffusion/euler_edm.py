"""Continuous-sigma (EDM) schedule: EulerDiscrete sampling + EDM training
preconditioning for the SVD workload.

Reference math:
- training objective σ ~ exp(N(P_mean=0.7, P_std=1.6)), c_skip/c_out/c_in/
  c_noise and λ(σ) weighting — /root/reference/train_svd.py:402-412;
- inference EulerDiscreteScheduler with Karras sigmas in [0.002, 700] and
  continuous timestep 0.25·log σ (diffusers SVD scheduler config), used by
  ``MaskStableVideoDiffusionPipeline`` (/root/reference/models/pipeline.py:223+).

σ spans ~e^{±6}; everything here is fp32 by construction.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class EulerSchedule:
    sigmas: jnp.ndarray      # [n+1] descending, final 0
    timesteps: jnp.ndarray   # [n] continuous model-input timesteps 0.25·logσ

    @property
    def init_noise_sigma(self) -> jnp.ndarray:
        # timestep_spacing for SVD is continuous/karras → sqrt(σ_max² + 1)
        return jnp.sqrt(self.sigmas[0] ** 2 + 1.0)


def karras_sigmas(n: int, sigma_min: float, sigma_max: float, rho: float = 7.0) -> np.ndarray:
    ramp = np.linspace(0, 1, n)
    min_inv = sigma_min ** (1 / rho)
    max_inv = sigma_max ** (1 / rho)
    return (max_inv + ramp * (min_inv - max_inv)) ** rho


def make_euler_schedule(
    num_inference_steps: int,
    sigma_min: float = 0.002,
    sigma_max: float = 700.0,
    rho: float = 7.0,
) -> EulerSchedule:
    sig = karras_sigmas(num_inference_steps, sigma_min, sigma_max, rho)
    timesteps = 0.25 * np.log(sig)
    sig = np.concatenate([sig, [0.0]])
    return EulerSchedule(
        sigmas=jnp.asarray(sig, jnp.float32),
        timesteps=jnp.asarray(timesteps, jnp.float32),
    )


def scale_model_input(sample: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    return (sample.astype(jnp.float32) / jnp.sqrt(sigma**2 + 1.0)).astype(sample.dtype)


def euler_step(
    sample: jnp.ndarray,
    model_output: jnp.ndarray,
    sigma: jnp.ndarray,
    sigma_next: jnp.ndarray,
) -> jnp.ndarray:
    """One Euler update with v-prediction/EDM parameterization: the model
    output is combined via c_skip/c_out to x̂0, then an Euler ODE step."""
    sample32 = sample.astype(jnp.float32)
    out32 = model_output.astype(jnp.float32)
    x0 = out32 * (-sigma / jnp.sqrt(sigma**2 + 1.0)) + sample32 / (sigma**2 + 1.0)
    d = (sample32 - x0) / sigma
    prev = sample32 + d * (sigma_next - sigma)
    return prev.astype(sample.dtype)


@dataclasses.dataclass(frozen=True)
class EdmCoeffs:
    sigma: jnp.ndarray       # [b,1,1,1,1]
    c_skip: jnp.ndarray
    c_out: jnp.ndarray
    c_in: jnp.ndarray
    c_noise: jnp.ndarray     # [b]
    loss_weight: jnp.ndarray


def edm_sample_sigmas(rng: jax.Array, batch: int, p_mean: float = 0.7, p_std: float = 1.6) -> jnp.ndarray:
    """Training-time σ ~ LogNormal(P_mean, P_std), shaped (b,1,1,1,1) fp32."""
    z = jax.random.normal(rng, (batch, 1, 1, 1, 1), dtype=jnp.float32)
    return jnp.exp(z * p_std + p_mean)


def edm_precondition(sigma: jnp.ndarray) -> EdmCoeffs:
    """EDM coefficients exactly as /root/reference/train_svd.py:404-410."""
    sigma = sigma.astype(jnp.float32)
    c_skip = 1.0 / (sigma**2 + 1.0)
    c_out = -sigma / jnp.sqrt(sigma**2 + 1.0)
    c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
    c_noise = (jnp.log(sigma) / 4.0).reshape(sigma.shape[0])
    loss_weight = (sigma**2 + 1.0) / sigma**2
    return EdmCoeffs(
        sigma=sigma, c_skip=c_skip, c_out=c_out, c_in=c_in,
        c_noise=c_noise, loss_weight=loss_weight,
    )


jax.tree_util.register_pytree_node(
    EulerSchedule,
    lambda s: ((s.sigmas, s.timesteps), None),
    lambda _, xs: EulerSchedule(sigmas=xs[0], timesteps=xs[1]),
)
