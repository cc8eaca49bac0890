"""Discrete diffusion noise schedule + forward process.

Pure-functional equivalents of the reference's scheduler usage:
- training add-noise / velocity (diffusers DDPMScheduler, used in
  /root/reference/train.py:691-699),
- zero-terminal-SNR rescale (/root/reference/train.py:39,515-516),
- image→noised-video init `DDPM_forward_timesteps`
  (/root/reference/utils/common.py:32-48) and freeze/move mask blend
  `DDPM_forward_mask` (/root/reference/utils/common.py:50-62).

All schedule tables are fp32; everything is jit/scan friendly.
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np


BetaScheduleName = Literal["linear", "scaled_linear", "squaredcos_cap_v2"]


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Immutable schedule tables. Registered as a pytree leaf-holder so it can
    be closed over by jitted functions."""

    num_train_timesteps: int
    betas: jnp.ndarray            # [T]
    alphas_cumprod: jnp.ndarray   # [T]
    prediction_type: str = "epsilon"  # epsilon | v_prediction | sample

    @property
    def sqrt_alphas_cumprod(self) -> jnp.ndarray:
        return jnp.sqrt(self.alphas_cumprod)

    @property
    def sqrt_one_minus_alphas_cumprod(self) -> jnp.ndarray:
        return jnp.sqrt(1.0 - self.alphas_cumprod)

    @property
    def final_alpha_cumprod(self) -> jnp.ndarray:
        return jnp.asarray(1.0, dtype=jnp.float32)


def _make_betas(
    name: BetaScheduleName,
    num_train_timesteps: int,
    beta_start: float,
    beta_end: float,
) -> np.ndarray:
    if name == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    if name == "scaled_linear":
        return (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64)
            ** 2
        )
    if name == "squaredcos_cap_v2":
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
        ts = np.arange(num_train_timesteps, dtype=np.float64)
        return np.minimum(1.0 - alpha_bar((ts + 1) / num_train_timesteps) / alpha_bar(ts / num_train_timesteps), 0.999)
    raise ValueError(f"unknown beta schedule {name}")


def make_schedule(
    num_train_timesteps: int = 1000,
    beta_schedule: BetaScheduleName = "scaled_linear",
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    prediction_type: str = "epsilon",
    rescale_betas_zero_snr: bool = False,
) -> DiffusionSchedule:
    betas = _make_betas(beta_schedule, num_train_timesteps, beta_start, beta_end)
    if rescale_betas_zero_snr:
        betas = rescale_zero_terminal_snr(betas)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    return DiffusionSchedule(
        num_train_timesteps=num_train_timesteps,
        betas=jnp.asarray(betas, dtype=jnp.float32),
        alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=jnp.float32),
        prediction_type=prediction_type,
    )


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Shift the schedule so terminal SNR is exactly zero (Lin et al. 2023;
    reference: diffusers ``rescale_zero_terminal_snr`` used at
    /root/reference/train.py:516)."""
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_bar_sqrt = np.sqrt(alphas_cumprod)

    a0 = alphas_bar_sqrt[0].copy()
    aT = alphas_bar_sqrt[-1].copy()
    alphas_bar_sqrt = alphas_bar_sqrt - aT            # terminal → 0
    alphas_bar_sqrt = alphas_bar_sqrt * a0 / (a0 - aT)  # first → original

    alphas_bar = alphas_bar_sqrt**2
    alphas = alphas_bar[1:] / alphas_bar[:-1]
    alphas = np.concatenate([alphas_bar[0:1], alphas])
    return 1.0 - alphas


def _extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-sample schedule values and broadcast to an ndim tensor."""
    vals = jnp.take(table, t, axis=0).astype(jnp.float32)
    return vals.reshape(vals.shape + (1,) * (ndim - vals.ndim))


def add_noise(
    schedule: DiffusionSchedule,
    x0: jnp.ndarray,
    noise: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """q(x_t | x_0): sqrt(ā_t) x0 + sqrt(1-ā_t) eps.  fp32 coefficients."""
    sa = _extract(schedule.sqrt_alphas_cumprod, t, x0.ndim)
    sb = _extract(schedule.sqrt_one_minus_alphas_cumprod, t, x0.ndim)
    return (sa * x0.astype(jnp.float32) + sb * noise.astype(jnp.float32)).astype(x0.dtype)


def get_velocity(
    schedule: DiffusionSchedule,
    x0: jnp.ndarray,
    noise: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    sa = _extract(schedule.sqrt_alphas_cumprod, t, x0.ndim)
    sb = _extract(schedule.sqrt_one_minus_alphas_cumprod, t, x0.ndim)
    return (sa * noise.astype(jnp.float32) - sb * x0.astype(jnp.float32)).astype(x0.dtype)


def pred_x0(
    schedule: DiffusionSchedule,
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """Recover x̂0 from the model output under the schedule's prediction type
    (reference analog: ``remove_noise`` /root/reference/train.py:635-656)."""
    sample = sample.astype(jnp.float32)
    model_output = model_output.astype(jnp.float32)
    sa = _extract(schedule.sqrt_alphas_cumprod, t, sample.ndim)
    sb = _extract(schedule.sqrt_one_minus_alphas_cumprod, t, sample.ndim)
    if schedule.prediction_type == "epsilon":
        return (sample - sb * model_output) / sa
    if schedule.prediction_type == "v_prediction":
        return sa * sample - sb * model_output
    if schedule.prediction_type == "sample":
        return model_output
    raise ValueError(schedule.prediction_type)


def pred_epsilon(
    schedule: DiffusionSchedule,
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    sample = sample.astype(jnp.float32)
    model_output = model_output.astype(jnp.float32)
    sa = _extract(schedule.sqrt_alphas_cumprod, t, sample.ndim)
    sb = _extract(schedule.sqrt_one_minus_alphas_cumprod, t, sample.ndim)
    if schedule.prediction_type == "epsilon":
        return model_output
    if schedule.prediction_type == "v_prediction":
        return sa * model_output + sb * sample
    if schedule.prediction_type == "sample":
        return (sample - sa * model_output) / sb
    raise ValueError(schedule.prediction_type)


def ddpm_forward_timesteps(
    schedule: DiffusionSchedule,
    x0: jnp.ndarray,
    num_frames: int,
    timesteps: jnp.ndarray,
    rng: jax.Array,
) -> jnp.ndarray:
    """Image → noised video latents at the *first* (largest) timestep of a
    truncated sampler schedule: repeat the image latent f times along the frame
    axis, then add noise at timesteps[0].

    Reference: ``DDPM_forward_timesteps`` /root/reference/utils/common.py:32-48
    (latent-to-video sampling starts FROM the noised image, not pure noise).

    x0: (b, f0, h, w, c) (f0 typically 1) → (b, num_frames, h, w, c)
    """
    reps = num_frames // x0.shape[1]
    video = jnp.repeat(x0, reps, axis=1)
    noise = jax.random.normal(rng, video.shape, dtype=jnp.float32)
    t0 = jnp.broadcast_to(timesteps[0], (video.shape[0],))
    return add_noise(schedule, video, noise, t0)


def ddpm_forward_mask(
    schedule: DiffusionSchedule,
    x0: jnp.ndarray,
    mask: jnp.ndarray,
    num_frames: int,
    timesteps: jnp.ndarray,
    rng: jax.Array,
) -> jnp.ndarray:
    """Freeze/move blend: masked (moving) regions get fresh noise at t0 around
    the repeated image latent; this seeds the sampler so frozen regions start
    exactly at the conditioning frame.

    Reference: ``DDPM_forward_mask`` /root/reference/utils/common.py:50-62.
    mask: broadcastable to the video latents, 1 = may move.
    """
    noised = ddpm_forward_timesteps(schedule, x0, num_frames, timesteps, rng)
    reps = num_frames // x0.shape[1]
    frozen = jnp.repeat(x0, reps, axis=1)
    return mask * noised + (1.0 - mask) * frozen


jax.tree_util.register_pytree_node(
    DiffusionSchedule,
    lambda s: (
        (s.betas, s.alphas_cumprod),
        (s.num_train_timesteps, s.prediction_type),
    ),
    lambda aux, xs: DiffusionSchedule(
        num_train_timesteps=aux[0],
        betas=xs[0],
        alphas_cumprod=xs[1],
        prediction_type=aux[1],
    ),
)


def sample_noise(
    rng: jax.Array,
    shape: tuple,
    offset_noise_strength: float = 0.0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Gaussian noise with optional per-(sample,channel) offset noise
    (reference: ``sample_noise`` /root/reference/train.py:254-263).

    shape is (b, f, h, w, c) — the offset is shared across f/h/w.
    """
    r1, r2 = jax.random.split(rng)
    noise = jax.random.normal(r1, shape, dtype=dtype)
    if offset_noise_strength:
        b, c = shape[0], shape[-1]
        offset = jax.random.normal(r2, (b, 1, 1, 1, c), dtype=dtype)
        noise = noise + offset_noise_strength * offset
    return noise
