"""Discrete-time samplers: DDIM and DPM-Solver++ (2M multistep).

Numerics match diffusers' ``DDIMScheduler`` / ``DPMSolverMultistepScheduler``
(the reference's eval sampler, /root/reference/train.py:806-808) step-for-step,
but are expressed as precomputed coefficient tables + pure step functions so a
whole 10-25-step denoise loop compiles into a single ``lax.scan``.

Truncated schedules (the reference's latent-to-video trick of starting from
``timesteps[k:]``, /root/reference/models/pipeline.py:147-158) are supported by
slicing the timestep grid before building tables.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from animate_anything_tpu.diffusion.schedule import DiffusionSchedule, pred_x0


# --------------------------------------------------------------------------
# Timestep grids
# --------------------------------------------------------------------------

def ddim_timesteps(
    num_train_timesteps: int,
    num_inference_steps: int,
    spacing: str = "leading",
    steps_offset: int = 1,
) -> np.ndarray:
    """Descending int timestep grid (diffusers ``set_timesteps`` semantics)."""
    if spacing == "leading":
        ratio = num_train_timesteps // num_inference_steps
        ts = (np.arange(num_inference_steps) * ratio).round()[::-1].astype(np.int64)
        ts = ts + steps_offset
    elif spacing == "linspace":
        ts = (
            np.linspace(0, num_train_timesteps - 1, num_inference_steps)
            .round()[::-1]
            .astype(np.int64)
        )
    elif spacing == "trailing":
        ts = np.arange(num_train_timesteps, 0, -num_train_timesteps / num_inference_steps)
        ts = (ts.round() - 1).astype(np.int64)
    else:
        raise ValueError(spacing)
    return ts


def dpmpp_timesteps(num_train_timesteps: int, num_inference_steps: int) -> np.ndarray:
    """diffusers DPMSolverMultistep default ('linspace'):
    linspace(0, T-1, n+1).round()[::-1][:-1]."""
    ts = (
        np.linspace(0, num_train_timesteps - 1, num_inference_steps + 1)
        .round()[::-1][:-1]
        .astype(np.int64)
    )
    return ts


# --------------------------------------------------------------------------
# DDIM
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SamplerState:
    """Carried through lax.scan. ``aux`` holds sampler-specific history
    (for DPM++ 2M: previous x0 estimate)."""

    sample: jnp.ndarray
    aux: jnp.ndarray | None = None


def ddim_step(
    schedule: DiffusionSchedule,
    sample: jnp.ndarray,
    model_output: jnp.ndarray,
    t: jnp.ndarray,
    t_prev: jnp.ndarray,
    eta: float = 0.0,
    set_alpha_to_one: bool = False,
) -> jnp.ndarray:
    """One deterministic DDIM update x_t → x_{t_prev}. t_prev < 0 means the
    final step (alpha_prod = final_alpha_cumprod)."""
    ac = schedule.alphas_cumprod
    final_alpha = jnp.asarray(1.0 if set_alpha_to_one else ac[0], jnp.float32)
    a_t = jnp.take(ac, t, axis=0)
    a_prev = jnp.where(t_prev >= 0, jnp.take(ac, jnp.maximum(t_prev, 0), axis=0), final_alpha)

    sample32 = sample.astype(jnp.float32)
    x0 = pred_x0(schedule, model_output, sample32, t)
    # re-derive epsilon from x0 for numerical symmetry with diffusers
    b_t = jnp.sqrt(1.0 - a_t)
    eps = (sample32 - jnp.sqrt(a_t) * x0) / b_t
    prev = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps
    return prev.astype(sample.dtype)


# --------------------------------------------------------------------------
# DPM-Solver++ 2M (multistep, data prediction)
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DpmppTables:
    """Per-step coefficient tables of length n (descending t)."""

    timesteps: jnp.ndarray    # [n] int32 — model-input timesteps
    alpha: jnp.ndarray        # [n+1] sqrt(ā) at each knot (incl. final t=0 knot)
    sigma: jnp.ndarray        # [n+1]
    lam: jnp.ndarray          # [n+1] log(alpha/sigma)


def dpmpp_init(schedule: DiffusionSchedule, timesteps: np.ndarray) -> DpmppTables:
    ac = np.asarray(schedule.alphas_cumprod)
    # knots: the n sampling timesteps plus the terminal knot (ā of t=0 ⇒ sigma→min)
    knot_ac = np.concatenate([ac[np.asarray(timesteps)], ac[:1]])
    alpha = np.sqrt(knot_ac)
    sigma = np.sqrt(1.0 - knot_ac)
    # final knot: diffusers appends sigma=0 in sigma-space; use the t=0 alphas
    lam = np.log(alpha) - np.log(np.maximum(sigma, 1e-10))
    return DpmppTables(
        timesteps=jnp.asarray(np.asarray(timesteps), jnp.int32),
        alpha=jnp.asarray(alpha, jnp.float32),
        sigma=jnp.asarray(sigma, jnp.float32),
        lam=jnp.asarray(lam, jnp.float32),
    )


def dpmpp_step(
    schedule: DiffusionSchedule,
    tables: DpmppTables,
    state: SamplerState,
    model_output: jnp.ndarray,
    i: jnp.ndarray,
) -> SamplerState:
    """One DPM-Solver++ multistep update at step index i (0-based).

    First step uses the 1st-order update; middle steps the 2M midpoint rule.
    The LAST step is 1st-order only for short schedules (< 15 steps) —
    diffusers' ``lower_order_final`` stabilizer has that exact guard
    (DPMSolverMultistepScheduler, diffusers==0.24), so at the reference's 25
    eval steps the final update stays 2nd-order. All σ math in fp32.
    """
    n = tables.timesteps.shape[0]
    sample = state.sample.astype(jnp.float32)
    t = tables.timesteps[i]
    x0 = pred_x0(schedule, model_output, sample, t)

    a_s, s_s, l_s = tables.alpha[i], tables.sigma[i], tables.lam[i]
    a_t, s_t, l_t = tables.alpha[i + 1], tables.sigma[i + 1], tables.lam[i + 1]
    h = l_t - l_s
    ratio = s_t / s_s
    phi = jnp.expm1(-h)  # exp(-h) - 1

    first_order = ratio * sample - a_t * phi * x0

    # second order: needs previous x0 and previous h
    l_s1 = tables.lam[jnp.maximum(i - 1, 0)]
    h_prev = l_s - l_s1
    r0 = h_prev / h
    x0_prev = state.aux.astype(jnp.float32)
    d1 = (x0 - x0_prev) / r0
    second_order = ratio * sample - a_t * phi * (x0 + 0.5 * d1)

    if n < 15:  # diffusers lower_order_final: len(timesteps) < 15 only
        use_first = jnp.logical_or(i == 0, i == n - 1)
    else:
        use_first = i == 0
    prev = jnp.where(use_first, first_order, second_order)
    return SamplerState(sample=prev.astype(state.sample.dtype), aux=x0.astype(state.sample.dtype))


# --------------------------------------------------------------------------
# Generic scan-based sampling loop
# --------------------------------------------------------------------------

def sample_loop(
    schedule: DiffusionSchedule,
    latents: jnp.ndarray,
    timesteps: np.ndarray,
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    sampler: str = "dpmpp",
    eta: float = 0.0,
    model_state=None,
) -> jnp.ndarray:
    """Run the full denoise loop under one lax.scan.

    model_fn(latents, t) → model output (epsilon/v per schedule). CFG and
    conditioning live inside model_fn, so this stays sampler-agnostic.

    model_state: optional carry threaded through the loop — when given,
    model_fn is called as model_fn(latents, t, i, state) → (out, state)
    (step-dependent model behavior, e.g. PAB attention-delta caching).
    """
    ts = np.asarray(timesteps)
    n = len(ts)
    stateful = model_state is not None

    def call_model(sample, t, i, ms):
        if stateful:
            return model_fn(sample, t, i, ms)
        return model_fn(sample, t), ms

    if sampler == "dpmpp":
        tables = dpmpp_init(schedule, ts)

        def body(carry, i):
            state, ms = carry
            t = tables.timesteps[i]
            out, ms = call_model(state.sample, t, i, ms)
            return (dpmpp_step(schedule, tables, state, out, i), ms), None

        init = SamplerState(sample=latents, aux=jnp.zeros_like(latents))
        (state, _ms), _ = jax.lax.scan(body, (init, model_state), jnp.arange(n))
        return state.sample

    if sampler == "ddim":
        ts_arr = jnp.asarray(ts, jnp.int32)
        step_gap = (schedule.num_train_timesteps // n) if n else 0
        t_prev_arr = jnp.asarray(ts - step_gap, jnp.int32)

        def body(carry, i):
            state, ms = carry
            t = ts_arr[i]
            out, ms = call_model(state.sample, t, i, ms)
            prev = ddim_step(schedule, state.sample, out, t, t_prev_arr[i], eta=eta)
            return (SamplerState(sample=prev), ms), None

        (state, _ms), _ = jax.lax.scan(
            body, (SamplerState(sample=latents), model_state), jnp.arange(n))
        return state.sample

    raise ValueError(f"unknown sampler {sampler}")


jax.tree_util.register_pytree_node(
    SamplerState,
    lambda s: ((s.sample, s.aux), None),
    lambda _, xs: SamplerState(sample=xs[0], aux=xs[1]),
)
