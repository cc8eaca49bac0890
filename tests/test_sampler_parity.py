"""Step-for-step sampler parity vs the diffusers==0.24 update rules
(tests/mini_schedulers.py oracle — VERDICT r3 next #5).

The reference evals through DPMSolverMultistepScheduler
(/root/reference/train.py:806-808) and samples SVD through
EulerDiscreteScheduler; checkpoint-parity sampling requires our scan-based
samplers to reproduce those trajectories exactly, not just recover oracles
in closed form. Each test drives BOTH implementations with the same
deterministic pseudo-model and pins the full trajectory at fp32 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from animate_anything_tpu.diffusion import make_schedule
from animate_anything_tpu.diffusion.euler_edm import (euler_step,
                                                      make_euler_schedule,
                                                      scale_model_input)
from animate_anything_tpu.diffusion.samplers import (dpmpp_timesteps,
                                                     sample_loop)
from animate_anything_tpu.diffusion.schedule import add_noise, get_velocity

import mini_schedulers as oracle  # noqa: E402  (tests/ dir on sys.path under pytest)


def _model_eps(x, t):
    """Deterministic pseudo-model: identical numpy/jax formulas (elementwise
    only, so CPU jax and numpy agree to ulps)."""
    tt = t / 1000.0
    if isinstance(x, np.ndarray):
        return np.tanh(0.3 * x) + 0.01 * np.cos(7.0 * tt)
    return jnp.tanh(0.3 * x) + 0.01 * jnp.cos(7.0 * tt)


def test_add_noise_and_velocity_match_ddpm():
    sched = make_schedule()
    ddpm = oracle.DDPMScheduler()
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((2, 3, 8, 8, 4)).astype(np.float32)
    noise = rng.standard_normal(x0.shape).astype(np.float32)
    t = np.array([17, 943])
    np.testing.assert_allclose(
        np.asarray(add_noise(sched, jnp.asarray(x0), jnp.asarray(noise),
                             jnp.asarray(t))),
        ddpm.add_noise(x0, noise, t), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(get_velocity(sched, jnp.asarray(x0), jnp.asarray(noise),
                                jnp.asarray(t))),
        ddpm.get_velocity(x0, noise, t), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("steps", [10, 25])
@pytest.mark.parametrize("prediction_type", ["epsilon", "v_prediction"])
def test_dpmpp_trajectory_matches_diffusers(steps, prediction_type):
    """Full 10/25-step trajectories pinned against the 0.24 DPM-Solver++ 2M
    port — covers the lower_order_final boundary (first-order final step at
    10 steps, second-order at 25) and both prediction types."""
    sched = make_schedule(prediction_type=prediction_type)
    ts = dpmpp_timesteps(1000, steps)

    dp = oracle.DPMSolverMultistepScheduler(prediction_type=prediction_type)
    dp.set_timesteps(steps)
    np.testing.assert_array_equal(np.asarray(ts), dp.timesteps)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 4, 8, 8, 4)).astype(np.float32)

    # oracle loop (numpy fp32)
    x_ref = x.astype(np.float32)
    for t in dp.timesteps:
        out = _model_eps(x_ref, float(t)).astype(np.float32)
        x_ref = dp.step(out, t, x_ref).astype(np.float32)

    # ours: one lax.scan
    x_ours = sample_loop(sched, jnp.asarray(x), ts,
                         lambda s, t: _model_eps(s, t.astype(jnp.float32)),
                         sampler="dpmpp")
    np.testing.assert_allclose(np.asarray(x_ours), x_ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("steps", [10, 25])
def test_euler_svd_trajectory_matches_diffusers(steps):
    """SVD Euler sampling (karras sigmas in [0.002, 700], continuous t,
    v-prediction) pinned to the 0.24 EulerDiscreteScheduler port —
    sigma grid, continuous timesteps, init scaling, and every step."""
    es = make_euler_schedule(steps)
    eu = oracle.EulerDiscreteScheduler()
    eu.set_timesteps(steps)
    np.testing.assert_allclose(np.asarray(es.sigmas), eu.sigmas,
                               rtol=1e-6, atol=0)
    np.testing.assert_allclose(np.asarray(es.timesteps), eu.timesteps,
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(float(es.init_noise_sigma),
                               eu.init_noise_sigma, rtol=1e-6)

    rng = np.random.default_rng(2)
    x = (rng.standard_normal((1, 3, 8, 8, 4)).astype(np.float32)
         * eu.init_noise_sigma)

    x_ref = x.copy()
    for i, t in enumerate(eu.timesteps):
        scaled = eu.scale_model_input(x_ref)
        out = _model_eps(scaled, float(t)).astype(np.float32)
        x_ref = eu.step(out, t, x_ref).astype(np.float32)

    x_ours = jnp.asarray(x)
    for i in range(steps):
        sig, sig_next = es.sigmas[i], es.sigmas[i + 1]
        scaled = scale_model_input(x_ours, sig)
        out = _model_eps(scaled, es.timesteps[i])
        x_ours = euler_step(x_ours, out, sig, sig_next)
    np.testing.assert_allclose(np.asarray(x_ours), x_ref, rtol=2e-5, atol=2e-5)
