import jax
import jax.numpy as jnp
import numpy as np
import pytest

from animate_anything_tpu.diffusion import (
    add_noise,
    ddim_timesteps,
    ddpm_forward_mask,
    ddpm_forward_timesteps,
    dpmpp_init,
    dpmpp_step,
    edm_precondition,
    edm_sample_sigmas,
    euler_step,
    get_velocity,
    make_euler_schedule,
    make_schedule,
    sample_loop,
    SamplerState,
)
from animate_anything_tpu.diffusion.samplers import dpmpp_timesteps
from animate_anything_tpu.diffusion.schedule import pred_epsilon, pred_x0, sample_noise


@pytest.fixture(scope="module")
def sched():
    return make_schedule()


def test_schedule_tables(sched):
    assert sched.betas.shape == (1000,)
    ac = np.asarray(sched.alphas_cumprod)
    assert np.all(np.diff(ac) < 0)
    assert ac[0] == pytest.approx(1 - 0.00085, rel=1e-5)


def test_zero_snr_rescale_terminal():
    s = make_schedule(rescale_betas_zero_snr=True)
    assert float(s.alphas_cumprod[-1]) == pytest.approx(0.0, abs=1e-10)
    # first alpha preserved
    s0 = make_schedule()
    assert float(s.alphas_cumprod[0]) == pytest.approx(float(s0.alphas_cumprod[0]), rel=1e-5)


def test_add_noise_formula(sched):
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (2, 3, 4, 4, 4))
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([10, 500])
    xt = add_noise(sched, x0, eps, t)
    ac = sched.alphas_cumprod
    for i, ti in enumerate([10, 500]):
        expected = jnp.sqrt(ac[ti]) * x0[i] + jnp.sqrt(1 - ac[ti]) * eps[i]
        np.testing.assert_allclose(np.asarray(xt[i]), np.asarray(expected), rtol=1e-5)


def test_pred_x0_inverts_add_noise(sched):
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4))
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([100, 900])
    xt = add_noise(sched, x0, eps, t)
    np.testing.assert_allclose(np.asarray(pred_x0(sched, eps, xt, t)), np.asarray(x0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(pred_epsilon(sched, eps, xt, t)), np.asarray(eps), atol=1e-5)


def test_velocity_consistency(sched):
    s = make_schedule(prediction_type="v_prediction")
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4))
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([100, 900])
    xt = add_noise(s, x0, eps, t)
    v = get_velocity(s, x0, eps, t)
    np.testing.assert_allclose(np.asarray(pred_x0(s, v, xt, t)), np.asarray(x0), atol=1e-4)


def test_timestep_grids():
    ts = ddim_timesteps(1000, 25)
    assert len(ts) == 25 and ts[0] == 961 and ts[-1] == 1
    ts2 = dpmpp_timesteps(1000, 10)
    assert len(ts2) == 10 and ts2[0] == 999
    assert np.all(np.diff(ts2) < 0)


def test_ddpm_forward_timesteps(sched):
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 8, 8, 4))
    ts = jnp.asarray(ddim_timesteps(1000, 10))
    out = ddpm_forward_timesteps(sched, img, 8, ts, jax.random.PRNGKey(1))
    assert out.shape == (1, 8, 8, 8, 4)
    # early timestep grid (truncated) keeps more signal
    ts_trunc = ts[5:]
    out2 = ddpm_forward_timesteps(sched, img, 8, ts_trunc, jax.random.PRNGKey(1))
    corr_full = np.corrcoef(np.asarray(out).ravel(), np.asarray(jnp.repeat(img, 8, 1)).ravel())[0, 1]
    corr_trunc = np.corrcoef(np.asarray(out2).ravel(), np.asarray(jnp.repeat(img, 8, 1)).ravel())[0, 1]
    assert corr_trunc > corr_full


def test_ddpm_forward_mask_freezes_unmasked(sched):
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 8, 8, 4))
    mask = jnp.zeros((1, 1, 8, 8, 1)).at[:, :, :4].set(1.0)
    ts = jnp.asarray(ddim_timesteps(1000, 10))
    out = ddpm_forward_mask(sched, img, mask, 4, ts, jax.random.PRNGKey(1))
    frozen = np.asarray(out[0, 2, 4:])
    np.testing.assert_allclose(frozen, np.asarray(img[0, 0, 4:]), atol=1e-6)


def test_offset_noise_shape():
    n = sample_noise(jax.random.PRNGKey(0), (2, 4, 8, 8, 4), offset_noise_strength=0.1)
    assert n.shape == (2, 4, 8, 8, 4)


def _oracle_eps(sched, x0):
    """Perfect epsilon model for a fixed x0."""
    ac = sched.alphas_cumprod

    def model(x, t):
        a = jnp.take(ac, t)
        return (x - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)

    return model


def test_ddim_oracle_recovers_x0(sched):
    x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8, 4))
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    ts = ddim_timesteps(1000, 25)
    xt = add_noise(sched, x0, eps, jnp.array([int(ts[0])]))
    out = sample_loop(sched, xt, ts, _oracle_eps(sched, x0), sampler="ddim")
    # with set_alpha_to_one=False the terminal state keeps sqrt(1-ā₀)·ε ≈ 0.03·ε
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=0.2)
    assert float(jnp.abs(out - x0).mean()) < 0.03


def test_dpmpp_oracle_recovers_x0(sched):
    x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8, 4))
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    ts = dpmpp_timesteps(1000, 10)
    xt = add_noise(sched, x0, eps, jnp.array([int(ts[0])]))
    out = sample_loop(sched, xt, ts, _oracle_eps(sched, x0), sampler="dpmpp")
    # terminal knot keeps sqrt(1-ā₀)·ε ≈ 0.03·ε of noise (exact solver residual)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=0.2)
    assert float(jnp.abs(out - x0).mean()) < 0.03


def test_dpmpp_step_is_scan_safe(sched):
    ts = dpmpp_timesteps(1000, 5)
    tables = dpmpp_init(sched, ts)
    x = jnp.ones((1, 2, 2))

    @jax.jit
    def one(state, i):
        return dpmpp_step(sched, tables, state, jnp.zeros_like(x), i)

    st = SamplerState(sample=x, aux=jnp.zeros_like(x))
    st = one(st, jnp.array(0))
    assert st.sample.shape == x.shape


def test_euler_oracle_recovers_x0():
    es = make_euler_schedule(25)
    assert es.sigmas.shape == (26,)
    assert float(es.sigmas[0]) == pytest.approx(700.0, rel=1e-4)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4))
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    x = x0 + es.sigmas[0] * eps

    def oracle(sample, sigma):
        # invert the EDM combine so x̂0 == x0
        return (x0 - sample / (sigma**2 + 1.0)) * (-jnp.sqrt(sigma**2 + 1.0) / sigma)

    for i in range(25):
        x = euler_step(x, oracle(x, es.sigmas[i]), es.sigmas[i], es.sigmas[i + 1])
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-3)


def test_edm_precondition_formulas():
    sig = edm_sample_sigmas(jax.random.PRNGKey(0), 4)
    assert sig.shape == (4, 1, 1, 1, 1)
    c = edm_precondition(sig)
    np.testing.assert_allclose(np.asarray(c.c_skip), np.asarray(c.c_in**2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c.c_out), np.asarray(-sig * c.c_in), rtol=1e-6)
    assert c.c_noise.shape == (4,)
    np.testing.assert_allclose(
        np.asarray(c.c_noise), np.asarray(jnp.log(sig).reshape(4) / 4), rtol=1e-6
    )
