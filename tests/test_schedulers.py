import jax
import jax.numpy as jnp
import numpy as np

from diffusion_pruning_tpu.schedulers import DDIMSampler, DiffusionSchedule, PNDMSampler


def test_schedule_alphas_monotone():
    s = DiffusionSchedule()
    ac = np.asarray(s.alphas_cumprod)
    assert ac.shape == (1000,)
    assert np.all(np.diff(ac) < 0)
    assert ac[0] > 0.999 and ac[-1] < 0.01


def test_add_noise_and_velocity_consistency():
    s = DiffusionSchedule()
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2, 4, 4, 3))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.asarray([100, 700])
    xt = s.add_noise(x0, noise, t)
    v = s.get_velocity(x0, noise, t)
    # invert: eps/x0 recovered from v and xt
    eps, x0_rec = s.to_epsilon_and_x0(v, xt, t)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(eps), np.asarray(noise), atol=1e-4)


def test_ddim_timesteps_leading_spacing():
    s = DDIMSampler(DiffusionSchedule())
    np.testing.assert_array_equal(s.timesteps(5), [801, 601, 401, 201, 1])


def test_pndm_timesteps_duplicate_second():
    s = PNDMSampler(DiffusionSchedule())
    np.testing.assert_array_equal(s.timesteps(4), [751, 501, 501, 251, 1])


def _perfect_model(schedule, x_target):
    """Oracle returning the exact v (or ε) for a known x₀."""
    ac = schedule.alphas_cumprod

    def fn(x, t):
        a = ac[t].reshape(-1, 1, 1, 1)
        sa, so = a ** 0.5, (1 - a) ** 0.5
        eps = (x - sa * x_target) / so
        if schedule.prediction_type == "v_prediction":
            return sa * eps - so * x_target
        return eps

    return fn


def _exact_final(schedule, x_init, target, n_steps):
    """With a perfect model the DDIM trajectory is exact: the implied ε stays
    constant, so the final sample is √ᾱ₀·x₀ + √(1-ᾱ₀)·ε with ε implied by
    the initial latent at the first timestep."""
    ac = np.asarray(schedule.alphas_cumprod)
    t0 = 1000 // n_steps * (n_steps - 1) + 1
    a = ac[t0]
    eps = (np.asarray(x_init) - np.sqrt(a) * np.asarray(target)) / np.sqrt(1 - a)
    return np.sqrt(ac[0]) * np.asarray(target) + np.sqrt(1 - ac[0]) * eps


def test_ddim_exact_with_perfect_model():
    schedule = DiffusionSchedule()
    target = jnp.full((1, 4, 4, 3), 0.7)
    fn = _perfect_model(schedule, target)
    x = jax.random.normal(jax.random.PRNGKey(0), target.shape)
    out = DDIMSampler(schedule).sample(fn, x, num_inference_steps=10)
    want = _exact_final(schedule, x, target, 10)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4)


def test_pndm_converges_with_perfect_model():
    # the PLMS transfer is also exact for a constant implied ε
    schedule = DiffusionSchedule()
    target = jnp.full((1, 4, 4, 3), -0.3)
    fn = _perfect_model(schedule, target)
    x = jax.random.normal(jax.random.PRNGKey(1), target.shape)
    out = PNDMSampler(schedule).sample(fn, x, num_inference_steps=10)
    want = _exact_final(schedule, x, target, 10)
    np.testing.assert_allclose(np.asarray(out), want, atol=0.02)


def test_pndm_epsilon_prediction_also_converges():
    schedule = DiffusionSchedule(prediction_type="epsilon")
    target = jnp.full((1, 4, 4, 3), 0.5)
    fn = _perfect_model(schedule, target)
    x = jax.random.normal(jax.random.PRNGKey(2), target.shape)
    out = PNDMSampler(schedule).sample(fn, x, num_inference_steps=10)
    want = _exact_final(schedule, x, target, 10)
    np.testing.assert_allclose(np.asarray(out), want, atol=0.02)
