"""DPM-Solver++(2M) correctness contract (schedulers/dpm.py).

Three pinned properties replace trajectory goldens (there is no reference
implementation to golden against — the reference generates with DDIM/PNDM
only, trainer.py:700-701, scripts/metrics/generate_fid_images.py:104):

1. For a model whose x0 prediction is CONSTANT, both the first-order and the
   2M update integrate the probability-flow ODE exactly, and the update is
   algebraically identical to DDIM's exact transfer — the final sample
   matches `_exact_final` to machine precision.
2. For a SMOOTH time-varying x0 prediction, the 2M global error decays one
   order faster than DDIM's (≈O(h²) vs O(h)), and is strictly smaller at
   equal step counts — the property that buys equal quality at ~half the
   steps.
3. Timesteps use exactly DDIM's leading spacing with steps_offset=1 so the
   routed pipeline can switch samplers without changing step semantics.
"""
import jax
import jax.numpy as jnp
import numpy as np

from diffusion_pruning_tpu.schedulers import (
    DDIMSampler,
    DiffusionSchedule,
    DPMSolverPPSampler,
)
from test_schedulers import _exact_final, _perfect_model


def test_dpm_timesteps_match_ddim_leading_spacing():
    sched = DiffusionSchedule()
    dpm = DPMSolverPPSampler(sched)
    np.testing.assert_array_equal(dpm.timesteps(5), [801, 601, 401, 201, 1])
    np.testing.assert_array_equal(dpm.timesteps(5),
                                  DDIMSampler(sched).timesteps(5))


def test_dpm_exact_with_perfect_model_v_prediction():
    schedule = DiffusionSchedule()
    target = jnp.full((1, 4, 4, 3), 0.7)
    fn = _perfect_model(schedule, target)
    x = jax.random.normal(jax.random.PRNGKey(0), target.shape)
    out = DPMSolverPPSampler(schedule).sample(fn, x, num_inference_steps=10)
    want = _exact_final(schedule, x, target, 10)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4)


def test_dpm_exact_with_perfect_model_epsilon():
    schedule = DiffusionSchedule(prediction_type="epsilon")
    target = jnp.full((1, 4, 4, 3), -0.3)
    fn = _perfect_model(schedule, target)
    x = jax.random.normal(jax.random.PRNGKey(1), target.shape)
    out = DPMSolverPPSampler(schedule).sample(fn, x, num_inference_steps=10)
    want = _exact_final(schedule, x, target, 10)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4)


_A, _B = 0.3, 0.8


def _lambda_smooth_model(schedule):
    """x0(λ) = A + B·sigmoid(λ): smooth and bounded as a function of the
    half-log-SNR λ the solver integrates over (a model smooth in *t* is not
    smooth in λ near the trajectory endpoints, where dλ/dt blows up — that
    regime is adversarial for ANY λ-space multistep extrapolation and says
    nothing about solver order). The ODE solution is closed-form:
    ∫ e^λ sigmoid(λ) dλ = u − log(1+u) with u = e^λ."""
    ac = schedule.alphas_cumprod

    def fn(x, t):
        a = ac[t].reshape(-1, 1, 1, 1)
        lam = 0.5 * (jnp.log(a) - jnp.log1p(-a))
        x0 = _A + _B * jax.nn.sigmoid(lam)
        sa, so = a ** 0.5, (1 - a) ** 0.5
        eps = (x - sa * x0) / so
        if schedule.prediction_type == "v_prediction":
            return sa * eps - so * x0
        return eps

    return fn


def _exact_ode_final(schedule, x, t_start, final_ac):
    """Exact probability-flow transfer for the λ-smooth model from λ(t_start)
    to λ(final_ac): x_t = (σ_t/σ_s)x + σ_t[A(u_t−u_s) + B(u−log(1+u))|_s^t]."""
    ac = np.asarray(schedule.alphas_cumprod)
    a_s, a_t = float(ac[t_start]), float(final_ac)
    lam = lambda a: 0.5 * (np.log(a) - np.log1p(-a))
    u_s, u_t = np.exp(lam(a_s)), np.exp(lam(a_t))
    sig_s, sig_t = np.sqrt(1 - a_s), np.sqrt(1 - a_t)
    integral = (_A * (u_t - u_s)
                + _B * ((u_t - np.log1p(u_t)) - (u_s - np.log1p(u_s))))
    return (sig_t / sig_s) * np.asarray(x) + sig_t * integral


def _errors(schedule, fn, x, ns):
    ac = schedule.alphas_cumprod
    out = {}
    for n in ns:
        dpm = DPMSolverPPSampler(schedule)
        # leading spacing starts at T − T//n + 1, so each n is its own IVP;
        # compare each sampler to the exact solution of ITS OWN interval.
        gold = _exact_ode_final(schedule, x, int(dpm.timesteps(n)[0]), ac[0])
        e_dpm = float(np.max(np.abs(np.asarray(
            dpm.sample(fn, x, num_inference_steps=n)) - gold)))
        e_ddim = float(np.max(np.abs(np.asarray(
            DDIMSampler(schedule).sample(fn, x, num_inference_steps=n)) - gold)))
        out[n] = (e_dpm, e_ddim)
    return out


def test_dpm_second_order_beats_ddim_on_smooth_problem():
    schedule = DiffusionSchedule()
    fn = _lambda_smooth_model(schedule)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 3))
    errs = _errors(schedule, fn, x, (5, 10, 20, 40))
    # measured margins are 3.3-5.3×; 2× keeps the test schedule-robust
    for n, (e_dpm, e_ddim) in errs.items():
        assert e_dpm < 0.5 * e_ddim, (n, e_dpm, e_ddim)
    # and the error still shrinks with step count
    assert errs[40][0] < errs[10][0] < errs[5][0], errs


def test_dpm_half_steps_matches_ddim_quality():
    """The serving claim: DPM++ at n/2 steps is at least as accurate as
    DDIM at n steps (measured: 0.026 vs 0.054 at 10/20, 0.016 vs 0.032
    at 20/40)."""
    schedule = DiffusionSchedule()
    fn = _lambda_smooth_model(schedule)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 4, 3))
    errs = _errors(schedule, fn, x, (10, 20, 40))
    assert errs[10][0] <= errs[20][1], errs
    assert errs[20][0] <= errs[40][1], errs


def test_pipeline_generates_with_dpm():
    """sampler='dpm++' plugs into the routed pipeline's fixed-arch loop
    (same timestep plan as DDIM, so only the update rule changes)."""
    from test_pipeline import build_tiny_pipeline

    p = build_tiny_pipeline()
    p.sampler = "dpm++"
    assert isinstance(p._sampler(), DPMSolverPPSampler)
    cfg = p.unet.cfg
    ids = jnp.zeros((1, cfg.max_text_len), jnp.int32)
    imgs = p.generate_samples(ids, ids, jax.random.PRNGKey(1),
                              arch=None, num_inference_steps=4)
    arr = np.asarray(imgs)
    vs = p.vae.cfg.spatial_scale
    assert arr.shape == (1, cfg.sample_size * vs, cfg.sample_size * vs, 3)
    assert np.all(np.isfinite(arr))
