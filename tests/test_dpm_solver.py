"""Analytic tests for the DPM-Solver++(2M) sampler.

When the model's x0 prediction depends only on the noise level (not on x),
the probability-flow ODE is linear with the closed-form solution

    x_t = (sigma_t/sigma_s) x_s + sigma_t * int_{lam_s}^{lam_t} e^l x0(l) dl

so the solver can be checked against exact math:
  - constant x0: every DPM++ order integrates it exactly (one step suffices);
  - lam-varying x0: the 2M scheme must show its 2nd-order advantage over
    DDIM (which is exactly the order-1 case of the same scheme) at equal
    step counts, and must converge as steps increase.
"""

import numpy as np
import jax
import jax.numpy as jnp

from reface_tpu.core import DDIMTables, DiffusionSchedule
from reface_tpu.diffusion import ddim_sample, dpm_solver_sample


def _lam(a):
    return 0.5 * (np.log(a) - np.log1p(-a))


def _zeros_rest(shape):
    return jnp.zeros(shape[:3] + (4,)), jnp.zeros(shape[:3] + (1,))


def test_dpm_constant_x0_is_exact():
    """x0 constant: the update is the exact linear-ODE solution, so the
    chain must land on alpha_0 x0* + sigma_0 c with c the preserved noise
    direction, at ANY step count."""
    sched = DiffusionSchedule.create()
    acp = jnp.asarray(np.asarray(sched.alphas_cumprod, np.float64), jnp.float32)
    rng = np.random.default_rng(0)
    shape = (2, 8, 8, 4)
    x0_star = jnp.asarray(rng.normal(size=shape), jnp.float32)
    c_dir = jnp.asarray(rng.normal(size=shape), jnp.float32)

    def model_fn(x9, t, c):
        a = acp[t][:, None, None, None]
        x = x9[..., :4]
        return (x - jnp.sqrt(a) * x0_star) / jnp.sqrt(1.0 - a)

    for S in (3, 10):
        tabs = DDIMTables.create(sched, S)
        aT = float(tabs.alphas[-1])
        x_T = np.sqrt(aT) * x0_star + np.sqrt(1 - aT) * c_dir
        z_inp, mask = _zeros_rest(shape)
        out = dpm_solver_sample(
            model_fn, jnp.asarray(x_T), jnp.zeros((2, 1, 8)), None,
            z_inp, mask, tabs, cfg_scale=1.0,
        )
        a0 = float(tabs.alphas_prev[0])
        expect = np.sqrt(a0) * np.asarray(x0_star) + np.sqrt(1 - a0) * np.asarray(
            c_dir
        )
        np.testing.assert_allclose(np.asarray(out), expect, atol=2e-3)


def _lam_varying_problem(S, method="lam_uniform"):
    """x0(lam) = tanh(lam) * v: smooth, lam-dependent, x-independent.

    Order comparisons use the lam_uniform grid — on the t-uniform subset the
    terminal lam-jump (t=101 -> 1 spans lam 1.06 -> 3.19) dominates the
    error for BOTH solvers and masks the multistep order advantage (that
    grid sensitivity is exactly why schedules.make_ddim_timesteps grew the
    lam_uniform method; see its docstring).
    """
    sched = DiffusionSchedule.create()
    acp64 = np.asarray(sched.alphas_cumprod, np.float64)
    acp = jnp.asarray(acp64, jnp.float32)
    rng = np.random.default_rng(1)
    shape = (1, 8, 8, 4)
    v = rng.normal(size=shape)

    def model_fn(x9, t, c):
        a = acp[t][:, None, None, None]
        lam = 0.5 * (jnp.log(a) - jnp.log1p(-a))
        x0 = jnp.tanh(lam) * jnp.asarray(v, jnp.float32)
        return (x9[..., :4] - jnp.sqrt(a) * x0) / jnp.sqrt(1.0 - a)

    tabs = DDIMTables.create(sched, S, method=method)
    a_start = float(np.asarray(tabs.alphas)[-1])
    a_end = float(np.asarray(tabs.alphas_prev)[0])
    x_T = rng.normal(size=shape)

    # closed-form solution by dense quadrature over lam
    lam_grid = np.linspace(_lam(a_start), _lam(a_end), 200001)
    integral = np.trapz(np.exp(lam_grid) * np.tanh(lam_grid), lam_grid)
    s_start, s_end = np.sqrt(1 - a_start), np.sqrt(1 - a_end)
    truth = (s_end / s_start) * x_T + s_end * integral * v
    return model_fn, tabs, jnp.asarray(x_T, jnp.float32), truth, shape


def _run(sampler, model_fn, tabs, x_T, shape):
    z_inp, mask = _zeros_rest(shape)
    out = sampler(
        model_fn, x_T, jnp.zeros((1, 1, 8)), None, z_inp, mask, tabs,
        cfg_scale=1.0,
    )
    return np.asarray(out, np.float64)


def test_dpm_second_order_beats_ddim_at_equal_steps():
    model_fn, tabs, x_T, truth, shape = _lam_varying_problem(S=20)
    err_ddim = np.abs(_run(ddim_sample, model_fn, tabs, x_T, shape) - truth).max()
    err_dpm = np.abs(
        _run(dpm_solver_sample, model_fn, tabs, x_T, shape) - truth
    ).max()
    # 2nd vs 1st order on the same subset (measured: 0.0079 vs 0.039)
    assert err_dpm < 0.5 * err_ddim, (err_dpm, err_ddim)


def test_dpm_converges_at_second_order():
    errs = {}
    for S in (10, 20):
        model_fn, tabs, x_T, truth, shape = _lam_varying_problem(S)
        errs[S] = np.abs(
            _run(dpm_solver_sample, model_fn, tabs, x_T, shape) - truth
        ).max()
    # 2nd order: doubling steps should ~quarter the error (measured ratio
    # 0.19; 1st order would sit near 0.5)
    assert errs[20] < 0.35 * errs[10], errs


def test_lam_uniform_grid():
    """lam_uniform subsets: ascending unique t in range, ~uniform lam."""
    from reface_tpu.core import make_ddim_timesteps

    sched = DiffusionSchedule.create()
    acp = np.asarray(sched.alphas_cumprod, np.float64)
    ts = make_ddim_timesteps(10, 1000, "lam_uniform", alphas_cumprod=acp)
    assert ts[0] >= 1 and ts[-1] <= 999
    assert (np.diff(ts) > 0).all() and len(ts) == 10
    lam = 0.5 * (np.log(acp[ts]) - np.log1p(-acp[ts]))
    d = np.diff(lam)
    # each lam step within 20% of the mean spacing (index quantization)
    np.testing.assert_allclose(d, d.mean(), rtol=0.2)
    # the tables build end-to-end through DDIMTables.create
    tabs = DDIMTables.create(sched, 10, method="lam_uniform")
    assert tabs.num_steps == 10


def test_dpm_cfg_plumbing():
    """uncond == cond context must make CFG a no-op at any scale, and
    cfg_steps=S must equal the default (CFG-every-step) path."""
    sched = DiffusionSchedule.create()
    tabs = DDIMTables.create(sched, 5)
    rng = np.random.default_rng(2)
    shape = (2, 8, 8, 4)
    e = jnp.asarray(rng.normal(size=shape), jnp.float32)
    x_T = jnp.asarray(rng.normal(size=shape), jnp.float32)

    def model_fn(x9, t, ctx):
        base = jnp.tile(e, (x9.shape[0] // e.shape[0], 1, 1, 1))
        return base + 0.01 * jnp.mean(ctx)

    z_inp, mask = _zeros_rest(shape)
    ctx = jnp.ones((2, 1, 8))
    plain = dpm_solver_sample(
        model_fn, x_T, ctx, None, z_inp, mask, tabs, cfg_scale=1.0
    )
    guided_same = dpm_solver_sample(
        model_fn, x_T, ctx, ctx, z_inp, mask, tabs, cfg_scale=3.0
    )
    np.testing.assert_allclose(
        np.asarray(plain), np.asarray(guided_same), atol=1e-5
    )

    uc = jnp.zeros((2, 1, 8))
    full = dpm_solver_sample(
        model_fn, x_T, ctx, uc, z_inp, mask, tabs, cfg_scale=3.0
    )
    same = dpm_solver_sample(
        model_fn, x_T, ctx, uc, z_inp, mask, tabs, cfg_scale=3.0,
        cfg_steps=tabs.num_steps,
    )
    np.testing.assert_array_equal(np.asarray(full), np.asarray(same))
    part = dpm_solver_sample(
        model_fn, x_T, ctx, uc, z_inp, mask, tabs, cfg_scale=3.0, cfg_steps=2
    )
    assert np.abs(np.asarray(part) - np.asarray(full)).max() > 0


def test_swap_dpm_sampler_end_to_end_tiny():
    from reface_tpu.pipelines import FaceSwapper, tiny_swap_config

    cfg = tiny_swap_config(image_size=64, ddim_steps=3)
    cfg = cfg.__class__(**{**cfg.__dict__, "sampler": "dpm"})
    params = FaceSwapper.init_params(cfg, jax.random.key(0))
    swapper = FaceSwapper(cfg, params)
    k = jax.random.split(jax.random.key(7), 5)
    out = swapper.swap(
        target_image=jax.random.uniform(k[0], (1, 64, 64, 3), minval=-1, maxval=1),
        inpaint_image=jax.random.uniform(k[1], (1, 64, 64, 3), minval=-1, maxval=1),
        inpaint_mask=(jax.random.uniform(k[2], (1, 64, 64, 1)) > 0.5).astype(
            jnp.float32
        ),
        ref_clip224=jax.random.normal(k[3], (1, 224, 224, 3)),
        landmarks=jax.random.uniform(k[4], (1, 136)) * 64,
        key=jax.random.key(1),
    )
    assert out.shape == (1, 64, 64, 3)
    assert bool(jnp.isfinite(out).all())
