"""Golden-value tests for schedules, derived from the published formulas
(DDIM paper eq. 16 / SD linear schedule), not from reference code output."""

import math

import numpy as np
import jax.numpy as jnp

from reface_tpu.core import (
    DDIMTables,
    DiffusionSchedule,
    make_beta_schedule,
    make_ddim_timesteps,
    timestep_embedding,
)


def test_linear_betas_endpoints():
    betas = make_beta_schedule("linear", 1000, 0.00085, 0.0120)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-12)
    np.testing.assert_allclose(betas[-1], 0.0120, rtol=1e-12)
    # sqrt-space linearity: sqrt(betas) must be exactly linear
    s = np.sqrt(betas)
    np.testing.assert_allclose(np.diff(s), np.diff(s)[0], rtol=1e-9)


def test_alphas_cumprod_monotone_and_range():
    sched = DiffusionSchedule.create()
    acp = np.asarray(sched.alphas_cumprod)
    assert np.all(np.diff(acp) < 0)
    assert 0 < acp[-1] < acp[0] < 1
    # closed form check at t=0: acp[0] = 1 - beta[0]
    np.testing.assert_allclose(acp[0], 1 - 0.00085, rtol=1e-6)


def test_ddim_timesteps_uniform_offset():
    ts = make_ddim_timesteps(50, 1000)
    assert ts.shape == (50,)
    assert ts[0] == 1 and ts[-1] == 981  # +1 offset over range(0,1000,20)
    assert np.all(np.diff(ts) == 20)


def test_ddim_tables_eta0_sigma_zero():
    sched = DiffusionSchedule.create()
    tabs = DDIMTables.create(sched, 50, eta=0.0)
    np.testing.assert_array_equal(np.asarray(tabs.sigmas), 0.0)
    # alphas_prev[0] is acp[0]; alphas_prev[i] = alphas[i-1]
    a = np.asarray(tabs.alphas)
    ap = np.asarray(tabs.alphas_prev)
    np.testing.assert_allclose(ap[1:], a[:-1], rtol=1e-7)
    acp = np.asarray(sched.alphas_cumprod)
    np.testing.assert_allclose(ap[0], acp[0], rtol=1e-7)


def test_ddim_sigma_formula_eta1():
    sched = DiffusionSchedule.create()
    tabs = DDIMTables.create(sched, 10, eta=1.0)
    a = np.asarray(tabs.alphas, np.float64)
    ap = np.asarray(tabs.alphas_prev, np.float64)
    expect = np.sqrt((1 - ap) / (1 - a) * (1 - a / ap))
    np.testing.assert_allclose(np.asarray(tabs.sigmas), expect, rtol=1e-5)


def test_q_sample_identity_at_zero_noise():
    sched = DiffusionSchedule.create()
    x0 = jnp.ones((2, 4, 4, 4))
    t = jnp.array([0, 999])
    out = sched.q_sample(x0, t, jnp.zeros_like(x0))
    acp = np.asarray(sched.alphas_cumprod)
    np.testing.assert_allclose(out[0], math.sqrt(acp[0]), rtol=1e-6)
    np.testing.assert_allclose(out[1], math.sqrt(acp[999]), rtol=1e-6)


def test_predict_x0_inverts_q_sample():
    sched = DiffusionSchedule.create()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    eps = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    t = jnp.array([17, 500])
    xt = sched.q_sample(x0, t, eps)
    rec = sched.predict_x0_from_eps(xt, t, eps)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), atol=2e-4)


def test_timestep_embedding_values():
    # dim=4: freqs = exp(-ln(1e4) * [0,1]/2) = [1, 1e-2]
    emb = np.asarray(timestep_embedding(jnp.array([0.0, 3.0]), 4))
    assert emb.shape == (2, 4)
    np.testing.assert_allclose(emb[0], [1, 1, 0, 0], atol=1e-6)
    expect = [math.cos(3), math.cos(0.03), math.sin(3), math.sin(0.03)]
    np.testing.assert_allclose(emb[1], expect, rtol=1e-5)


def test_timestep_embedding_odd_dim_pads():
    emb = np.asarray(timestep_embedding(jnp.array([1.0]), 5))
    assert emb.shape == (1, 5)
    assert emb[0, -1] == 0.0


def test_lam_uniform_exact_step_counts():
    """ADVICE r3 (medium): the dense-lam regions must not collapse the
    requested step count (plain argmin+unique returned 49 for S=50, 94 for
    S=100 on the SD schedule); the greedy nearest-unused assignment must
    return exactly S unique ascending indices in [1, 999]."""
    sched = DiffusionSchedule.create()
    acp = np.asarray(sched.alphas_cumprod, np.float64)
    for S in (10, 20, 50, 100, 250):
        ts = make_ddim_timesteps(S, 1000, "lam_uniform", alphas_cumprod=acp)
        assert len(ts) == S, (S, len(ts))
        assert len(np.unique(ts)) == S
        assert (np.diff(ts) > 0).all()
        assert ts[0] >= 1 and ts[-1] <= 999
