"""Analytic tests for the DDIM/PLMS scan samplers.

Key identity: with a model that returns the *true* eps used to noise a known
x0, each DDIM step maps sqrt(a_t) x0 + sqrt(1-a_t) e exactly to
sqrt(a_prev) x0 + sqrt(1-a_prev) e, so the chain must recover x0 (up to the
final sqrt(acp[1]) ~ 1 factor).
"""

import numpy as np
import jax
import jax.numpy as jnp

from reface_tpu.core import DDIMTables, DiffusionSchedule
from reface_tpu.diffusion import cfg_eps, ddim_sample, ddim_step, plms_sample


def _setup(S=10, shape=(2, 8, 8, 4)):
    sched = DiffusionSchedule.create()
    tabs = DDIMTables.create(sched, S)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=shape), jnp.float32)
    e = jnp.asarray(rng.normal(size=shape), jnp.float32)
    return sched, tabs, x0, e


def test_ddim_chain_recovers_x0():
    sched, tabs, x0, e = _setup()
    aT = tabs.alphas[-1]
    x_T = jnp.sqrt(aT) * x0 + jnp.sqrt(1 - aT) * e

    # oracle model: returns the true eps regardless of input (4-ch output)
    model_fn = lambda x9, t, c: jnp.broadcast_to(e, x9.shape[:3] + (4,))
    ctx = jnp.zeros((2, 1, 8))
    out = ddim_sample(
        model_fn, x_T, ctx, None, x0, jnp.zeros(x0.shape[:3] + (1,)), tabs,
        cfg_scale=1.0,
    )
    # final alphas_prev = acp[0]: x_final = sqrt(acp0) x0 + sqrt(1-acp0) e
    acp0 = float(np.asarray(sched.alphas_cumprod)[0])
    expect = np.sqrt(acp0) * np.asarray(x0) + np.sqrt(1 - acp0) * np.asarray(e)
    np.testing.assert_allclose(np.asarray(out), expect, atol=2e-4)


def test_ddim_step_formula():
    _, tabs, x0, e = _setup()
    a_t, a_prev = tabs.alphas[3], tabs.alphas_prev[3]
    s1m = tabs.sqrt_one_minus_alphas[3]
    x_t = jnp.sqrt(a_t) * x0 + s1m * e
    x_prev, pred = ddim_step(x_t, e, a_t, a_prev, s1m, 0.0)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(x0), atol=1e-4)
    expect = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev) * e
    np.testing.assert_allclose(np.asarray(x_prev), np.asarray(expect), atol=1e-4)


def test_cfg_uncond_first_ordering():
    """The guided eps must be e_u + s*(e_c - e_u) with uncond in batch[:B]."""

    def model_fn(x9, t, ctx):
        # eps = context mean per-sample, broadcast over space
        m = ctx.mean(axis=(1, 2))
        return jnp.ones(x9.shape[:3] + (4,)) * m[:, None, None, None]

    b = 2
    x9 = jnp.zeros((b, 4, 4, 9))
    t = jnp.zeros((b,), jnp.int32)
    uc = jnp.full((b, 1, 8), 1.0)
    c = jnp.full((b, 1, 8), 3.0)
    ctx_cat = jnp.concatenate([uc, c], axis=0)
    out = cfg_eps(model_fn, x9, t, ctx_cat, scale=2.0)
    # e = 1 + 2*(3-1) = 5
    np.testing.assert_allclose(np.asarray(out), 5.0, atol=1e-6)


def test_ddim_9ch_concat_inside_scan():
    """The model must see [x, z_inpaint, mask] in channels 0:4,4:8,8:9."""
    sched, tabs, x0, e = _setup(S=2)
    z_inp = jnp.full(x0.shape, 7.0)
    mask = jnp.full(x0.shape[:3] + (1,), 0.5)
    seen = {}

    def model_fn(x9, t, c):
        seen["ch"] = x9.shape[-1]
        # eps derived from the inpaint channels: checks concat layout
        return x9[..., 4:8] * 0.0 + x9[..., 8:9] * 0.0 + e

    out = ddim_sample(
        model_fn, x0, jnp.zeros((2, 1, 8)), None, z_inp, mask, tabs, cfg_scale=1.0
    )
    assert seen["ch"] == 9
    assert out.shape == x0.shape


def test_ddim_eta_requires_key():
    sched, tabs, x0, e = _setup(S=2)
    model_fn = lambda x9, t, c: e
    try:
        ddim_sample(
            model_fn, x0, jnp.zeros((2, 1, 8)), None, x0,
            jnp.zeros(x0.shape[:3] + (1,)),
            DDIMTables.create(sched, 2, eta=1.0), cfg_scale=1.0, eta=1.0,
        )
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_cfg_interval_serving_mode():
    """cfg_steps=S must equal the exact protocol; cfg_steps<S switches the
    low-noise tail to single conditional forwards (guidance-interval)."""
    sched, tabs, x0, e = _setup()
    aT = tabs.alphas[-1]
    x_T = jnp.sqrt(aT) * x0 + jnp.sqrt(1 - aT) * e
    calls = {"n": 0, "batches": []}

    def model_fn(x9, t, c):
        calls["n"] += 1
        calls["batches"].append(x9.shape[0])
        # eps depends on the context so CFG != single-cond
        base = jnp.tile(e, (x9.shape[0] // e.shape[0], 1, 1, 1))
        return base + 0.01 * jnp.mean(c)

    ctx = jnp.ones((2, 1, 8))
    uc = jnp.zeros((2, 1, 8))
    rest = (x0, jnp.zeros(x0.shape[:3] + (1,)))

    full = ddim_sample(model_fn, x_T, ctx, uc, *rest, tabs, cfg_scale=3.0)
    same = ddim_sample(model_fn, x_T, ctx, uc, *rest, tabs, cfg_scale=3.0,
                       cfg_steps=tabs.num_steps)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(same))

    part = ddim_sample(model_fn, x_T, ctx, uc, *rest, tabs, cfg_scale=3.0,
                       cfg_steps=4)
    assert np.abs(np.asarray(part) - np.asarray(full)).max() > 0

    # trace-time shape check: head traces a 2B batch, tail a B batch
    calls["batches"].clear()
    jax.make_jaxpr(
        lambda xT: ddim_sample(model_fn, xT, ctx, uc, *rest, tabs,
                               cfg_scale=3.0, cfg_steps=4)
    )(x_T)
    assert set(calls["batches"]) == {4, 2}


def test_plms_chain_recovers_x0():
    sched, tabs, x0, e = _setup()
    aT = tabs.alphas[-1]
    x_T = jnp.sqrt(aT) * x0 + jnp.sqrt(1 - aT) * e
    model_fn = lambda x9, t, c: jnp.broadcast_to(e, x9.shape[:3] + (4,))
    out = plms_sample(
        model_fn, x_T, jnp.zeros((2, 1, 8)), None, x0,
        jnp.zeros(x0.shape[:3] + (1,)), tabs, cfg_scale=1.0,
    )
    acp0 = float(np.asarray(sched.alphas_cumprod)[0])
    expect = np.sqrt(acp0) * np.asarray(x0) + np.sqrt(1 - acp0) * np.asarray(e)
    # constant-eps oracle makes every Adams-Bashforth combo equal e
    np.testing.assert_allclose(np.asarray(out), expect, atol=2e-4)
