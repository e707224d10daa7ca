"""Progressive distillation: closed-form targets, window/table alignment,
and a tiny end-to-end training run (VERDICT r2 next-round item #1).

Teacher protocol being distilled: the exact DDIM chain with CFG
batch-doubling (ldm/models/diffusion/ddim.py:338-346)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from reface_tpu.core.schedules import DDIMTables, DiffusionSchedule
from reface_tpu.diffusion.ddim import ddim_sample, ddim_step
from reface_tpu.diffusion.distill import (
    DistillConfig,
    distill_eps_target,
    distill_schedule_plan,
    make_distill_loss,
    teacher_window,
)


def _sched():
    return DiffusionSchedule.create()


def test_eps_target_is_exact_one_step_solution():
    """eps* must make ONE eta=0 DDIM step land exactly on the teacher
    window endpoint — for ANY teacher (the solve is model-independent)."""
    sched = _sched()
    tt = DDIMTables.create(sched, 10)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 4)), jnp.float32)
    rest = jnp.asarray(rng.normal(size=(2, 4, 4, 5)), jnp.float32)

    # a nonlinear fake teacher
    w = jnp.asarray(rng.normal(size=(9, 4)), jnp.float32)

    def model_fn(x9, t, c):
        return jnp.tanh(x9 @ w) + 0.01 * t[:, None, None, None]

    j_hi = jnp.asarray([9, 5], jnp.int32)
    k = 2
    x_end = teacher_window(model_fn, x, rest, j_hi, k, tt, jnp.zeros((2, 1, 8)),
                           None, 1.0)
    shape = (-1, 1, 1, 1)
    a_t = tt.alphas[j_hi].reshape(shape)
    a_tgt = tt.alphas[jnp.maximum(j_hi - k, 0) * 0 + (j_hi - k)].reshape(shape)
    eps_star = distill_eps_target(x, x_end, a_t, a_tgt)
    x_one, _ = ddim_step(x, eps_star, a_t, a_tgt,
                         jnp.sqrt(1.0 - a_t), 0.0)
    np.testing.assert_allclose(np.asarray(x_one), np.asarray(x_end),
                               rtol=1e-4, atol=1e-5)


def test_constant_eps_teacher_collapses_to_same_eps():
    """If the teacher predicts a constant eps at every step, the exact
    multi-step chain IS a single DDIM step with that eps — so eps* == eps
    (the math the progressive-distillation target rests on)."""
    sched = _sched()
    tt = DDIMTables.create(sched, 10)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4)), jnp.float32)
    rest = jnp.zeros((1, 4, 4, 5), jnp.float32)
    eps_const = jnp.asarray(rng.normal(size=(1, 4, 4, 4)), jnp.float32)
    model_fn = lambda x9, t, c: jnp.broadcast_to(eps_const, x9.shape[:3] + (4,))

    j_hi = jnp.asarray([9], jnp.int32)
    for k in (2, 5):
        x_end = teacher_window(model_fn, x, rest, j_hi, k, tt,
                               jnp.zeros((1, 1, 8)), None, 1.0)
        a_t = tt.alphas[9].reshape(1, 1, 1, 1)
        a_tgt = tt.alphas[9 - k].reshape(1, 1, 1, 1)
        eps_star = distill_eps_target(x, x_end, a_t, a_tgt)
        np.testing.assert_allclose(np.asarray(eps_star), np.asarray(eps_const),
                                   rtol=2e-3, atol=2e-4)


def test_teacher_window_matches_full_ddim_chain():
    """teacher_window with j_hi = S-1, k = S must equal ddim_sample on the
    same tables/model (index arithmetic, final-step handling, CFG)."""
    sched = _sched()
    S = 8
    tt = DDIMTables.create(sched, S)
    rng = np.random.default_rng(2)
    x_T = jnp.asarray(rng.normal(size=(2, 4, 4, 4)), jnp.float32)
    z_inp = jnp.asarray(rng.normal(size=(2, 4, 4, 4)), jnp.float32)
    mask = jnp.ones((2, 4, 4, 1), jnp.float32)
    rest = jnp.concatenate([z_inp, mask], axis=-1)
    c = jnp.asarray(rng.normal(size=(2, 1, 8)), jnp.float32)
    uc = jnp.zeros_like(c)
    w = jnp.asarray(rng.normal(size=(9, 4)) * 0.2, jnp.float32)
    wc = jnp.asarray(rng.normal(size=(8, 4)) * 0.2, jnp.float32)

    def model_fn(x9, t, ctx):
        return jnp.tanh(x9 @ w) + jnp.mean(ctx @ wc, axis=1)[:, None, None, :]

    ref = ddim_sample(model_fn, x_T, c, uc, z_inp, mask, tt, cfg_scale=3.0)
    j_hi = jnp.asarray([S - 1, S - 1], jnp.int32)
    win = teacher_window(model_fn, x_T, rest, j_hi, S, tt, c, uc, 3.0)
    np.testing.assert_allclose(np.asarray(win), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_schedule_plan():
    assert distill_schedule_plan(50, 10) == [10]
    assert distill_schedule_plan(50, 5) == [25, 5]
    assert distill_schedule_plan(50, 25) == [25]
    assert distill_schedule_plan(10, 10) == []
    with pytest.raises(ValueError):
        DistillConfig(teacher_steps=50, student_steps=30).steps_per_call


def test_distill_training_tiny_converges():
    """A small trainable eps-model distilled from a frozen teacher (CFG 2
    folded into the student): the loss drops and the student's 5-step
    unguided chain approaches the teacher's 10-step guided chain."""
    import optax

    sched = _sched()
    cfg = DistillConfig(teacher_steps=10, student_steps=5, cfg_scale=2.0,
                        fold_cfg=True)
    loss_fn, tt, ts = make_distill_loss(cfg, sched)

    rng = np.random.default_rng(3)
    wt = jnp.asarray(rng.normal(size=(9, 4)) * 0.3, jnp.float32)
    wtc = jnp.asarray(rng.normal(size=(8, 4)) * 0.3, jnp.float32)

    def teacher_fn(x9, t, ctx):
        tf = (t.astype(jnp.float32) / 1000.0)[:, None, None, None]
        return jnp.tanh(x9 @ wt) * (1 + tf) + jnp.mean(
            ctx @ wtc, axis=1
        )[:, None, None, :]

    def student_apply(p, x9, t, ctx):
        tf = (t.astype(jnp.float32) / 1000.0)[:, None, None, None]
        h = jnp.tanh(x9 @ p["w1"]) * (1 + tf)
        h = h + jnp.mean(ctx @ p["wc"], axis=1)[:, None, None, :]
        return h + jnp.tanh(h @ p["w2"])

    params = {
        "w1": wt.copy(),
        "wc": wtc.copy(),
        "w2": jnp.zeros((4, 4), jnp.float32),
    }

    z0 = jnp.asarray(rng.normal(size=(8, 4, 4, 4)) * 0.5, jnp.float32)
    rest = jnp.asarray(rng.normal(size=(8, 4, 4, 5)) * 0.5, jnp.float32)
    c = jnp.asarray(rng.normal(size=(8, 1, 8)), jnp.float32)
    uc = jnp.zeros_like(c)

    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def lf(p):
            sf = lambda x9, t, ctx: student_apply(p, x9, t, ctx)
            return loss_fn(sf, teacher_fn, z0, rest, c, uc, key)

        (loss, m), g = jax.value_and_grad(lf, has_aux=True)(params)
        up, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, up), opt_state, loss

    key = jax.random.key(0)
    losses = []
    p = params
    for i in range(400):
        key, sub = jax.random.split(key)
        p, opt_state, loss = step(p, opt_state, sub)
        losses.append(float(loss))
    assert np.mean(losses[-20:]) < 0.25 * np.mean(losses[:20])

    # end-to-end: student 5-step unguided vs teacher 10-step guided
    x_T = jnp.asarray(rng.normal(size=(8, 4, 4, 4)), jnp.float32)
    z_inp, mask = rest[..., :4], rest[..., 4:]
    ref = ddim_sample(teacher_fn, x_T, c, uc, z_inp, mask, tt, cfg_scale=2.0)

    def run_student(pp):
        sf = lambda x9, t, ctx: student_apply(pp, x9, t, ctx)
        return ddim_sample(sf, x_T, c, None, z_inp, mask, ts, cfg_scale=1.0)

    err_trained = float(jnp.mean((run_student(p) - ref) ** 2))
    err_init = float(jnp.mean((run_student(params) - ref) ** 2))
    assert err_trained < 0.5 * err_init


def test_distill_cli_tiny_smoke(tmp_path, monkeypatch):
    """End-to-end tiny run of the distill driver: one round, one step,
    writes a servable params dir + manifest. Also asserts the CLI routes
    its swap config through resolve_train_swap_cfg — the student backward
    needs the differentiable flash attention path (the smalld inference
    kernels define no VJP; queue5 distill_rs died in linearization on the
    chip, which CPU tests can't reproduce because attention only routes to
    Pallas when jax.default_backend() == 'tpu')."""
    import json

    import reface_tpu.pipelines.train as T

    seen = {}
    orig = T.resolve_train_swap_cfg

    def spy(cfg, tc, recon):
        r = orig(cfg, tc, recon)
        seen["attn"] = r.unet.attn_impl
        seen["remat"] = r.unet.remat
        return r

    monkeypatch.setattr(T, "resolve_train_swap_cfg", spy)

    from reface_tpu.cli.distill import main as distill_main

    out = tmp_path / "student"
    distill_main([
        "--out", str(out), "--tiny", "--backend", "cpu",
        "--steps-per-round", "1", "--batch-size", "1", "--max-rounds", "1",
        "--teacher-steps", "4", "--target-steps", "2", "--log-every", "1",
    ])
    assert seen["attn"] == "flash" and seen["remat"]
    manifest = json.loads((out / "manifest.json").read_text())
    assert manifest["ddim_steps"] == 2 and manifest["cfg_scale"] == 1.0
