"""EMA, LR schedules, spatial tiling, config system tests."""

import numpy as np
import jax
import jax.numpy as jnp

from reface_tpu.core.config import apply_dotlist, build, merge
from reface_tpu.core.ema import EmaState, ema_update
from reface_tpu.core.lr_schedule import lambda_linear, scale_lr
from reface_tpu.parallel.tiling import border_weights, tiled_apply, unfold, fold


def test_ema_warmup_ramp():
    params = {"w": jnp.zeros(3)}
    st = EmaState.create(params, decay=0.9999)
    # after 1 update: d = min(.9999, 2/11); shadow = (1-d)*param
    new_params = {"w": jnp.ones(3)}
    st = ema_update(st, new_params)
    d = 2.0 / 11.0
    np.testing.assert_allclose(np.asarray(st.shadow["w"]), 1 - d, rtol=1e-6)
    # many updates -> approaches params
    for _ in range(50):
        st = ema_update(st, new_params)
    assert float(st.shadow["w"][0]) > 0.99


def test_ema_no_warmup():
    st = EmaState.create({"w": jnp.zeros(1)}, decay=0.5, warmup=False)
    st = ema_update(st, {"w": jnp.ones(1)})
    np.testing.assert_allclose(np.asarray(st.shadow["w"]), 0.5)


def test_ema_bf16_shadow():
    """dtype='bfloat16' shadows: dtype-stable across updates (no pytree
    dtype drift that would retrigger jit), fp32 update math, and tracking
    within bf16 rounding of the fp32 shadow — the mode that fits EMA at
    860M on a 16G v5e (BENCH_LOG.md round-5)."""
    params = {"w": jnp.full((4,), 0.3, jnp.float32)}
    st16 = EmaState.create(params, decay=0.99, dtype="bfloat16")
    st32 = EmaState.create(params, decay=0.99)
    assert st16.shadow["w"].dtype == jnp.bfloat16
    new_params = {"w": jnp.full((4,), 1.0, jnp.float32)}
    for _ in range(20):
        st16 = ema_update(st16, new_params)
        st32 = ema_update(st32, new_params)
    assert st16.shadow["w"].dtype == jnp.bfloat16  # stable under updates
    np.testing.assert_allclose(
        np.asarray(st16.shadow["w"], np.float32),
        np.asarray(st32.shadow["w"]), rtol=1e-2,
    )


def test_ema_shadow_never_aliases_params():
    """Donation safety: the train step donates its TrainState
    (cli/train.py donate_argnums=(0,)); a same-dtype shadow leaf sharing a
    params buffer would be donated twice (XLA error or silent corruption).
    EmaState.create must COPY — this is the invariant the round-5 EMA
    at-real-size fix depends on (BENCH_LOG.md round-5 EMA follow-up)."""
    params = {"w": jnp.full((8,), 0.7, jnp.float32)}
    st = EmaState.create(params, decay=0.9999)  # same dtype as params
    for s, p in zip(jax.tree.leaves(st.shadow), jax.tree.leaves(params)):
        assert s is not p
        # buffer-level check: donating/deleting the param must leave the
        # shadow readable (unsafe_buffer_pointer differs on backends that
        # expose it; delete() is the portable aliasing probe)
        p.delete()
        np.testing.assert_allclose(np.asarray(s), 0.7)


def test_lambda_linear_shipped_config():
    sched = lambda_linear(10_000, 1e-6, 1.0, 1.0)
    np.testing.assert_allclose(float(sched(0)), 1e-6, rtol=1e-5)
    np.testing.assert_allclose(float(sched(5000)), 0.5, rtol=1e-3)
    np.testing.assert_allclose(float(sched(10_000)), 1.0, rtol=1e-5)
    np.testing.assert_allclose(float(sched(1_000_000)), 1.0, rtol=1e-3)


def test_scale_lr_rule():
    assert scale_lr(1e-5, batch_size=1, n_devices=2) == 2e-5


def test_border_weights_properties():
    w = border_weights(8)
    assert w.shape == (8, 8)
    assert w.max() == 1.0
    assert w[0, 0] < w[4, 4]  # corners weighted less


def test_unfold_fold_identity():
    x = jax.random.uniform(jax.random.key(0), (2, 16, 16, 3))
    out = tiled_apply(lambda t: t, x, tile=8, stride=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_tiled_apply_with_upscale():
    x = jax.random.uniform(jax.random.key(1), (1, 8, 8, 2))
    fn = lambda t: jnp.repeat(jnp.repeat(t, 2, 1), 2, 2)  # nearest x2
    out = tiled_apply(fn, x, tile=4, stride=2, scale=2)
    ref = jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_unfold_covers_ragged_sizes():
    x = jnp.arange(1 * 10 * 10 * 1.0).reshape(1, 10, 10, 1)
    tiles, meta = unfold(x, tile=4, stride=3)
    out = fold(tiles, meta)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_config_merge_and_dotlist():
    a = {"model": {"lr": 1.0, "x": 1}, "data": {"bs": 2}}
    b = {"model": {"lr": 2.0}}
    m = merge(a, b)
    assert m["model"]["lr"] == 2.0 and m["model"]["x"] == 1
    m2 = apply_dotlist(m, ["model.lr=3.5", "data.name=celeba", "flag=true"])
    assert m2["model"]["lr"] == 3.5
    assert m2["data"]["name"] == "celeba"
    assert m2["flag"] == "true" or m2["flag"] is True


def test_config_build_dataclass():
    import dataclasses

    @dataclasses.dataclass(frozen=True)
    class Inner:
        y: int = 1

    @dataclasses.dataclass(frozen=True)
    class Outer:
        x: float = 0.5
        inner: Inner = Inner()

    out = build(Outer, {"x": 2.0, "inner": {"y": 7}})
    assert out.x == 2.0 and out.inner.y == 7
    try:
        build(Outer, {"nope": 1})
        raised = False
    except KeyError:
        raised = True
    assert raised
