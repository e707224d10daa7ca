"""Guided-DDIM loss builders (ddim_guided.py:380-609 semantics)."""

import numpy as np
import jax
import jax.numpy as jnp

from reface_tpu.core import DDIMTables, DiffusionSchedule
from reface_tpu.diffusion import (
    combine_guidance,
    guided_ddim_sample,
    make_expression_guidance,
    make_id_guidance,
    make_seg_guidance,
)


def _fake_decode(z):
    """Differentiable stand-in for the VAE decode: latent (B,8,8,4) ->
    image (B,16,16,3) in [-1,1]-ish."""
    img = jnp.repeat(jnp.repeat(z[..., :3], 2, 1), 2, 2)
    return jnp.tanh(img)


def _fake_embed(img_pm1):
    f = jnp.mean(img_pm1, axis=(1, 2))  # (B, 3)
    f = jnp.concatenate([f, f * 0.5], axis=-1)  # (B, 6)
    return f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-8)


def _fake_seg(img_pm1):
    b, h, w, _ = img_pm1.shape
    base = jnp.concatenate([img_pm1] * 7, axis=-1)[..., :19]
    return base  # (B, H, W, 19) pseudo-logits


def _fake_coeffs(img01):
    f = jnp.mean(img01, axis=(1, 2))  # (B, 3)
    return jnp.tile(f, (1, 22))[:, :64]


def test_id_guidance_t_gating_and_sign():
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    src = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
    g = make_id_guidance(_fake_decode, _fake_embed, src, t_range=(5, 500))
    # inside the window: nonzero loss in [0, 2*weight]
    l_in = float(g(z, jnp.asarray(100)))
    assert 0.0 <= l_in <= 2.0 and l_in > 0
    # outside: exactly zero (ddim_guided.py:545 gate)
    assert float(g(z, jnp.asarray(900))) == 0.0
    assert float(g(z, jnp.asarray(2))) == 0.0
    # identical image <-> source embedding -> lower loss than random
    src_match = _fake_decode(z)
    g2 = make_id_guidance(_fake_decode, _fake_embed, src_match)
    assert float(g2(z, jnp.asarray(100))) < 1e-5


def test_seg_and_expression_guidance_zero_at_match():
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
    tgt = _fake_decode(z)
    g_seg = make_seg_guidance(_fake_decode, _fake_seg, tgt)
    g_exp = make_expression_guidance(_fake_decode, _fake_coeffs, tgt)
    t = jnp.asarray(100)
    assert float(g_seg(z, t)) < 1e-6
    assert float(g_exp(z, t)) < 1e-5
    other = jnp.asarray(rng.normal(size=(1, 16, 16, 3)), jnp.float32)
    assert float(make_seg_guidance(_fake_decode, _fake_seg, other)(z, t)) > 0


def test_combined_guidance_in_sampler():
    sched = DiffusionSchedule.create()
    tabs = DDIMTables.create(sched, 4)
    rng = np.random.default_rng(2)
    x_T = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
    model_fn = lambda x9, t, c: jnp.broadcast_to(e, x9.shape[:3] + (4,))
    src = jnp.asarray(rng.normal(size=(1, 16, 16, 3)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(1, 16, 16, 3)), jnp.float32)
    loss_fn = combine_guidance(
        make_id_guidance(_fake_decode, _fake_embed, src),
        make_seg_guidance(_fake_decode, _fake_seg, tgt),
        make_expression_guidance(_fake_decode, _fake_coeffs, tgt),
    )
    rest = jnp.zeros_like(x_T)
    mask = jnp.zeros(x_T.shape[:3] + (1,))
    out = guided_ddim_sample(model_fn, loss_fn, x_T, jnp.zeros((1, 1, 8)),
                             None, rest, mask, tabs, cfg_scale=1.0,
                             guidance_scale=1.0)
    assert out.shape == x_T.shape
    assert bool(jnp.isfinite(out).all())
    # guidance actually alters the trajectory
    base = guided_ddim_sample(model_fn, loss_fn, x_T, jnp.zeros((1, 1, 8)),
                              None, rest, mask, tabs, cfg_scale=1.0,
                              guidance_scale=0.0)
    assert float(jnp.abs(out - base).max()) > 1e-6
