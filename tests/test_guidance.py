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


def test_swap_guided_end_to_end_and_cli():
    """FaceSwapper.swap_guided (the driver-reachable path, VERDICT weak #8):
    id+seg+exp guidance runs tiny end-to-end and alters the output; the
    cli/swap.py --guidance flag drives it."""
    import numpy as np
    import jax

    from reface_tpu.pipelines.swap import FaceSwapper, tiny_swap_config

    cfg = tiny_swap_config(image_size=64, ddim_steps=2)
    sw = FaceSwapper(cfg, FaceSwapper.init_params(cfg, jax.random.key(0)))
    rng = np.random.default_rng(0)
    tgt = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)), jnp.float32)
    mask = jnp.ones((1, 64, 64, 1), jnp.float32).at[:, 16:48, 16:48].set(0.0)
    ref = jnp.asarray(rng.normal(size=(1, 224, 224, 3)), jnp.float32)

    kw = dict(target_image=tgt, inpaint_image=tgt * mask, inpaint_mask=mask,
              ref_clip224=ref, key=jax.random.key(1))
    out_g = sw.swap_guided(
        **kw, guidance=("id", "seg", "exp"),
        seg_logits_fn=lambda im: _fake_seg(im[..., :1] if False else im),
        exp_coeff_fn=lambda im: _fake_coeffs(im),
    )
    assert out_g.shape == (1, 64, 64, 3)
    assert bool(jnp.isfinite(out_g).all())
    out_plain = sw.swap(**kw)
    assert float(jnp.abs(out_g - out_plain).max()) > 1e-6


def test_cli_swap_guidance_flag(tmp_path):
    import numpy as np

    try:
        import cv2
    except ImportError:
        import pytest

        pytest.skip("cv2 absent")
    rng = np.random.default_rng(1)
    tdir = tmp_path / "t"
    sdir = tmp_path / "s"
    odir = tmp_path / "o"
    tdir.mkdir()
    sdir.mkdir()
    cv2.imwrite(str(tdir / "a.png"),
                rng.integers(0, 255, (64, 64, 3), np.uint8))
    cv2.imwrite(str(sdir / "b.png"),
                rng.integers(0, 255, (64, 64, 3), np.uint8))

    from reface_tpu.cli.swap import main

    main(["--target", str(tdir), "--source", str(sdir), "--outdir",
          str(odir), "--tiny", "--backend", "cpu", "--precropped",
          "--guidance", "id", "--guidance-scale", "0.5"])
    assert (odir / "b_a.png").exists()
