"""Shape/structure tests for the NN towers on tiny configs (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reface_tpu.nn import (
    ArcFaceConfig,
    AutoencoderKL,
    CLIPConditioner,
    CLIPVisionConfig,
    ConditionerConfig,
    IRSE50,
    REFaceConditioner,
    UNetConfig,
    UNetModel,
    VAEConfig,
)

F32 = jnp.float32


@pytest.fixture(scope="module")
def keys():
    return jax.random.split(jax.random.key(0), 8)


def test_unet_tiny_forward(keys):
    cfg = UNetConfig(
        model_channels=32,
        num_heads=4,
        channel_mult=(1, 2),
        attention_resolutions=(1, 2),
        dtype=F32,
    )
    m = UNetModel(cfg)
    x = jax.random.normal(keys[0], (2, 16, 16, 9))
    t = jnp.array([981, 1])
    ctx = jax.random.normal(keys[1], (2, 1, 768))
    p = m.init(keys[2], x, t, ctx)
    out = m.apply(p, x, t, ctx)
    assert out.shape == (2, 16, 16, 4)
    assert out.dtype == jnp.float32
    # zero-init output conv -> exactly zero at init
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_unet_full_param_count_matches_sd():
    m = UNetModel(UNetConfig())
    shapes = jax.eval_shape(
        m.init,
        jax.random.key(0),
        jnp.zeros((1, 64, 64, 9)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 1, 768)),
    )
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(shapes))
    # SD-v1 UNet (859,520,964) + 9ch conv_in delta (5*320*3*3 = 14,400)
    assert n == 859_535_364


def test_unet_split_context_head_routing(keys):
    """A 1536-wide context must take the split-head path and still work."""
    cfg = UNetConfig(
        model_channels=32, num_heads=8, channel_mult=(1,),
        attention_resolutions=(1,), dtype=F32,
    )
    m = UNetModel(cfg)
    x = jax.random.normal(keys[0], (1, 8, 8, 9))
    t = jnp.array([5])
    ctx = jax.random.normal(keys[1], (1, 1, 1536))
    p = m.init(keys[2], x, t, ctx)
    out = m.apply(p, x, t, ctx)
    assert out.shape == (1, 8, 8, 4)


def test_vae_roundtrip_shapes(keys):
    cfg = VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1, dtype=F32)
    vae = AutoencoderKL(cfg)
    x = jax.random.normal(keys[0], (1, 32, 32, 3))
    p = vae.init(keys[1], x)  # full encode+decode so all params exist
    post = vae.apply(p, x, method=AutoencoderKL.encode)
    assert post.mean.shape == (1, 16, 16, 4)  # one stride-2 stage
    rec = vae.apply(p, post.mode(), method=AutoencoderKL.decode)
    assert rec.shape == (1, 32, 32, 3)
    assert rec.dtype == jnp.float32


def test_vae_full_latent_factor_8():
    cfg = VAEConfig(dtype=F32)
    vae = AutoencoderKL(cfg)
    x = jnp.zeros((1, 512, 512, 3))
    params = jax.eval_shape(vae.init, jax.random.key(0), x)
    post = jax.eval_shape(
        lambda p, x: vae.apply(p, x, method=AutoencoderKL.encode).mean, params, x
    )
    assert post.shape == (1, 64, 64, 4)


def test_clip_tiny_tower(keys):
    cfg = CLIPVisionConfig(hidden=64, layers=2, heads=4, patch=8, image_size=32, dtype=F32)
    m = CLIPConditioner(cfg)
    x = jax.random.normal(keys[0], (2, 32, 32, 3))
    p = m.init(keys[1], x)
    z = m.apply(p, x)
    assert z.shape == (2, 1, 768)


def test_arcface_tiny(keys):
    cfg = ArcFaceConfig(depths=(8, 16), units=(1, 1), dtype=F32)
    m = IRSE50(cfg)
    x = jax.random.normal(keys[0], (2, 112, 112, 3))
    p = m.init(keys[1], x)
    z = m.apply(p, x)
    assert z.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(z), axis=1), 1.0, rtol=1e-5)
    ms = m.apply(p, x, multi_scale=True)
    assert len(ms) >= 1  # tiny net only has the final embedding tap


def test_conditioner_fusion_weights(keys):
    cfg = ConditionerConfig(
        clip=CLIPVisionConfig(hidden=64, layers=1, heads=4, patch=56,
                              image_size=224, dtype=F32),
        arcface=ArcFaceConfig(depths=(8, 16, 16, 16), units=(1, 1, 1, 1), dtype=F32),
    )
    m = REFaceConditioner(cfg)
    ref = jax.random.normal(keys[0], (2, 224, 224, 3))
    tar = jax.random.normal(keys[1], (2, 224, 224, 3))
    lm = jax.random.normal(keys[2], (2, 136)) * 256
    p = m.init(keys[3], ref, tar, lm)
    c = m.apply(p, ref, tar, lm)
    assert c.shape == (2, 1, 768)

    # fusion math: (1*a + 10*b + 0.05*c)/11.05
    a = jnp.ones((1, 1, 4))
    b = 2 * jnp.ones((1, 1, 4))
    d = 3 * jnp.ones((1, 1, 4))
    fused = m.apply(p, a, b, d, method=REFaceConditioner.fuse)
    np.testing.assert_allclose(
        np.asarray(fused), (1 * 1 + 10 * 2 + 0.05 * 3) / 11.05, rtol=1e-6
    )

    null = m.apply(p, 3, method=REFaceConditioner.null_conditioning)
    assert null.shape == (3, 1, 768)


def test_unet_cfg_expand_matches_batch_doubling(keys):
    """Exact CFG prefix dedup: cfg_expand on the half-batch must equal the
    plain forward on the duplicated batch with the paired contexts
    (cfg_eps's x9-doubling, ddim.py:338-346). Zero-init projections are
    randomized so the comparison is non-vacuous."""
    cfg = UNetConfig(
        model_channels=32,
        num_heads=4,
        channel_mult=(1, 2),
        attention_resolutions=(1, 2),
        dtype=F32,
    )
    m = UNetModel(cfg)
    x = jax.random.normal(keys[3], (2, 16, 16, 9))
    t = jnp.array([615, 77])
    c = jax.random.normal(keys[4], (2, 1, 768))
    uc = jax.random.normal(keys[5], (2, 1, 768))
    p = m.init(keys[6], x, t, ctx := jnp.concatenate([uc, c], axis=0)[:2])
    # randomize the zero-init out/proj convs (non-vacuous outputs)
    p = jax.tree.map(
        lambda a: jax.random.normal(keys[7], a.shape, a.dtype) * 0.02
        if a.ndim >= 2 and float(jnp.abs(a).sum()) == 0.0 else a,
        p,
    )

    ctx_pair = jnp.concatenate([uc, c], axis=0)
    ref = m.apply(
        p, jnp.concatenate([x, x], axis=0), jnp.concatenate([t, t], axis=0),
        ctx_pair,
    )
    dedup = m.apply(p, x, t, ctx_pair, cfg_expand=True)
    assert dedup.shape == ref.shape == (4, 16, 16, 4)
    assert float(jnp.abs(ref).max()) > 1e-6
    np.testing.assert_allclose(np.asarray(dedup), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_ddim_sample_dedup_matches_cfg_eps():
    """ddim_sample with dedup_model_fn == plain CFG batch-doubling."""
    from reface_tpu.core.schedules import DDIMTables, DiffusionSchedule
    from reface_tpu.diffusion.ddim import ddim_sample

    sched = DiffusionSchedule.create()
    tabs = DDIMTables.create(sched, 4)
    rng = np.random.default_rng(0)
    x_T = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), F32)
    z_inp = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), F32)
    mask = jnp.ones((2, 8, 8, 1), F32)
    c = jnp.asarray(rng.normal(size=(2, 1, 8)), F32)
    uc = jnp.zeros_like(c)
    w = jnp.asarray(rng.normal(size=(9, 4)) * 0.2, F32)
    wc = jnp.asarray(rng.normal(size=(8, 4)) * 0.2, F32)

    def model_fn(x9, t, ctx):
        return jnp.tanh(x9 @ w) + jnp.mean(ctx @ wc, axis=1)[:, None, None, :]

    def dedup_fn(x9, t, ctx_pair):
        x2 = jnp.concatenate([x9, x9], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        return model_fn(x2, t2, ctx_pair)

    ref = ddim_sample(model_fn, x_T, c, uc, z_inp, mask, tabs, cfg_scale=3.0)
    out = ddim_sample(model_fn, x_T, c, uc, z_inp, mask, tabs, cfg_scale=3.0,
                      dedup_model_fn=dedup_fn)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
