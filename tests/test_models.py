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
