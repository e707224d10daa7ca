import numpy as np
import jax
import jax.numpy as jnp

from reface_tpu.nn import LandmarkAuxHead, LandmarkNet, LandmarkNetConfig
from reface_tpu.nn.landmarks import soft_argmax_2d


def test_soft_argmax_peaks():
    h = jnp.full((1, 16, 16, 2), -20.0)
    h = h.at[0, 5, 9, 0].set(20.0)   # point 0 at (x=9, y=5)
    h = h.at[0, 12, 3, 1].set(20.0)  # point 1 at (x=3, y=12)
    pts = soft_argmax_2d(h)
    np.testing.assert_allclose(np.asarray(pts[0, 0]), [9, 5], atol=1e-3)
    np.testing.assert_allclose(np.asarray(pts[0, 1]), [3, 12], atol=1e-3)


def test_landmark_net_shapes_and_range():
    cfg = LandmarkNetConfig(widths=(8, 16, 32, 32), dtype=jnp.float32)
    m = LandmarkNet(cfg)
    x = jax.random.uniform(jax.random.key(0), (2, 256, 256, 3), minval=-1, maxval=1)
    p = m.init(jax.random.key(1), x)
    out = m.apply(p, x)
    assert out.shape == (2, 136)
    o = np.asarray(out)
    assert (o >= 0).all() and (o <= 256).all()  # pixel coords in range


def test_landmark_aux_head_matches_reference_shape():
    m = LandmarkAuxHead()
    feats = jax.random.normal(jax.random.key(0), (2, 64, 64, 640))
    p = m.init(jax.random.key(1), feats)
    out = m.apply(p, feats)
    assert out.shape == (2, 136)
