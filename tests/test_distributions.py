import numpy as np
import jax
import jax.numpy as jnp

from reface_tpu.core import DiagonalGaussian, normal_kl


def test_from_moments_split_and_clamp():
    moments = jnp.concatenate(
        [jnp.full((1, 2, 2, 4), 3.0), jnp.full((1, 2, 2, 4), -99.0)], axis=-1
    )
    d = DiagonalGaussian.from_moments(moments)
    assert d.mean.shape == (1, 2, 2, 4)
    np.testing.assert_array_equal(np.asarray(d.logvar), -30.0)  # clamped


def test_sample_statistics():
    d = DiagonalGaussian(jnp.full((4096,), 2.0), jnp.zeros((4096,)))
    s = d.sample(jax.random.key(0))
    assert abs(float(s.mean()) - 2.0) < 0.1
    assert abs(float(s.std()) - 1.0) < 0.1


def test_kl_standard_normal_zero():
    d = DiagonalGaussian(jnp.zeros((2, 3)), jnp.zeros((2, 3)))
    np.testing.assert_allclose(np.asarray(d.kl()), 0.0, atol=1e-7)


def test_normal_kl_matches_closed_form():
    # KL(N(1, e^0) || N(0, e^0)) = 0.5
    out = normal_kl(jnp.array(1.0), jnp.array(0.0), jnp.array(0.0), jnp.array(0.0))
    np.testing.assert_allclose(float(out), 0.5, rtol=1e-6)
