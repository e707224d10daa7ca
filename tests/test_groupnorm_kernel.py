"""Pallas GroupNorm+SiLU kernel vs the XLA reference implementation (CPU
falls back to the reference path; the TPU kernel is validated in-session)."""

import numpy as np
import jax
import jax.numpy as jnp

from reface_tpu.ops.groupnorm import _reference_impl, group_norm_silu


def test_reference_impl_matches_flax_groupnorm():
    from flax import linen as nn

    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 64))
    scale = jax.random.normal(jax.random.key(1), (64,))
    bias = jax.random.normal(jax.random.key(2), (64,))
    gn = nn.GroupNorm(num_groups=32)
    params = {"params": {"scale": scale, "bias": bias}}
    expect = gn.apply(params, x)
    got = _reference_impl(x, scale, bias, 32, 1e-5, silu=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-4)


def test_group_norm_silu_dispatch_and_silu():
    x = jax.random.normal(jax.random.key(0), (1, 4, 4, 32))
    scale = jnp.ones((32,))
    bias = jnp.zeros((32,))
    no_act = group_norm_silu(x, scale, bias, groups=8, silu=False)
    with_act = group_norm_silu(x, scale, bias, groups=8, silu=True)
    np.testing.assert_allclose(
        np.asarray(with_act),
        np.asarray(no_act) * (1 / (1 + np.exp(-np.asarray(no_act)))),
        atol=1e-5,
    )
