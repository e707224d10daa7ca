"""Specialized small-head-dim attention kernel (ops/attention_smalld).

Runs the Pallas kernels in interpreter mode on CPU and checks both layouts
and the fast serving mode against the fp32-softmax einsum reference.
"""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

import reface_tpu.ops.attention_smalld as S
from reface_tpu.ops.attention import attention_bhnd, multi_head_attention


@pytest.fixture
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )


def _qkv(bh=4, n=256, d=40, dtype=jnp.float32):
    ks = jax.random.split(jax.random.key(0), 3)
    return tuple(jax.random.normal(k, (bh, n, d), dtype) for k in ks)


def test_smalld_nn_matches_einsum(interpret_pallas):
    q, k, v = _qkv()
    out = S.self_attention_smalld(q, k, v, block_q=128)
    ref = attention_bhnd(q[None], k[None], v[None], impl="einsum")[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_smalld_tn_matches_einsum(interpret_pallas):
    q, k, v = _qkv(n=512, d=80)
    out = S.self_attention_smalld(q, k, v, block_q=128, layout="tn")
    ref = attention_bhnd(q[None], k[None], v[None], impl="einsum")[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_smalld_fast_close_to_exact(interpret_pallas):
    """Serving mode: bf16 probs + no row-max; error stays at bf16 scale."""
    q, k, v = _qkv(dtype=jnp.bfloat16)
    for layout in ("nn", "tn"):
        exact = S.self_attention_smalld(q, k, v, block_q=128, layout=layout)
        fast = S.self_attention_smalld(q, k, v, block_q=128, layout=layout,
                                       fast=True)
        err = np.abs(np.asarray(exact, np.float32) - np.asarray(fast, np.float32))
        assert err.max() < 3e-2, (layout, err.max())


def test_multi_head_attention_einsum_fallback_off_tpu():
    """impl='auto' on CPU must take the einsum path (no Pallas)."""
    b, n, hd = 2, 128, 64
    q = jax.random.normal(jax.random.key(0), (b, n, hd))
    k = jax.random.normal(jax.random.key(1), (b, n, hd))
    v = jax.random.normal(jax.random.key(2), (b, n, hd))
    out = multi_head_attention(q, k, v, num_heads=4, impl="auto")
    ref = multi_head_attention(q, k, v, num_heads=4, use_flash=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
