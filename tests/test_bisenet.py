"""BiSeNet face parser: structure, converter roundtrip, align-corners resize
parity with torch."""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from reface_tpu.ckpt.convert import _bisenet_rule, _flatten_tree, convert_bisenet
from reface_tpu.nn.bisenet import (
    BiSeNet,
    BiSeNetConfig,
    parse_faces,
    resize_bilinear_align_corners,
)

F32 = jnp.float32


def test_bisenet_forward_and_parse():
    m = BiSeNet(BiSeNetConfig(dtype=F32))
    p = m.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), aux_heads=True)
    logits = m.apply(p, jnp.zeros((2, 64, 64, 3)))
    assert logits.shape == (2, 64, 64, 19)
    out, o16, o32 = m.apply(p, jnp.zeros((1, 64, 64, 3)), aux_heads=True)
    assert o16.shape == out.shape == o32.shape == (1, 64, 64, 19)

    classes = parse_faces(m, p, jnp.zeros((1, 64, 64, 3)))
    assert classes.shape == (1, 64, 64) and classes.dtype == jnp.int32


def test_bisenet_converter_roundtrip():
    m = BiSeNet(BiSeNetConfig(dtype=F32))
    init_fn = functools.partial(m.init, aux_heads=True)
    params = jax.eval_shape(
        lambda k, x: init_fn(k, x), jax.random.key(0), jnp.zeros((1, 32, 32, 3))
    )
    params = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), params)
    flat = _flatten_tree(params)
    assert len(flat) == 160  # full BiSeNet parameter count (leaves)
    rng = np.random.default_rng(0)
    sd, vals = {}, {}
    for path, arr in flat.items():
        v = rng.normal(size=arr.shape).astype(np.float32)
        tkey, _ = _bisenet_rule(path)
        if path[-1] == "kernel" and v.ndim == 4:
            sd[tkey] = v.transpose(3, 2, 0, 1)
        elif path[-1] == "kernel" and v.ndim == 2:
            sd[tkey] = v.T
        else:
            sd[tkey] = v
        vals[path] = v
    out = _flatten_tree(convert_bisenet(params, sd))
    for path in flat:
        np.testing.assert_allclose(out[path], vals[path], err_msg=str(path))


def test_align_corners_resize_parity_with_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 7, 3)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), (64, 64), mode="bilinear",
        align_corners=True,
    ).numpy()
    out = resize_bilinear_align_corners(jnp.asarray(x), 64, 64)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5
    )
