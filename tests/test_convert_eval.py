"""Converter roundtrips for the eval towers (Hopenet/D3DFR ResNet-50, CLIP
ViT-B/32 tower)."""

import numpy as np
import jax
import jax.numpy as jnp

from reface_tpu.ckpt.convert import (
    _flatten_tree,
    _resnet50_rule,
    convert_clip_vision,
    convert_hopenet,
)
from reface_tpu.eval import CLIP_B32, Hopenet
from reface_tpu.nn.clip import CLIPVisionTower


def _inverse(vals, leaf):
    if leaf == "kernel" and vals.ndim == 2:
        return vals.T
    if leaf == "kernel" and vals.ndim == 4:
        return vals.transpose(3, 2, 0, 1)
    return vals


def test_hopenet_converter_roundtrip():
    m = Hopenet(dtype=jnp.float32)
    params = jax.eval_shape(
        m.init, jax.random.key(0), jnp.zeros((1, 64, 64, 3))
    )
    params = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), params)
    flat = _flatten_tree(params)
    rule = _resnet50_rule()
    rng = np.random.default_rng(0)
    sd, vals = {}, {}
    for path, arr in flat.items():
        v = rng.normal(size=arr.shape).astype(np.float32)
        tkey, _ = rule(path)
        sd[tkey] = _inverse(v, path[-1])
        vals[path] = v
    out = _flatten_tree(convert_hopenet(params, sd))
    assert set(out) == set(flat)
    for path in flat:
        np.testing.assert_allclose(out[path], vals[path], err_msg=str(path))


def test_clip_b32_tower_converter_roundtrip():
    tower = CLIPVisionTower(CLIP_B32)
    params = jax.eval_shape(
        tower.init, jax.random.key(0), jnp.zeros((1, 224, 224, 3))
    )
    params = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), params)
    from reface_tpu.ckpt.convert import _clip_rule

    flat = _flatten_tree({"params": {"tower": params["params"]}})
    rng = np.random.default_rng(1)
    sd, vals = {}, {}
    for path, arr in flat.items():
        v = rng.normal(size=arr.shape).astype(np.float32)
        tkey, xform = _clip_rule(path)
        if "patch_embed" in path:
            sd[tkey] = v.transpose(3, 2, 0, 1)
        else:
            sd[tkey] = _inverse(v, path[-1])
        vals[path] = v
    out = convert_clip_vision(params, sd)
    out_flat = _flatten_tree({"params": {"tower": out["params"]}})
    for path in flat:
        np.testing.assert_allclose(out_flat[path], vals[path], err_msg=str(path))
