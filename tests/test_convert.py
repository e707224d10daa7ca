"""Checkpoint-converter tests.

1. Roundtrip/structural: synthesize a torch state_dict by inverting the
   conversion rules over OUR param tree, convert, and check every leaf lands
   with the right value (catches key-mapping and layout bugs).
2. Activation parity: torch primitive layers (Conv2d NCHW, Linear, GroupNorm,
   BatchNorm eval, PReLU) vs our flax equivalents on the same weights.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from reface_tpu.ckpt.convert import (
    _flatten_tree,
    _unet_rule,
    _vae_rule,
    _arcface_rule,
    convert_arcface,
    convert_unet,
    convert_vae,
)
from reface_tpu.nn import ArcFaceConfig, AutoencoderKL, IRSE50, UNetConfig, UNetModel, VAEConfig

F32 = jnp.float32


def _inverse_xform(flax_arr, leaf, torch_shape_hint=None):
    """flax param -> torch tensor such that forward conversion reproduces it."""
    a = np.asarray(flax_arr)
    if leaf == "kernel" and a.ndim == 2:
        return a.T
    if leaf == "kernel" and a.ndim == 4:
        return a.transpose(3, 2, 0, 1)
    return a


def _synth_and_check(flax_params, rule, convert_fn):
    flat = _flatten_tree(flax_params)
    torch_sd = {}
    rng = np.random.default_rng(0)
    values = {}
    for path, leaf_arr in flat.items():
        vals = rng.normal(size=leaf_arr.shape).astype(np.float32)
        values[path] = vals
        tkey, _ = rule(path)
        torch_sd[tkey] = _inverse_xform(vals, path[-1])
    out = convert_fn({"params": flax_params["params"]}, torch_sd)
    out_flat = _flatten_tree(out)
    assert set(out_flat) == set(flat)
    for path in flat:
        np.testing.assert_allclose(out_flat[path], values[path], err_msg=str(path))


def test_unet_converter_roundtrip():
    cfg = UNetConfig(model_channels=32, num_heads=4, channel_mult=(1, 2),
                     attention_resolutions=(1, 2), dtype=F32)
    m = UNetModel(cfg)
    params = jax.eval_shape(
        m.init, jax.random.key(0), jnp.zeros((1, 16, 16, 9)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 1, 768)),
    )
    params = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), params)
    _synth_and_check(params, _unet_rule, convert_unet)


def test_vae_converter_roundtrip():
    cfg = VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1, dtype=F32)
    vae = AutoencoderKL(cfg)
    params = jax.eval_shape(vae.init, jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    params = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), params)
    _synth_and_check(params, _vae_rule, convert_vae)


def test_arcface_converter_roundtrip_structure():
    cfg = ArcFaceConfig(dtype=F32)  # full block layout (depths 64..512)
    m = IRSE50(cfg)
    params = jax.eval_shape(m.init, jax.random.key(0), jnp.zeros((1, 112, 112, 3)))
    params = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), params)
    flat = _flatten_tree(params)
    # output_fc kernel uses the NCHW-flatten permutation; exclude from the
    # naive inverse and check it separately below.
    rng = np.random.default_rng(1)
    torch_sd, values = {}, {}
    for path, leaf_arr in flat.items():
        vals = rng.normal(size=leaf_arr.shape).astype(np.float32)
        tkey, _ = _arcface_rule(path)
        if path[-2:] == ("output_fc", "kernel"):
            # construct torch weight whose NCHW->NHWC conversion == vals
            w = vals.T.reshape(512, 7, 7, 512).transpose(0, 3, 1, 2).reshape(512, -1)
            torch_sd[tkey] = w
        else:
            torch_sd[tkey] = _inverse_xform(vals, path[-1])
        values[path] = vals
    out = _flatten_tree(convert_arcface({"params": params["params"]}, torch_sd))
    for path in flat:
        np.testing.assert_allclose(out[path], values[path], err_msg=str(path))


# ---------------- torch layer parity ----------------

torch = pytest.importorskip("torch")


def test_conv_layout_parity():
    from reface_tpu.ckpt.convert import _conv_kernel
    from flax import linen as nn

    tconv = torch.nn.Conv2d(3, 8, 3, padding=1)
    x = np.random.default_rng(0).normal(size=(2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()

    fconv = nn.Conv(8, (3, 3), padding=1)
    params = {
        "params": {
            "kernel": jnp.asarray(_conv_kernel(tconv.weight.detach().numpy())),
            "bias": jnp.asarray(tconv.bias.detach().numpy()),
        }
    }
    out = fconv.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5
    )


def test_strided_conv_asymmetric_padding_parity():
    """SD VAE downsample: torch pad (0,1,0,1) + stride-2 VALID conv."""
    from reface_tpu.ckpt.convert import _conv_kernel

    tconv = torch.nn.Conv2d(4, 4, 3, stride=2, padding=0)
    x = np.random.default_rng(1).normal(size=(1, 4, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.nn.functional.pad(torch.from_numpy(x), (0, 1, 0, 1))).numpy()

    from flax import linen as nn

    xx = jnp.pad(jnp.asarray(x.transpose(0, 2, 3, 1)), ((0, 0), (0, 1), (0, 1), (0, 0)))
    fconv = nn.Conv(4, (3, 3), strides=2, padding="VALID")
    params = {"params": {
        "kernel": jnp.asarray(_conv_kernel(tconv.weight.detach().numpy())),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }}
    out = fconv.apply(params, xx)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_groupnorm_parity():
    from reface_tpu.nn.layers import GroupNorm32

    tnorm = torch.nn.GroupNorm(4, 16)
    with torch.no_grad():
        tnorm.weight.copy_(torch.randn(16))
        tnorm.bias.copy_(torch.randn(16))
    x = np.random.default_rng(2).normal(size=(2, 16, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = tnorm(torch.from_numpy(x)).numpy()

    g = GroupNorm32(num_groups=4)
    params = {"params": {"GroupNorm_0": {
        "scale": jnp.asarray(tnorm.weight.detach().numpy()),
        "bias": jnp.asarray(tnorm.bias.detach().numpy()),
    }}}
    out = g.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-4)


def test_batchnorm_inference_parity():
    from reface_tpu.nn.arcface import BatchNormInference

    tbn = torch.nn.BatchNorm2d(8).eval()
    with torch.no_grad():
        tbn.weight.copy_(torch.randn(8))
        tbn.bias.copy_(torch.randn(8))
        tbn.running_mean.copy_(torch.randn(8))
        tbn.running_var.copy_(torch.rand(8) + 0.5)
    x = np.random.default_rng(3).normal(size=(2, 8, 4, 4)).astype(np.float32)
    with torch.no_grad():
        ref = tbn(torch.from_numpy(x)).numpy()

    bn = BatchNormInference(8)
    params = {"params": {
        "scale": jnp.asarray(tbn.weight.detach().numpy()),
        "bias": jnp.asarray(tbn.bias.detach().numpy()),
        "mean": jnp.asarray(tbn.running_mean.detach().numpy()),
        "var": jnp.asarray(tbn.running_var.detach().numpy()),
    }}
    out = bn.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_prelu_parity():
    from reface_tpu.nn.arcface import PReLU

    tp = torch.nn.PReLU(6)
    with torch.no_grad():
        tp.weight.copy_(torch.rand(6))
    x = np.random.default_rng(4).normal(size=(2, 6, 4, 4)).astype(np.float32)
    with torch.no_grad():
        ref = tp(torch.from_numpy(x)).numpy()
    p = PReLU(6)
    params = {"params": {"alpha": jnp.asarray(tp.weight.detach().numpy())}}
    out = p.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-6)


def test_nchw_flatten_linear_parity():
    """Linear over flattened NCHW in torch == our permuted kernel over NHWC."""
    from reface_tpu.ckpt.convert import _nchw_flat_linear_kernel

    lin = torch.nn.Linear(512 * 7 * 7, 512)
    x = np.random.default_rng(5).normal(size=(2, 512, 7, 7)).astype(np.float32)
    with torch.no_grad():
        ref = lin(torch.from_numpy(x).flatten(1)).numpy()
    kernel = _nchw_flat_linear_kernel(lin.weight.detach().numpy(), 512, 7, 7)
    x_nhwc = x.transpose(0, 2, 3, 1).reshape(2, -1)
    out = x_nhwc @ kernel + lin.bias.detach().numpy()
    np.testing.assert_allclose(out, ref, atol=1e-3)
