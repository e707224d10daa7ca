"""Config front-end (core/config wired into the CLIs) + VAE tiling flag."""

import argparse
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from reface_tpu.cli.common import (
    add_model_args,
    apply_config_node,
    default_inpaint_mask,
    resolve_swap_config,
)
from reface_tpu.pipelines.swap import FaceSwapper, SwapConfig, tiny_swap_config


def _args(extra=()):
    ap = argparse.ArgumentParser()
    add_model_args(ap)
    return ap.parse_args(list(extra))


def test_resolve_swap_config_yaml_and_overrides(tmp_path):
    """main.py:504-506 parity: base YAMLs merged left-to-right, then dotlist
    overrides, then explicit CLI flags."""
    y1 = tmp_path / "base.yaml"
    y1.write_text("swap:\n  ddim_steps: 30\n  cfg_scale: 2.5\n")
    y2 = tmp_path / "over.yaml"
    y2.write_text("swap:\n  cfg_scale: 4.0\n")

    cfg = resolve_swap_config(_args(["--config", str(y1)]))
    assert cfg.ddim_steps == 30 and cfg.cfg_scale == 2.5

    # right-most YAML wins
    cfg = resolve_swap_config(_args(["--config", str(y1), str(y2)]))
    assert cfg.cfg_scale == 4.0

    # dotlist override wins over YAML
    cfg = resolve_swap_config(
        _args(["--config", str(y1), "--overrides", "swap.cfg_scale=5.0"])
    )
    assert cfg.cfg_scale == 5.0

    # explicit CLI flag wins over everything
    cfg = resolve_swap_config(
        _args(["--config", str(y1), "--ddim-steps", "25"])
    )
    assert cfg.ddim_steps == 25

    # nested dataclass node
    cfg = resolve_swap_config(
        _args(["--overrides", "swap.unet.model_channels=64",
               "swap.vae_tile=4"])
    )
    assert cfg.unet.model_channels == 64 and cfg.vae_tile == 4


def test_resolve_swap_config_bare_fields_and_sections(tmp_path):
    """Bare top-level SwapConfig fields, sectioned schemas, and mixed
    bare-YAML + swap.* dotlists all resolve; train:/recon: sections are
    ignored by the swap resolver."""
    y = tmp_path / "bare.yaml"
    y.write_text("ddim_steps: 30\ntrain:\n  learning_rate: 2.0e-5\n")
    cfg = resolve_swap_config(_args(["--config", str(y)]))
    assert cfg.ddim_steps == 30  # bare field applied, train: ignored

    cfg = resolve_swap_config(
        _args(["--config", str(y), "--overrides", "swap.cfg_scale=5.0"])
    )
    assert cfg.ddim_steps == 30 and cfg.cfg_scale == 5.0

    # nested partial node overlays the INSTANCE, not class defaults
    cfg = resolve_swap_config(
        _args(["--tiny", "--overrides", "swap.unet.model_channels=8"])
    )
    assert cfg.unet.model_channels == 8
    assert cfg.unet.channel_mult == (1, 2)  # tiny base preserved

    # explicit steps honored under --tiny (no silent cap)
    cfg = resolve_swap_config(_args(["--tiny", "--ddim-steps", "8"]))
    assert cfg.ddim_steps == 8
    # serving flags apply under --tiny too
    cfg = resolve_swap_config(_args(["--tiny", "--attn", "einsum"]))
    assert cfg.unet.attn_impl == "einsum"


def test_apply_config_node_tuple_coercion():
    cfg = apply_config_node(SwapConfig(), {"ddim_steps": 10})
    assert cfg.ddim_steps == 10
    cfg2 = apply_config_node(
        SwapConfig(), {"unet": {"channel_mult": [1, 2]}}
    )
    assert cfg2.unet.channel_mult == (1, 2)


def test_default_inpaint_mask_shape():
    m = default_inpaint_mask(64)
    assert m.shape == (64, 64, 1)
    assert m[0, 0, 0] == 1.0  # corners kept
    assert m[35, 32, 0] == 0.0  # center inpainted


def test_vae_tiling_flag_runs_swap():
    """split_input_params parity (ddpm.py:1286-1434): with vae_tile set the
    VAE encode/decode run as overlapping border-weighted tiles."""
    base = tiny_swap_config(image_size=64, ddim_steps=2)
    cfg = dataclasses.replace(base, vae_tile=4, vae_tile_stride=2)
    params = FaceSwapper.init_params(cfg, jax.random.key(0))
    sw = FaceSwapper(cfg, params)
    ks = jax.random.split(jax.random.key(1), 4)
    out = sw.swap(
        target_image=jax.random.uniform(ks[0], (1, 64, 64, 3), minval=-1, maxval=1),
        inpaint_image=jax.random.uniform(ks[1], (1, 64, 64, 3), minval=-1, maxval=1),
        inpaint_mask=jnp.ones((1, 64, 64, 1)),
        ref_clip224=jax.random.normal(ks[2], (1, 224, 224, 3)),
        key=ks[3],
    )
    assert out.shape == (1, 64, 64, 3)
    assert bool(jnp.isfinite(out).all())

    # tiled vs untiled decode agree away from tile borders (the interior of
    # each tile sees the same receptive field)
    sw0 = FaceSwapper(base, params)
    z = jax.random.normal(jax.random.key(9), (1, 8, 8, 4))
    d_tiled = np.asarray(sw.decode_latent(params, z))
    d_full = np.asarray(sw0.decode_latent(params, z))
    assert d_tiled.shape == d_full.shape
    assert np.isfinite(d_tiled).all()


def test_dpm_sampler_defaults_to_lam_uniform_grid():
    """ADVICE r3: --sampler dpm without --discretize should get the
    lam-uniform grid the 2M error analysis assumes; an explicit
    --discretize and non-dpm samplers keep their values."""
    cfg = resolve_swap_config(_args(["--sampler", "dpm"]))
    assert cfg.sampler == "dpm" and cfg.ddim_discretize == "lam_uniform"
    cfg = resolve_swap_config(
        _args(["--sampler", "dpm", "--discretize", "uniform"])
    )
    assert cfg.ddim_discretize == "uniform"
    cfg = resolve_swap_config(_args([]))
    assert cfg.ddim_discretize == "uniform"
    # the default must also fire when the sampler comes from --overrides /
    # YAML rather than the CLI flag (round-4 review finding)
    cfg = resolve_swap_config(_args(["--overrides", "sampler=dpm"]))
    assert cfg.sampler == "dpm" and cfg.ddim_discretize == "lam_uniform"


def test_deterministic_samplers_reject_eta():
    """ADVICE r3: dpm/plms silently ignored cfg.eta; now a loud error."""
    import pytest

    for sampler in ("dpm", "plms"):
        cfg = dataclasses.replace(
            tiny_swap_config(image_size=64, ddim_steps=2),
            sampler=sampler, eta=0.5,
        )
        with pytest.raises(ValueError, match="deterministic"):
            FaceSwapper(cfg, {})


def test_unet_tiling_runs_swap():
    """split_input_params UNet-apply parity (ddpm.py:1530-1608): with
    unet_tile set, eps prediction runs as ONE batched UNet call over
    overlapping latent tiles (same crossattn cond per tile) folded with
    border weights. Sanity: single-tile configs (tile >= latent) are
    bitwise the untiled path, and the pipeline stays finite end-to-end."""
    base = tiny_swap_config(image_size=64, ddim_steps=2)
    cfg = dataclasses.replace(base, unet_tile=4, unet_tile_stride=2)
    params = FaceSwapper.init_params(cfg, jax.random.key(0))
    # SD zero-inits the residual-gate kernels (out_conv, proj_out) — at
    # random init those zeros disconnect the transformer blocks, making the
    # context-perturbation assertion below vacuously fail. Fill all-zero
    # kernels with small noise (same recipe as tools/compare_modes.py).
    cnt = [0]

    def _fill(x):
        if x.ndim >= 2 and not np.any(np.asarray(x)):
            cnt[0] += 1
            return 0.05 * jax.random.normal(jax.random.key(cnt[0]),
                                            x.shape, x.dtype)
        return x

    params = jax.tree.map(_fill, params)
    assert cnt[0] > 0
    sw = FaceSwapper(cfg, params)
    ks = jax.random.split(jax.random.key(1), 4)
    out = sw.swap(
        target_image=jax.random.uniform(ks[0], (1, 64, 64, 3), minval=-1, maxval=1),
        inpaint_image=jax.random.uniform(ks[1], (1, 64, 64, 3), minval=-1, maxval=1),
        inpaint_mask=jnp.ones((1, 64, 64, 1)),
        ref_clip224=jax.random.normal(ks[2], (1, 224, 224, 3)),
        key=ks[3],
    )
    assert out.shape == (1, 64, 64, 3)
    assert bool(jnp.isfinite(out).all())

    # direct eps check: tiled vs untiled agree in shape + finiteness; a
    # tile covering the whole latent short-circuits to the untiled path
    sw0 = FaceSwapper(base, params)
    x9 = jax.random.normal(jax.random.key(7), (2, 8, 8, 9))
    t = jnp.array([500, 100], jnp.int32)
    ctx = jax.random.normal(jax.random.key(8), (2, 1, 768))
    e_tiled = np.asarray(sw.unet_eps(params, x9, t, ctx))
    e_full = np.asarray(sw0.unet_eps(params, x9, t, ctx))
    assert e_tiled.shape == e_full.shape == (2, 8, 8, 4)
    assert np.isfinite(e_tiled).all()
    big = dataclasses.replace(base, unet_tile=8)
    e_big = np.asarray(
        FaceSwapper(big, params).unet_eps(params, x9, t, ctx)
    )
    np.testing.assert_array_equal(e_big, e_full)

    # tile-major cond broadcast: a per-sample context perturbation moves
    # only that sample's tiled eps (catches a (B,n) vs (n,B) tile mixup)
    ctx2 = ctx.at[1].add(5.0)
    e2 = np.asarray(sw.unet_eps(params, x9, t, ctx2))
    np.testing.assert_array_equal(e2[0], e_tiled[0])
    assert np.abs(e2[1] - e_tiled[1]).max() > 1e-6
