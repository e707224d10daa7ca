"""stochastic_encode, prior starts, guided DDIM, video dataset, FF pairs."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from reface_tpu.core import DDIMTables, DiffusionSchedule
from reface_tpu.diffusion.ddim import stochastic_encode
from reface_tpu.diffusion.ddim_guided import guided_ddim_sample
from reface_tpu.pipelines import FaceSwapper, tiny_swap_config


def test_stochastic_encode_table_alphas():
    sched = DiffusionSchedule.create()
    tabs = DDIMTables.create(sched, 10)
    x0 = jnp.ones((2, 4, 4, 4))
    t = jnp.array([0, 9])
    out = stochastic_encode(x0, t, tabs, jax.random.key(0))
    assert out.shape == x0.shape
    # mean scales by sqrt(alpha_t); check magnitudes ordered correctly
    a = np.sqrt(np.asarray(tabs.alphas))
    m0 = float(jnp.mean(out[0]))
    m1 = float(jnp.mean(out[1]))
    assert abs(m0 - a[0]) < 0.5 and abs(m1 - a[9]) < 0.5
    assert m0 > m1  # later t = noisier = smaller signal


def test_swap_with_prior_start():
    cfg = tiny_swap_config(image_size=64, ddim_steps=2)
    params = FaceSwapper.init_params(cfg, jax.random.key(0))
    sw = FaceSwapper(cfg, params)
    ks = jax.random.split(jax.random.key(3), 5)
    b = dict(
        target_image=jax.random.uniform(ks[0], (1, 64, 64, 3), minval=-1, maxval=1),
        inpaint_image=jax.random.uniform(ks[1], (1, 64, 64, 3), minval=-1, maxval=1),
        inpaint_mask=jnp.ones((1, 64, 64, 1)),
        ref_clip224=jax.random.normal(ks[2], (1, 224, 224, 3)),
    )
    prior = jax.random.uniform(ks[3], (1, 64, 64, 3), minval=-1, maxval=1)
    o1 = sw.swap(**b, key=jax.random.key(1), prior_image=prior)
    o2 = sw.swap(**b, key=jax.random.key(1))
    assert o1.shape == o2.shape == (1, 64, 64, 3)
    assert float(jnp.abs(o1 - o2).max()) > 0  # prior start changes the chain


def test_guided_ddim_moves_toward_lower_loss():
    sched = DiffusionSchedule.create()
    tabs = DDIMTables.create(sched, 5)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
    x_T = jnp.sqrt(tabs.alphas[-1]) * x0 + jnp.sqrt(1 - tabs.alphas[-1]) * e
    model_fn = lambda x9, t, c: jnp.broadcast_to(e, x9.shape[:3] + (4,))
    target = jnp.full_like(x0, 2.0)
    loss_fn = lambda pred, t: jnp.mean((pred - target) ** 2)
    rest_z = jnp.zeros_like(x0)
    mask = jnp.zeros(x0.shape[:3] + (1,))
    base = guided_ddim_sample(model_fn, loss_fn, x_T, jnp.zeros((1, 1, 8)),
                              None, rest_z, mask, tabs, cfg_scale=1.0,
                              guidance_scale=0.0)
    guided = guided_ddim_sample(model_fn, loss_fn, x_T, jnp.zeros((1, 1, 8)),
                                None, rest_z, mask, tabs, cfg_scale=1.0,
                                guidance_scale=20.0)
    l_base = float(jnp.mean((base - target) ** 2))
    l_guided = float(jnp.mean((guided - target) ** 2))
    assert l_guided < l_base


def test_video_frames_dataset(tmp_path):
    import cv2

    from reface_tpu.data.video import VideoFramesConfig, VideoFramesDataset

    fdir = tmp_path / "frames"
    mdir = tmp_path / "masks"
    fdir.mkdir()
    mdir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        img = rng.integers(0, 255, (64, 64, 3), np.uint8)
        mask = np.zeros((64, 64), np.uint8)
        mask[16:48, 16:48] = 6  # skin in seg12
        cv2.imwrite(str(fdir / f"{i:04d}.png"), img)
        cv2.imwrite(str(mdir / f"{i:04d}.png"), mask)
    ds = VideoFramesDataset(VideoFramesConfig(str(fdir), str(mdir), image_size=64))
    assert len(ds) == 3
    it = ds[0]
    assert it["target_image"].shape == (64, 64, 3)
    # skin class 6 is in the default remove list -> inpaint region exists
    assert (it["inpaint_mask"] == 0).any()


def test_ff_pairs_file(tmp_path):
    from reface_tpu.data.test_bench import TestBenchConfig

    (tmp_path / "pairs.txt").write_text("7 12\n3 4\n")
    cfg = TestBenchConfig(dataset_dir=str(tmp_path), dataset="ff", num_pairs=10)
    assert cfg.pair_ids() == [(7, 12), (3, 4)]
    assert cfg.img_path(7).endswith("images/00007.png")


def test_adaptive_avg_pool2d_torch_parity():
    import pytest

    torch = pytest.importorskip("torch")
    from reface_tpu.ops.pooling import adaptive_avg_pool2d

    rng = np.random.default_rng(0)
    for (h, w, oh, ow) in [(224, 224, 256, 256), (188, 188, 112, 112),
                           (7, 9, 3, 5)]:
        x = rng.normal(size=(2, h, w, 3)).astype(np.float32)
        ref = torch.nn.functional.adaptive_avg_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), (oh, ow)
        ).numpy()
        out = adaptive_avg_pool2d(jnp.asarray(x), oh, ow)
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref, atol=2e-5,
            err_msg=f"{h}x{w}->{oh}x{ow}",
        )


def test_resize_no_antialias_torch_parity():
    import pytest

    torch = pytest.importorskip("torch")
    from reface_tpu.ops.resize import resize_bilinear_no_aa

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 512, 512, 1)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), (64, 64), mode="bilinear",
        align_corners=False, antialias=False,
    ).numpy()
    out = resize_bilinear_no_aa(jnp.asarray(x), 64, 64)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5
    )
    # and that it differs from jax's antialiased resize (the old behavior)
    aa = jax.image.resize(jnp.asarray(x), (2, 64, 64, 1), "bilinear")
    assert float(jnp.abs(aa - out).max()) > 0.01
