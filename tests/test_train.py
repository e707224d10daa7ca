"""Training-step tests: optimizer partition, eps-MSE step, full recon losses."""

import numpy as np
import jax
import jax.numpy as jnp

from reface_tpu.diffusion.losses import (
    ReconLossConfig,
    avg_pool_to,
    ddim_reconstruct,
    recon_timestep_seq,
)
from reface_tpu.core import DiffusionSchedule
from reface_tpu.pipelines.swap import FaceSwapper, tiny_swap_config
from reface_tpu.pipelines.train import (
    TrainConfig,
    make_train_step,
    trainable_labels,
)


def _batch(b, size, key=0):
    ks = jax.random.split(jax.random.key(key), 5)
    return dict(
        target_image=jax.random.uniform(ks[0], (b, size, size, 3), minval=-1, maxval=1),
        inpaint_image=jax.random.uniform(ks[1], (b, size, size, 3), minval=-1, maxval=1),
        inpaint_mask=(jax.random.uniform(ks[2], (b, size, size, 1)) > 0.5).astype(
            jnp.float32
        ),
        ref_clip224=jax.random.normal(ks[3], (b, 224, 224, 3)),
        landmarks=jax.random.uniform(ks[4], (b, 136)) * size,
    )


def test_recon_timestep_seq_matches_reference_semantics():
    # t_new=999, k=4: skip=(998)//4=249 -> [1,250,499,748] -> flipped
    assert recon_timestep_seq(999, 4) == [748, 499, 250, 1]
    # small t_new: skip clamps to 1, range(1, t_new-1) truncated to k
    assert recon_timestep_seq(5, 4) == [3, 2, 1]


def test_avg_pool_to():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    out = avg_pool_to(x, 2)
    np.testing.assert_allclose(
        np.asarray(out[0, :, :, 0]), [[2.5, 4.5], [10.5, 12.5]]
    )


def test_trainable_labels_partition():
    cfg = tiny_swap_config(image_size=64)
    params = FaceSwapper.init_params(cfg, jax.random.key(0))
    params["lpips"] = {"params": {"lin0": {"kernel": jnp.zeros((1, 1, 4, 1))}}}
    labels = trainable_labels(params)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]

    def label_for(substr):
        return {
            "/".join(str(k) for k in path): v
            for path, v in flat
            if substr in "/".join(str(getattr(k, "key", k)) for k in path)
        }

    joined = {
        "/".join(str(getattr(k, "key", k)) for k in path): v for path, v in flat
    }
    assert all(v == "train" for k, v in joined.items() if k.startswith("unet"))
    assert all(v == "freeze" for k, v in joined.items() if k.startswith("vae"))
    assert all(v == "freeze" for k, v in joined.items() if k.startswith("lpips"))
    assert all(v == "freeze" for k, v in joined.items() if "face_id" in k)
    assert all(v == "freeze" for k, v in joined.items() if "tower" in k)
    assert all(v == "train" for k, v in joined.items() if "mapper2" in k)
    assert all(
        v == "train" for k, v in joined.items() if "proj_out_source" in k
    )
    assert any(v == "train" for k, v in joined.items() if "learnable_vector" in k)


def test_ddim_reconstruct_oracle():
    """With the true-eps oracle, the recon recovers x0 from t=999."""
    sched = DiffusionSchedule.create()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    x_noisy = sched.q_sample(x0, jnp.array([999, 999]), e)
    rest = jnp.zeros((2, 8, 8, 5))
    unet_fn = lambda x9, t, c: e
    preds, x_final = ddim_reconstruct(
        unet_fn, x_noisy, rest, jnp.zeros((2, 1, 8)), sched, k=4
    )
    assert len(preds) == 3  # [initial latent, first pred, last pred]
    np.testing.assert_array_equal(np.asarray(preds[0]), np.asarray(x_noisy))
    # sample_train semantics: x is noised at t=999 but the first step uses the
    # k-step table alpha (t=751), so pred_x0 = s*x0 + c*e with
    # s = sqrt(acp999/acp751), c = (sqrt(1-acp999)-sqrt(1-acp751))/sqrt(acp751)
    # — and with a constant-eps oracle every later pred equals the first.
    acp = np.asarray(sched.alphas_cumprod, np.float64)
    a999, a751 = acp[999], acp[751]
    s = np.sqrt(a999 / a751)
    cshift = (np.sqrt(1 - a999) - np.sqrt(1 - a751)) / np.sqrt(a751)
    expect = s * np.asarray(x0) + cshift * np.asarray(e)
    np.testing.assert_allclose(np.asarray(preds[1]), expect, atol=2e-4)
    np.testing.assert_allclose(np.asarray(preds[2]), expect, atol=2e-4)


def test_train_step_eps_only_updates_trainables():
    cfg = tiny_swap_config(image_size=64, ddim_steps=2)
    tcfg = TrainConfig(warmup_steps=5)
    params = FaceSwapper.init_params(cfg, jax.random.key(0))
    step, loss_fn, init_state = make_train_step(cfg, tcfg)
    state = init_state(params)
    batch = _batch(2, 64)
    new_state, metrics = jax.jit(step)(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    # frozen VAE unchanged; trainable unet conv changed
    old_vae = jax.tree.leaves(state.params["vae"])[0]
    new_vae = jax.tree.leaves(new_state.params["vae"])[0]
    np.testing.assert_array_equal(np.asarray(old_vae), np.asarray(new_vae))
    old_unet = np.concatenate(
        [np.ravel(x) for x in jax.tree.leaves(state.params["unet"])]
    )
    new_unet = np.concatenate(
        [np.ravel(x) for x in jax.tree.leaves(new_state.params["unet"])]
    )
    assert np.abs(old_unet - new_unet).max() > 0


def test_train_state_full_resume_roundtrip(tmp_path):
    """save_train_state/load_train_state restore params + optimizer state +
    step + EMA exactly (resume_from_checkpoint parity)."""
    from reface_tpu.ckpt.io import load_train_state, save_train_state

    cfg = tiny_swap_config(image_size=64, ddim_steps=2)
    tcfg = TrainConfig(warmup_steps=5, ema_decay=0.99)
    params = FaceSwapper.init_params(cfg, jax.random.key(0))
    step, _, init_state = make_train_step(cfg, tcfg)
    state = init_state(params)
    batch = _batch(2, 64)
    state, _ = jax.jit(step)(state, batch, jax.random.key(1))
    state, _ = jax.jit(step)(state, batch, jax.random.key(2))

    path = str(tmp_path / "ckpt")
    save_train_state(path, jax.device_get(state), int(state.step))

    fresh = init_state(FaceSwapper.init_params(cfg, jax.random.key(7)))
    restored = load_train_state(path, fresh)
    assert int(restored.step) == 2
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert restored.ema is not None
    for a, b in zip(jax.tree.leaves(state.ema), jax.tree.leaves(restored.ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # stepping the restored state continues identically
    s1, m1 = jax.jit(step)(state, batch, jax.random.key(3))
    s2, m2 = jax.jit(step)(restored, batch, jax.random.key(3))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)


def test_landmark_conditioning_in_train_batch():
    """cli/train.py wires get_landmarks parity (ddpm.py:1206): the GT batch
    gets a (B,136) landmark column at image-size scale via LandmarkNet."""
    from reface_tpu.nn.landmarks import (
        LandmarkNet,
        LandmarkNetConfig,
        landmark_fn_from_net,
    )

    net = LandmarkNet(LandmarkNetConfig(widths=(8, 16, 32, 32), input_size=64,
                                        dtype=jnp.float32))
    lm_params = net.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    image_size = 64
    fn = landmark_fn_from_net(net, lm_params, image_size)

    batch = _batch(2, image_size)
    lm = np.asarray(fn(batch["target_image"]))
    assert lm.shape == (2, 136)
    assert lm.min() >= 0 and lm.max() <= image_size

    # the train step consumes the landmark column (conditioning fusion)
    cfg = tiny_swap_config(image_size=image_size, ddim_steps=2)
    tcfg = TrainConfig(warmup_steps=5)
    params = FaceSwapper.init_params(cfg, jax.random.key(0))
    step, _, init_state = make_train_step(cfg, tcfg)
    state = init_state(params)
    batch["landmarks"] = jnp.asarray(lm)
    _, metrics = jax.jit(step)(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))


def test_train_step_landmark_aux_loss():
    """Landmark_loss_weight>0 path (ddpm.py:1691-1693, 1799-1803): the aux
    head trains on MSE vs batch landmarks, sharing the eps-MSE forward."""
    from reface_tpu.nn.landmarks import LandmarkAuxHead
    from reface_tpu.nn.lpips import LPIPS
    from reface_tpu.nn.unet import UNetModel

    cfg = tiny_swap_config(image_size=64, ddim_steps=2)
    tcfg = TrainConfig(warmup_steps=5)
    recon = ReconLossConfig(ddim_steps=2, lpips_scales=(1,),
                            landmark_weight=0.5)
    params = FaceSwapper.init_params(cfg, jax.random.key(0))
    x = jnp.zeros((1, 64, 64, 3))
    params["lpips"] = LPIPS().init(jax.random.key(1), x, x)

    latent = cfg.latent_size
    _, feat_shapes = jax.eval_shape(
        lambda p: UNetModel(cfg.unet).apply(
            p, jnp.zeros((1, latent, latent, 9)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 1, cfg.conditioner.context_dim)),
            return_features=True,
        ),
        params["unet"],
    )
    i0 = min(9, len(feat_shapes) - 2)
    f0, f1 = feat_shapes[i0], feat_shapes[i0 + 1]
    feat0 = jnp.zeros((1, f0.shape[1], f0.shape[2],
                       f0.shape[-1] + f1.shape[-1]))
    params["landmark_head"] = LandmarkAuxHead().init(jax.random.key(2), feat0)

    step, _, init_state = make_train_step(cfg, tcfg, recon=recon)
    state = init_state(params)
    batch = _batch(2, 64)
    new_state, metrics = jax.jit(step)(state, batch, jax.random.key(3))
    assert "loss_landmark" in metrics
    assert np.isfinite(float(metrics["loss_landmark"]))
    # aux head receives gradients
    old = np.concatenate([np.ravel(x) for x in
                          jax.tree.leaves(state.params["landmark_head"])])
    new = np.concatenate([np.ravel(x) for x in
                          jax.tree.leaves(new_state.params["landmark_head"])])
    assert np.abs(old - new).max() > 0


def test_train_step_full_losses():
    from reface_tpu.nn.lpips import LPIPS

    cfg = tiny_swap_config(image_size=64, ddim_steps=2)
    tcfg = TrainConfig(warmup_steps=5)
    recon = ReconLossConfig(ddim_steps=2, lpips_scales=(1, 2))
    params = FaceSwapper.init_params(cfg, jax.random.key(0))
    lpips = LPIPS()
    x = jnp.zeros((1, 64, 64, 3))
    params["lpips"] = lpips.init(jax.random.key(1), x, x)
    step, loss_fn, init_state = make_train_step(cfg, tcfg, recon=recon)
    state = init_state(params)
    batch = _batch(2, 64)
    new_state, metrics = jax.jit(step)(state, batch, jax.random.key(2))
    for k in ("loss_simple", "id_loss", "lpips_loss", "loss"):
        assert k in metrics and np.isfinite(float(metrics[k])), k


def test_split_grad_step_matches_monolith():
    """split_grad=True (two programs: recon-grad, then eps-grad+sum+update)
    must produce the SAME post-step state as the monolithic step — gradients
    of sums are sums of gradients over identical inputs."""
    from reface_tpu.nn.lpips import LPIPS

    cfg = tiny_swap_config(image_size=64, ddim_steps=2)
    recon = ReconLossConfig(ddim_steps=2, lpips_scales=(1,))
    params = FaceSwapper.init_params(cfg, jax.random.key(0))
    x = jnp.zeros((1, 64, 64, 3))
    params["lpips"] = LPIPS().init(jax.random.key(1), x, x)
    batch = _batch(2, 64)
    key = jax.random.key(7)

    step_m, _, init_m = make_train_step(
        cfg, TrainConfig(warmup_steps=5), recon=recon
    )
    assert not getattr(step_m, "precompiled", False)
    state_m = init_m(params)
    new_m, met_m = jax.jit(step_m)(state_m, batch, key)

    for level in (1, 2):
        step_s, _, init_s = make_train_step(
            cfg, TrainConfig(warmup_steps=5, split_grad=level), recon=recon
        )
        assert getattr(step_s, "precompiled", False)  # callers must not re-jit
        # fresh param buffers: the split step DONATES the incoming state
        state_s = init_s(jax.tree.map(lambda x: jnp.array(x), params))
        new_s, met_s = step_s(state_s, batch, key)

        assert set(met_m) == set(met_s), level
        for k in met_m:
            np.testing.assert_allclose(
                float(met_m[k]), float(met_s[k]), rtol=2e-5, atol=1e-6,
                err_msg=f"split={level} {k}",
            )
        flat_m = jax.tree.leaves(new_m.params["unet"])
        flat_s = jax.tree.leaves(new_s.params["unet"])
        for a, b in zip(flat_m, flat_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)


def test_resolve_train_swap_cfg_forces_remat():
    """cli/train.py builds the default (inference) SwapConfig — remat=False,
    attn auto. Training must flip UNet+VAE remat on (the unremat'd recon
    pullback measured 11.53G of XLA temps -> OOM on a 16G v5e) and route
    attention through the differentiable flash path. force_unet_remat=False
    is the bench_train_step --no-remat bisection escape hatch."""
    from reface_tpu.diffusion.losses import ReconLossConfig
    from reface_tpu.pipelines.swap import SwapConfig
    from reface_tpu.pipelines.train import TrainConfig, resolve_train_swap_cfg

    base = SwapConfig()
    assert not base.unet.remat  # inference default this test guards against

    r = resolve_train_swap_cfg(base, TrainConfig(), ReconLossConfig())
    assert r.unet.remat and r.vae.remat
    assert r.unet.attn_impl == "flash"

    # eps-only training still remats the UNet (matches the measured
    # 159.4 ms/step config), but leaves the un-differentiated VAE alone
    r = resolve_train_swap_cfg(base, TrainConfig(), None)
    assert r.unet.remat and not r.vae.remat

    # escape hatch honors the caller's explicit remat=False
    r = resolve_train_swap_cfg(
        base, TrainConfig(force_unet_remat=False), None)
    assert not r.unet.remat


def test_cli_train_resume_frees_init_params(tmp_path):
    """CLI-level resume: a fresh tiny run checkpoints, a second process
    restores it and continues. Exercises the cli/train.py resume branch
    that frees the fresh-init device params after a successful full-state
    restore — on the 16G chip the leaked init fp32 params (3.4G) plus the
    uploaded restored state put the first resumed step over HBM
    (RESOURCE_EXHAUSTED, observed round 4); `.delete()` semantics are
    identical on the CPU backend so this guards the code path."""
    import os
    import subprocess
    import sys

    from reface_tpu.data.synthetic import make_synthetic_celeba

    data = str(tmp_path / "data")
    make_synthetic_celeba(data, 0, 3, size=64)
    logdir = str(tmp_path / "run")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # The suite's conftest exports an 8-virtual-device CPU topology; batch 1
    # doesn't divide an 8-way data axis (the loader would drop every batch
    # and the run would no-op at step 0). Pin the subprocess to 1 device.
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    base = [sys.executable, "-m", "reface_tpu.cli.train",
            "--backend", "cpu", "--tiny", "--image-size", "64",
            "--dataset-dir", data, "--logdir", logdir,
            "--batch-size", "1", "--train-count", "3",
            "--log-every", "1", "--image-log-every", "1000000",
            "--epochs", "100"]
    r1 = subprocess.run(base + ["--steps", "2", "--ckpt-every", "2"],
                        capture_output=True, text=True, env=env, timeout=900)
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert os.path.isdir(os.path.join(logdir, "checkpoints", "last"))

    r2 = subprocess.run(
        base + ["--steps", "3", "--ckpt-every", "1000",
                "--resume", os.path.join(logdir, "checkpoints", "last")],
        capture_output=True, text=True, env=env, timeout=900)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "resumed FULL train state at step 2" in r2.stdout
    assert "done at step 3" in r2.stdout
