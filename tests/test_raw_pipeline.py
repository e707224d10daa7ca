"""RawSwapPipeline: detect -> align -> parse -> swap -> paste-back (tiny)."""

import numpy as np
import jax
import jax.numpy as jnp

from reface_tpu.pipelines import FaceSwapper, tiny_swap_config
from reface_tpu.pipelines.raw import RawSwapPipeline


def _tiny_raw_cfg():
    from reface_tpu.pipelines.raw import tiny_raw_config

    return tiny_raw_config()


def test_raw_pipeline_stages_and_end_to_end():
    swap_cfg = tiny_swap_config(image_size=64, ddim_steps=2)
    sw = FaceSwapper(swap_cfg, FaceSwapper.init_params(swap_cfg, jax.random.key(0)))
    pipe = RawSwapPipeline(sw, _tiny_raw_cfg())

    tgt = jax.random.uniform(jax.random.key(1), (2, 96, 96, 3))
    src = jax.random.uniform(jax.random.key(2), (2, 80, 80, 3))

    lm = pipe.detect_landmarks(tgt)
    assert lm.shape == (2, 68, 2)
    assert float(lm[..., 0].max()) <= 96 and float(lm.min()) >= 0

    crops, quads = pipe.align(tgt, lm)
    assert crops.shape == (2, 64, 64, 3) and quads.shape == (2, 4, 2)

    seg = pipe.parse(crops)
    assert seg.shape == (2, 64, 64) and seg.dtype == jnp.int32
    assert int(seg.max()) < 12  # seg12 vocabulary

    out = pipe.swap_images(tgt, src, key=jax.random.key(3))
    assert out.shape == tgt.shape
    assert bool(jnp.isfinite(out).all())
    assert float(out.min()) >= -1e-3 and float(out.max()) <= 1.001


def test_fused_raw_path_matches_eager():
    """swap_images_fused (one XLA program, the latency serving mode) must
    reproduce the eager stage-by-stage path: same ops, same order, only the
    dispatch granularity changes. Outputs agree to float-fusion tolerance
    (XLA picks different fusion boundaries inside one program, and ~1e-4
    landmark drift moves the align quad, which resamples a few pixels) —
    measured max |delta| 1.3e-3 on [0,1] images, 98.9% of pixels < 2e-5."""
    swap_cfg = tiny_swap_config(image_size=64, ddim_steps=2)
    sw = FaceSwapper(swap_cfg, FaceSwapper.init_params(swap_cfg, jax.random.key(0)))
    pipe = RawSwapPipeline(sw, _tiny_raw_cfg())

    tgt = jax.random.uniform(jax.random.key(1), (2, 96, 96, 3))
    src = jax.random.uniform(jax.random.key(2), (2, 80, 80, 3))

    eager = pipe.swap_images(tgt, src, key=jax.random.key(3))
    fused = pipe.swap_images_fused(tgt, src, key=jax.random.key(3))
    fused, eager = np.asarray(fused), np.asarray(eager)
    np.testing.assert_allclose(fused, eager, atol=5e-3, rtol=0)
    assert (np.abs(fused - eager) < 2e-5).mean() > 0.95


def test_fused_raw_captures_no_large_constants():
    """The fused program must take every param tree as a jit ARGUMENT:
    closure-capturing the swapper params bakes them into the lowered MLIR
    as dense constants (2.67G at real width), which broke the axon
    remote-compile upload (queue5 p50_fused: Broken pipe) and would bloat
    any AOT cache. Lower the tiny fused path with the captured-constants
    warning threshold dropped to 1MB and assert silence — even the tiny
    config's param trees exceed that if captured."""
    import warnings

    swap_cfg = tiny_swap_config(image_size=64, ddim_steps=2)
    sw = FaceSwapper(swap_cfg,
                     FaceSwapper.init_params(swap_cfg, jax.random.key(0)))
    pipe = RawSwapPipeline(sw, _tiny_raw_cfg())
    tgt = jax.random.uniform(jax.random.key(1), (1, 96, 96, 3))
    src = jax.random.uniform(jax.random.key(2), (1, 80, 80, 3))

    old = jax.config.jax_captured_constants_warn_bytes
    try:
        jax.config.update("jax_captured_constants_warn_bytes", 1024 * 1024)
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            out = pipe.swap_images_fused(tgt, src, key=jax.random.key(3))
            jax.block_until_ready(out)
        msgs = [str(w.message) for w in rec]
        assert not any("constants were captured" in m for m in msgs), msgs
    finally:
        jax.config.update("jax_captured_constants_warn_bytes", old)


def test_cli_swap_fused_raw_tiny(tmp_path):
    """`cli/swap.py --fused` (no --precropped) drives the raw path through
    RawSwapPipeline.swap_images_fused with the tiny raw config."""
    import pytest

    try:
        import cv2
    except ImportError:
        pytest.skip("cv2 absent")
    rng = np.random.default_rng(2)
    tdir, sdir, odir = tmp_path / "t", tmp_path / "s", tmp_path / "o"
    tdir.mkdir()
    sdir.mkdir()
    cv2.imwrite(str(tdir / "a.png"),
                rng.integers(0, 255, (96, 96, 3), np.uint8))
    cv2.imwrite(str(sdir / "b.png"),
                rng.integers(0, 255, (96, 96, 3), np.uint8))

    from reface_tpu.cli.swap import main

    main(["--target", str(tdir), "--source", str(sdir), "--outdir",
          str(odir), "--tiny", "--backend", "cpu", "--fused"])
    out = cv2.imread(str(odir / "b_a.png"))
    assert out is not None and out.shape == (96, 96, 3)


def test_conditioning_landmarks_are_in_crop_coords():
    """The landmarks fed to the swapper must be re-detected on the aligned
    crop at swap resolution (one_inference.py:717-726 -> ddpm.py:1068-1099),
    NOT the original-frame landmarks rescaled."""
    swap_cfg = tiny_swap_config(image_size=64, ddim_steps=2)
    sw = FaceSwapper(swap_cfg, FaceSwapper.init_params(swap_cfg, jax.random.key(0)))
    pipe = RawSwapPipeline(sw, _tiny_raw_cfg())

    captured = {}
    orig_swap = sw.swap

    def recording_swap(**kw):
        captured["landmarks"] = np.asarray(kw["landmarks"])
        return orig_swap(**kw)

    sw.swap = recording_swap
    tgt = jax.random.uniform(jax.random.key(1), (2, 96, 96, 3))
    src = jax.random.uniform(jax.random.key(2), (2, 80, 80, 3))
    pipe.swap_images(tgt, src, key=jax.random.key(3))

    size = swap_cfg.image_size
    t_lm = pipe.detect_landmarks(tgt)
    t_crop, _ = pipe.align(tgt, t_lm)
    t_small = jax.image.resize(t_crop, (2, size, size, 3), "bilinear")
    expected = np.asarray(pipe.detect_landmarks(t_small)).reshape(2, 136)
    np.testing.assert_allclose(captured["landmarks"], expected, atol=1e-4)
    # and NOT the frame landmarks rescaled (the round-1 bug)
    wrong = np.asarray(t_lm * (size / 96)).reshape(2, 136)
    assert np.abs(captured["landmarks"] - wrong).max() > 1e-3


def test_multiface_frame_swap():
    swap_cfg = tiny_swap_config(image_size=64, ddim_steps=2)
    sw = FaceSwapper(swap_cfg, FaceSwapper.init_params(swap_cfg, jax.random.key(0)))
    pipe = RawSwapPipeline(sw, _tiny_raw_cfg())

    frame = np.asarray(jax.random.uniform(jax.random.key(5), (96, 128, 3)))
    src = jax.random.uniform(jax.random.key(6), (1, 80, 80, 3))

    boxes = pipe.detect_faces(frame, max_faces=3)
    assert isinstance(boxes, list)
    for x0, y0, x1, y1 in boxes:
        assert 0 <= x0 < x1 <= 128 and 0 <= y0 < y1 <= 96

    out = pipe.swap_frame_multiface(frame, src, key=jax.random.key(7))
    assert out.shape == frame.shape
    assert bool(jnp.isfinite(out).all())


def test_video_fallback_reuses_last_good_frame():
    """Detect-failure fallback (inference_swap_video.py:468-500): a no-face
    frame reuses the previous frame's crop/landmarks/transform, so its
    output equals the previous frame's output; frames before any detection
    pass through unswapped; state carries across batches."""
    swap_cfg = tiny_swap_config(image_size=64, ddim_steps=2)
    sw = FaceSwapper(swap_cfg, FaceSwapper.init_params(swap_cfg, jax.random.key(0)))
    pipe = RawSwapPipeline(sw, _tiny_raw_cfg())

    # deterministic swap body (no sampler noise) so fallback outputs are
    # bit-identical; presence pattern forced: [face, NO-face, face]
    pipe._swap_aligned = lambda crop, ref, key: crop * 0.5
    presence = np.array([True, False, True])
    pipe.face_presence = lambda t, min_area_frac=2e-3: jnp.asarray(
        presence[: t.shape[0]]
    )

    tgt = jax.random.uniform(jax.random.key(1), (3, 96, 96, 3))
    src = jax.random.uniform(jax.random.key(2), (3, 80, 80, 3))
    out, state, quads = pipe.swap_images_robust(tgt, src, key=jax.random.key(3))
    out = np.asarray(out)
    assert quads.shape == (3, 4, 2)
    # frame 1 (no face) == frame 0's output, not its own swap
    np.testing.assert_allclose(out[1], out[0], atol=1e-6)
    assert np.abs(out[2] - out[0]).max() > 1e-4  # frame 2 is its own swap
    assert state is not None

    # state carries into the next batch: an all-failed batch repeats the
    # last good frame's output
    pipe.face_presence = lambda t, min_area_frac=2e-3: jnp.zeros(
        (t.shape[0],), bool
    )
    tgt2 = jax.random.uniform(jax.random.key(4), (2, 96, 96, 3))
    out2, state2, _ = pipe.swap_images_robust(
        tgt2, src[:2], key=jax.random.key(5), state=state
    )
    np.testing.assert_allclose(np.asarray(out2[0]), out[2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out2[1]), out[2], atol=1e-6)

    # no prior state + no detection ever -> passthrough
    out3, state3, _ = pipe.swap_images_robust(
        tgt2, src[:2], key=jax.random.key(6), state=None
    )
    np.testing.assert_allclose(np.asarray(out3), np.asarray(tgt2), atol=1e-6)
    assert state3 is None


def test_video_one_program_matches_eager_robust():
    """The one-XLA-program video batch step (swap_images_robust default)
    must reproduce the eager stage-by-stage robust path: identical
    presence gating, fallback carry, align/swap/paste math — only the
    dispatch granularity changes (fusion-boundary tolerance, as in
    test_fused_raw_path_matches_eager). Also checks the precomputed-ref224
    fast path and the None-until-detected state contract."""
    swap_cfg = tiny_swap_config(image_size=64, ddim_steps=2)
    sw = FaceSwapper(swap_cfg, FaceSwapper.init_params(swap_cfg, jax.random.key(0)))
    pipe = RawSwapPipeline(sw, _tiny_raw_cfg())

    tgt = jax.random.uniform(jax.random.key(1), (3, 96, 96, 3))
    src = jax.random.uniform(jax.random.key(2), (3, 80, 80, 3))

    # force a mixed presence pattern so the fallback carry is exercised
    presence = np.array([True, False, True])
    pipe.face_presence = lambda t, min_area_frac=2e-3: jnp.asarray(
        presence[: t.shape[0]]
    )

    eager_out, eager_state, eager_quads = pipe.swap_images_robust(
        tgt, src, key=jax.random.key(3), one_program=False
    )
    one_out, one_state, one_quads = pipe.swap_images_robust(
        tgt, src, key=jax.random.key(3), one_program=True
    )
    np.testing.assert_allclose(
        np.asarray(one_out), np.asarray(eager_out), atol=5e-3, rtol=0
    )
    np.testing.assert_allclose(one_quads, eager_quads, atol=1e-4, rtol=0)
    assert one_state is not None and eager_state is not None

    # precomputed ref224 must not change the result
    ref224 = pipe._source_reference(src)
    ref_out, _, _ = pipe.swap_images_robust(
        tgt, src, key=jax.random.key(3), one_program=True, ref224=ref224
    )
    np.testing.assert_allclose(
        np.asarray(ref_out), np.asarray(one_out), atol=5e-3, rtol=0
    )

    # With a host landmark_fn (--landmark-rert), the one-program path must
    # match the eager path INCLUDING the source-reference alignment: the
    # source reference is computed eagerly with the host fn before the
    # program (traced inside it, detect_landmarks would silently fall back
    # to the CNN for the source crop — a regression this guards).
    def host_lm(images01):
        # deterministic host landmarks, deliberately far from the CNN's:
        # a grid whose scale depends on each image's mean intensity
        arr = np.asarray(images01)
        b, h, w = arr.shape[0], arr.shape[1], arr.shape[2]
        gx, gy = np.meshgrid(np.linspace(0.2, 0.8, 17), np.linspace(0.3, 0.9, 4))
        base = np.stack([gx.ravel(), gy.ravel()], -1)[:68]  # (68,2) in [0,1]
        scale = 0.8 + 0.2 * arr.reshape(b, -1).mean(1)
        return base[None] * scale[:, None, None] * np.array([w, h], np.float32)

    pipe_lm = RawSwapPipeline(sw, _tiny_raw_cfg(), landmark_fn=host_lm)
    pipe_lm.face_presence = lambda t, min_area_frac=2e-3: jnp.asarray(
        presence[: t.shape[0]]
    )
    lm_eager, _, _ = pipe_lm.swap_images_robust(
        tgt, src, key=jax.random.key(3), one_program=False
    )
    lm_one, _, _ = pipe_lm.swap_images_robust(
        tgt, src, key=jax.random.key(3), one_program=True
    )
    np.testing.assert_allclose(
        np.asarray(lm_one), np.asarray(lm_eager), atol=5e-3, rtol=0
    )
    # the host landmarks really did drive the result (CNN path differs)
    assert float(np.abs(np.asarray(lm_one) - np.asarray(one_out)).max()) > 1e-3

    # no face ever -> passthrough frames and a None state, same as eager
    pipe2 = RawSwapPipeline(sw, _tiny_raw_cfg())
    pipe2.face_presence = lambda t, min_area_frac=2e-3: jnp.zeros(
        (t.shape[0],), bool
    )
    out3, state3, _ = pipe2.swap_images_robust(
        tgt, src, key=jax.random.key(4), one_program=True
    )
    np.testing.assert_allclose(np.asarray(out3), np.asarray(tgt), atol=1e-6)
    assert state3 is None
