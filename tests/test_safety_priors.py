import numpy as np
import jax
import jax.numpy as jnp

from reface_tpu.nn.clip import CLIPVisionConfig
from reface_tpu.nn.safety import SafetyChecker, SafetyCheckerConfig
from reface_tpu.preprocess.priors import landmark_tps_prior


def test_safety_passthrough_without_weights():
    sc = SafetyChecker()
    imgs = jax.random.uniform(jax.random.key(0), (2, 32, 32, 3))
    out, flags = sc(imgs)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs))
    assert not bool(flags.any())


def test_safety_flags_and_blurs_with_weights():
    cfg = SafetyCheckerConfig(
        clip=CLIPVisionConfig(hidden=32, layers=1, heads=2, patch=112,
                              image_size=224, dtype=jnp.float32,
                              projection_dim=8),
        n_concepts=2,
    )
    sc = SafetyChecker(cfg)
    tower_params = sc.tower.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
    imgs = jax.random.uniform(jax.random.key(1), (2, 224, 224, 3))
    # concept embed = the image's own embedding -> cos=1 -> flag with thr<1
    from reface_tpu.pipelines.swap import clip_normalize

    emb = sc.tower.apply(tower_params, clip_normalize(imgs))
    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    params = {
        "tower": tower_params,
        "concept_embeds": jnp.stack([emb[0], -emb[1]]),
        "concept_thresholds": jnp.array([0.9, 0.9]),
        "special_embeds": -jnp.stack([emb[0], emb[1]]),  # never hit
        "special_thresholds": jnp.array([0.9, 0.9]),
    }
    sc2 = SafetyChecker(cfg, params)
    out, flags = sc2(imgs)
    assert bool(flags[0]) and not bool(flags[1])
    # flagged image got blurred (changed), unflagged untouched
    assert float(jnp.abs(out[0] - imgs[0]).max()) > 0
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(imgs[1]))


def test_safety_special_care_raises_adjustment():
    """diffusers semantics: a special-care hit adds 0.01 to the concept
    scores, flipping a borderline concept to flagged."""
    cfg = SafetyCheckerConfig(
        clip=CLIPVisionConfig(hidden=32, layers=1, heads=2, patch=112,
                              image_size=224, dtype=jnp.float32,
                              projection_dim=8),
        n_concepts=1, n_special=1,
    )
    sc = SafetyChecker(cfg)
    tower_params = sc.tower.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
    imgs = jax.random.uniform(jax.random.key(1), (1, 224, 224, 3))
    from reface_tpu.pipelines.swap import clip_normalize

    emb = sc.tower.apply(tower_params, clip_normalize(imgs))
    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    base = {
        "tower": tower_params,
        # borderline concept: cos=1, threshold just above -> only the
        # +0.01 special adjustment pushes it over
        "concept_embeds": emb[:1],
        "concept_thresholds": jnp.array([1.005]),
    }
    no_special = dict(
        base, special_embeds=-emb[:1], special_thresholds=jnp.array([0.9])
    )
    with_special = dict(
        base, special_embeds=emb[:1], special_thresholds=jnp.array([0.9])
    )
    _, f0 = SafetyChecker(cfg, no_special)(imgs)
    _, f1 = SafetyChecker(cfg, with_special)(imgs)
    assert not bool(f0[0]) and bool(f1[0])


def test_convert_safety_checker_key_remap():
    """Converter consumes the diffusers layout (vision_model.vision_model.*
    + buffers) and normalizes nothing — scoring normalizes at compute."""
    from reface_tpu.ckpt.convert import convert_safety_checker

    cfg = CLIPVisionConfig(hidden=8, layers=1, heads=2, patch=112,
                           image_size=224, dtype=jnp.float32,
                           projection_dim=4)
    from reface_tpu.nn.clip import CLIPVisionTower

    tower = CLIPVisionTower(cfg)
    shapes = jax.eval_shape(tower.init, jax.random.key(0),
                            jnp.zeros((1, 224, 224, 3)))
    flat = jax.tree_util.tree_flatten_with_path(shapes)[0]

    # build a fake torch sd with the right keys/shapes by round-tripping the
    # clip rule used by convert_clip_vision
    from reface_tpu.ckpt.convert import _clip_rule, _linear_kernel, _conv_kernel

    rng = np.random.default_rng(0)
    sd = {}
    for path, s in flat:
        keys = tuple(getattr(p, "key", getattr(p, "name", None)) for p in path)
        tkey, xform = _clip_rule(("params", "tower") + keys[1:])
        arr = rng.normal(size=s.shape).astype(np.float32)
        if xform is _linear_kernel:
            arr = arr.T
        elif xform is _conv_kernel:
            arr = arr.transpose(3, 2, 0, 1)
        sd[tkey.replace("model.", "vision_model.", 1)
           if tkey.startswith("model.vision_model") else tkey] = arr
    # model.visual_projection.weight -> visual_projection.weight
    sd = {
        (k.replace("model.visual_projection", "visual_projection")
         if k.startswith("model.visual_projection") else k): v
        for k, v in sd.items()
    }
    sd["concept_embeds"] = rng.normal(size=(17, 4)).astype(np.float32)
    sd["concept_embeds_weights"] = rng.normal(size=(17,)).astype(np.float32)
    sd["special_care_embeds"] = rng.normal(size=(3, 4)).astype(np.float32)
    sd["special_care_embeds_weights"] = rng.normal(size=(3,)).astype(np.float32)

    params = convert_safety_checker(
        jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes), sd
    )
    assert params["concept_embeds"].shape == (17, 4)
    assert params["special_embeds"].shape == (3, 4)
    # tower params populated (nonzero where the sd was nonzero)
    leaves = jax.tree.leaves(params["tower"])
    assert any(np.abs(l).max() > 0 for l in leaves)


def test_landmark_tps_prior_identity_when_landmarks_match():
    h = w = 32
    rng = np.random.default_rng(0)
    tgt = jnp.asarray(rng.uniform(-1, 1, (h, w, 3)), jnp.float32)
    src = jnp.asarray(rng.uniform(-1, 1, (h, w, 3)), jnp.float32)
    # well-separated landmark grid (random 68 points can be near-coincident,
    # making the float32 TPS solve ill-conditioned)
    gx, gy = np.meshgrid(np.linspace(4, 27, 9), np.linspace(4, 27, 8))
    lm = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], -1)[:68], jnp.float32)
    lm = lm + jnp.asarray(rng.uniform(-0.5, 0.5, (68, 2)), jnp.float32)
    mask = jnp.zeros((h, w, 1)).at[8:24, 8:24].set(1.0)
    out = landmark_tps_prior(tgt, src, lm, lm, mask)
    # identical landmarks -> identity warp -> src pasted inside the mask
    np.testing.assert_allclose(
        np.asarray(out[10:20, 10:20]), np.asarray(src[10:20, 10:20]), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out[:4, :4]), np.asarray(tgt[:4, :4]), atol=1e-6
    )


def test_dift_prior_recovers_known_correspondence():
    """With one-hot cell features where the source is the horizontally
    flipped target, argmax-cosine must map each target cell to its flipped
    source cell, so the composite reproduces the target inside the mask
    (make_priors.py:103-151 semantics)."""
    from reface_tpu.preprocess.priors import dift_prior

    g, blk = 8, 4
    h = w = g * blk
    rng = np.random.default_rng(1)
    block_colors = rng.uniform(-1, 1, (g, g, 3)).astype(np.float32)
    tgt = np.repeat(np.repeat(block_colors, blk, 0), blk, 1)
    src = tgt[:, ::-1].copy()  # horizontal flip

    eye = np.eye(g * g, dtype=np.float32).reshape(g, g, g * g)

    def feats_fn(img):
        flipped = bool(np.allclose(np.asarray(img), src))
        return jnp.asarray(eye[:, ::-1] if flipped else eye)

    mask = jnp.zeros((h, w, 1)).at[:, :].set(1.0)
    out = dift_prior(jnp.asarray(tgt), jnp.asarray(src), mask, feats_fn, grid=g)
    np.testing.assert_allclose(np.asarray(out), tgt, atol=1e-5)


def test_dift_prior_unet_features_end_to_end():
    """make_unet_feats_fn over a tiny swapper: features have the expected
    latent/4 tap shape and the composite is finite + mask-consistent."""
    from reface_tpu.pipelines.swap import FaceSwapper, tiny_swap_config
    from reface_tpu.preprocess.priors import dift_prior, make_unet_feats_fn

    cfg = tiny_swap_config(image_size=64, ddim_steps=2)
    sw = FaceSwapper(cfg, FaceSwapper.init_params(cfg, jax.random.key(0)))
    feats_fn = make_unet_feats_fn(sw, sw.params, ensemble=2)

    rng = np.random.default_rng(2)
    tgt = jnp.asarray(rng.uniform(-1, 1, (64, 64, 3)), jnp.float32)
    src = jnp.asarray(rng.uniform(-1, 1, (64, 64, 3)), jnp.float32)
    f = feats_fn(tgt)
    # the tiny 2-level UNet has no latent/4 decoder tap; the deepest tap is
    # the fallback (the full config has the 16^2 = latent/4 DIFT analog)
    assert f.ndim == 3 and 1 <= f.shape[0] <= cfg.latent_size

    mask = jnp.zeros((64, 64, 1)).at[16:48, 16:48].set(1.0)
    out = dift_prior(tgt, src, mask, feats_fn, grid=8)
    assert out.shape == (64, 64, 3)
    assert bool(jnp.isfinite(out).all())
    # untouched outside the mask
    np.testing.assert_allclose(np.asarray(out[:8, :8]), np.asarray(tgt[:8, :8]),
                               atol=1e-6)


def test_make_priors_cli_both_methods(tmp_path):
    import cv2

    rng = np.random.default_rng(3)
    for d in ("t", "s", "m"):
        (tmp_path / d).mkdir()
    for i in range(2):
        cv2.imwrite(str(tmp_path / "t" / f"{i}.png"),
                    rng.integers(0, 255, (64, 64, 3), np.uint8))
        cv2.imwrite(str(tmp_path / "s" / f"{i}.png"),
                    rng.integers(0, 255, (64, 64, 3), np.uint8))
        m = np.zeros((64, 64), np.uint8)
        m[16:48, 16:48] = 255
        cv2.imwrite(str(tmp_path / "m" / f"{i}.png"), m)

    from reface_tpu.cli.prepare_data import main

    for method in ("tps", "dift"):
        out = tmp_path / f"o_{method}"
        main(["make-priors", "--target-dir", str(tmp_path / "t"),
              "--source-dir", str(tmp_path / "s"), "--mask-dir",
              str(tmp_path / "m"), "--out-dir", str(out), "--method", method,
              "--tiny", "--size", "64", "--grid", "8", "--backend", "cpu"])
        assert (out / "0.png").exists() and (out / "1.png").exists()
