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
