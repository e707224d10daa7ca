"""Eval-suite tests: Fréchet golden values, retrieval math, angle decode,
LPIPS properties."""

import numpy as np
import jax
import jax.numpy as jnp

from reface_tpu.eval import (
    decode_hopenet_angles,
    expression_l2,
    frechet_distance,
    clip_fid,
    id_retrieval_metrics,
    pose_l2,
    Hopenet,
    FaceReconCoeffNet,
)
from reface_tpu.nn.lpips import LPIPS


def test_frechet_identical_is_zero():
    rng = np.random.default_rng(0)
    f = rng.normal(size=(200, 8))
    assert abs(clip_fid(f, f.copy())) < 1e-6


def test_frechet_mean_shift_golden():
    """For equal covariance, FID = ||mu1 - mu2||^2 exactly."""
    rng = np.random.default_rng(1)
    a = rng.normal(size=(5000, 4))
    b = a + np.array([1.0, 0, 0, 0])
    fid = clip_fid(a, b)
    np.testing.assert_allclose(fid, 1.0, atol=1e-3)


def test_frechet_diagonal_gaussians_closed_form():
    # N(0, I) vs N(0, 4I) in d dims: trace term = d*(1 + 4 - 2*2) = d
    mu = np.zeros(3)
    fid = frechet_distance(mu, np.eye(3), mu, 4 * np.eye(3))
    np.testing.assert_allclose(fid, 3.0, atol=1e-9)


def test_id_retrieval_perfect_and_degraded():
    rng = np.random.default_rng(2)
    src = rng.normal(size=(20, 16))
    src /= np.linalg.norm(src, axis=1, keepdims=True)
    m = id_retrieval_metrics(src.copy(), src)
    assert m["top1"] == 1.0 and m["top5"] == 1.0
    np.testing.assert_allclose(m["mean_id_cosine"], 1.0, rtol=1e-6)

    # swap 0 now matches source 1 best -> top1 drops
    swaps = src.copy()
    swaps[0] = src[1]
    m2 = id_retrieval_metrics(swaps, src)
    assert m2["top1"] < 1.0


def test_hopenet_angle_decode():
    logits = np.full((1, 66), -1e9)
    logits[0, 33] = 0.0  # delta at bin 33 -> 33*3-99 = 0 degrees
    np.testing.assert_allclose(np.asarray(decode_hopenet_angles(jnp.asarray(logits))), 0.0, atol=1e-4)
    logits2 = np.full((1, 66), -1e9)
    logits2[0, 0] = 0.0
    np.testing.assert_allclose(
        np.asarray(decode_hopenet_angles(jnp.asarray(logits2))), -99.0, atol=1e-4
    )


def test_pose_and_expression_l2():
    a = np.array([[0.0, 0, 0], [3, 4, 0]])
    b = np.zeros((2, 3))
    np.testing.assert_allclose(pose_l2(a, b), 2.5)
    e1 = np.zeros((2, 64))
    e2 = np.zeros((2, 64))
    e2[:, 0] = 2.0
    np.testing.assert_allclose(expression_l2(e1, e2), 2.0)


def test_hopenet_and_facerecon_shapes():
    m = Hopenet(dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    p = m.init(jax.random.key(0), x)
    yaw, pitch, roll = m.apply(p, x)
    assert yaw.shape == pitch.shape == roll.shape == (1, 66)

    f = FaceReconCoeffNet(dtype=jnp.float32)
    pf = f.init(jax.random.key(0), x)
    coeffs = f.apply(pf, x)
    assert coeffs.shape == (1, 257)
    split = FaceReconCoeffNet.split_coeffs(coeffs)
    assert split["exp"].shape == (1, 64) and split["id"].shape == (1, 80)


def test_lpips_properties():
    m = LPIPS()
    x = jax.random.uniform(jax.random.key(0), (2, 64, 64, 3), minval=-1, maxval=1)
    y = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3), minval=-1, maxval=1)
    p = m.init(jax.random.key(2), x, y)
    # identical inputs -> zero distance
    d0 = m.apply(p, x, x)
    np.testing.assert_allclose(np.asarray(d0), 0.0, atol=1e-6)
    d = m.apply(p, x, y)
    assert d.shape == (2,)
    # differentiable (it's a training loss)
    g = jax.grad(lambda xx: m.apply(p, xx, y).sum())(x)
    assert bool(jnp.isfinite(g).all())
