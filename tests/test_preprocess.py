"""TPS / mask / alignment preprocessing tests (incl. torch parity for
grid sampling)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from reface_tpu.preprocess import (
    CELEBAHQ_TO_SEG12,
    FACE_PARSING_TO_SEG12,
    calc_perspective_coeffs,
    compute_align_quad,
    grid_sample_2d,
    inpaint_mask_from_classes,
    paste_back,
    perspective_warp,
    preserve_mask,
    quad_crop,
    random_tps_mask_warp,
    remap,
    tps_grid,
    tps_warp,
)


# ---------------- TPS ----------------

def test_tps_identity_mapping():
    lin = jnp.linspace(-1, 1, 3)
    gy, gx = jnp.meshgrid(lin, lin, indexing="ij")
    ctrl = jnp.stack([gx.ravel(), gy.ravel()], -1)
    pts = jax.random.uniform(jax.random.key(0), (50, 2), minval=-1, maxval=1)
    out = tps_warp(ctrl, ctrl, pts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-5)


def test_tps_interpolates_control_points():
    ctrl = jnp.array([[-1, -1], [1, -1], [-1, 1], [1, 1], [0, 0]], jnp.float32)
    target = ctrl.at[4].set(jnp.array([0.3, -0.2]))
    out = tps_warp(ctrl, target, ctrl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=1e-4)


def test_grid_sample_parity_with_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 3, 9, 7)).astype(np.float32)  # NCHW for torch
    grid = (rng.uniform(-1.2, 1.2, size=(2, 5, 6, 2))).astype(np.float32)
    ref = torch.grid_sampler_2d(
        torch.from_numpy(img), torch.from_numpy(grid), 0, 0, False
    ).numpy()
    out = grid_sample_2d(
        jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(grid)
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5
    )


def test_random_tps_mask_warp_shapes_and_range():
    mask = (jax.random.uniform(jax.random.key(1), (2, 32, 32, 1)) > 0.5).astype(
        jnp.float32
    )
    out = random_tps_mask_warp(jax.random.key(2), mask)
    assert out.shape == mask.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # warp must actually move something
    assert float(jnp.abs(out - mask).max()) > 0


# ---------------- masks ----------------

def test_celebahq_seg12_lut():
    # skin(1)->6, nose(2)->5, eye_g(3)->10, hair(13)->4, neck(17)->8, hat(14)->0
    lut = CELEBAHQ_TO_SEG12
    assert lut[1] == 6 and lut[2] == 5 and lut[3] == 10
    assert lut[13] == 4 and lut[17] == 8 and lut[14] == 0
    assert lut[11] == 1 and lut[12] == 1 and lut[10] == 9


def test_face_parsing_seg12_lut():
    lut = FACE_PARSING_TO_SEG12
    # skin(1)->6, nose(10)->5, hair(17)->4, u_lip(12)->1, mouth(11)->9
    assert lut[1] == 6 and lut[10] == 5 and lut[17] == 4
    assert lut[12] == 1 and lut[11] == 9


def test_preserve_and_inpaint_masks():
    m = np.array([[0, 1, 2], [13, 17, 5]], np.int32)
    keep = preserve_mask(m, (1, 2, 5))
    np.testing.assert_array_equal(keep, [[0, 1, 1], [0, 0, 1]])
    inp = inpaint_mask_from_classes(m, (1, 2, 5))
    np.testing.assert_array_equal(inp, 1.0 - keep)


def test_remap_array():
    m = np.array([0, 1, 2, 13], np.int32)
    out = remap(m, CELEBAHQ_TO_SEG12)
    np.testing.assert_array_equal(out, [0, 6, 5, 4])


# ---------------- alignment ----------------

def _synthetic_landmarks(cx=256.0, cy=256.0, s=80.0):
    """Plausible frontal-face landmarks: eyes, nose, mouth at typical spots."""
    lm = np.zeros((68, 2), np.float32)
    lm[36:42] = [cx - s, cy - s * 0.5]  # left eye cluster
    lm[42:48] = [cx + s, cy - s * 0.5]  # right eye cluster
    lm[48] = [cx - s * 0.6, cy + s]  # mouth left
    lm[54] = [cx + s * 0.6, cy + s]  # mouth right
    return jnp.asarray(lm)


def test_align_quad_geometry():
    lm = _synthetic_landmarks()
    quad = np.asarray(compute_align_quad(lm))
    assert quad.shape == (4, 2)
    # square: both axes equal length, orthogonal
    e1 = quad[3] - quad[0]  # NE - NW (x axis * 2)
    e2 = quad[1] - quad[0]  # SW - NW (y axis * 2)
    np.testing.assert_allclose(np.linalg.norm(e1), np.linalg.norm(e2), rtol=1e-5)
    assert abs(np.dot(e1, e2)) < 1e-3
    # upright face: x-axis should be horizontal
    assert abs(e1[1]) < 1e-3
    # center ~ eye_avg + 0.1 * eye_to_mouth
    center = quad.mean(axis=0)
    np.testing.assert_allclose(center, [256.0, 256.0 - 40.0 + 0.1 * 120.0], atol=1e-3)


def test_quad_crop_identity():
    """Cropping with the full-image quad reproduces the image."""
    img = jax.random.uniform(jax.random.key(3), (16, 16, 3))
    # quad covering exactly the pixel-center extent
    q = jnp.array([[-0.5, -0.5], [-0.5, 15.5], [15.5, 15.5], [15.5, -0.5]])
    out = quad_crop(img, q, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_perspective_solve_maps_points():
    src = jnp.array([[0, 0], [0, 100], [100, 100], [100, 0]], jnp.float32)
    dst = jnp.array([[10, 20], [15, 120], [110, 130], [105, 25]], jnp.float32)
    coeffs = calc_perspective_coeffs(src, dst)
    a, b, c, d, e, f, g, h8 = [float(coeffs[i]) for i in range(8)]
    for s, t in zip(np.asarray(src), np.asarray(dst)):
        den = g * s[0] + h8 * s[1] + 1
        u = (a * s[0] + b * s[1] + c) / den
        v = (d * s[0] + e * s[1] + f) / den
        np.testing.assert_allclose([u, v], t, atol=1e-3)


def test_paste_back_roundtrip():
    """Crop a region, paste it back unchanged -> original recovered there."""
    orig = jax.random.uniform(jax.random.key(4), (64, 64, 3))
    quad = jnp.array([[15.5, 15.5], [15.5, 47.5], [47.5, 47.5], [47.5, 15.5]])
    crop = quad_crop(orig, quad, 32)
    out = paste_back(jnp.zeros_like(orig), crop, quad)
    # interior of the pasted region should match the original
    np.testing.assert_allclose(
        np.asarray(out[20:44, 20:44]), np.asarray(orig[20:44, 20:44]), atol=0.06
    )
    # far corners untouched
    np.testing.assert_array_equal(np.asarray(out[:8, :8]), 0.0)


def test_face_bbox_from_mask():
    from reface_tpu.preprocess.detect import face_bbox_from_mask

    seg = np.zeros((2, 32, 32), np.int32)
    seg[0, 8:20, 10:25] = 6  # skin blob
    boxes, valid = face_bbox_from_mask(jnp.asarray(seg), min_pixels=10)
    assert bool(valid[0]) and not bool(valid[1])
    np.testing.assert_allclose(np.asarray(boxes[0]), [10, 8, 24, 19])
    # no face -> full-frame fallback
    np.testing.assert_allclose(np.asarray(boxes[1]), [0, 0, 31, 31])
