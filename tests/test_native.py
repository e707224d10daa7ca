"""Native C++ kernels vs the numpy/cv2 reference implementations."""

import numpy as np
import pytest

from reface_tpu import native_ops as rn

pytestmark = pytest.mark.skipif(
    not rn.available(), reason="libreface_native.so not built"
)


def test_resize_matches_cv2():
    import cv2

    rng = np.random.default_rng(0)
    src = rng.random((37, 53, 3), np.float32)
    out = rn.resize_bilinear(src, 64, 48)
    ref = cv2.resize(src, (48, 64), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_remap_matches_cv2():
    import cv2

    rng = np.random.default_rng(1)
    src = rng.random((32, 32, 1), np.float32)
    map_x = rng.uniform(-2, 34, (16, 16)).astype(np.float32)
    map_y = rng.uniform(-2, 34, (16, 16)).astype(np.float32)
    out = rn.remap_bilinear(src, map_x, map_y)
    ref = cv2.remap(src, map_x, map_y, cv2.INTER_LINEAR,
                    borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    np.testing.assert_allclose(out[..., 0], ref, atol=1e-5)


def test_tps_grid_matches_numpy():
    from reface_tpu.data.augment import _tps_grid_np

    rng = np.random.default_rng(2)
    lin = np.linspace(-1, 1, 3)
    gy, gx = np.meshgrid(lin, lin, indexing="ij")
    ctrl = np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)
    warped = ctrl + rng.normal(0, 0.1, ctrl.shape).astype(np.float32)
    out = rn.tps_grid(ctrl, warped, 20, 24)
    ref = _tps_grid_np(ctrl.astype(np.float64), warped.astype(np.float64), 20, 24)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_mask_ops_match_numpy():
    from reface_tpu.preprocess.masks import CELEBAHQ_TO_SEG12
    from reface_tpu.preprocess.masks import preserve_mask as np_preserve

    rng = np.random.default_rng(3)
    mask = rng.integers(0, 19, (64, 64)).astype(np.int32)
    out = rn.mask_remap(mask, CELEBAHQ_TO_SEG12)
    np.testing.assert_array_equal(out, CELEBAHQ_TO_SEG12[mask])
    classes = (1, 2, 13)
    np.testing.assert_array_equal(
        rn.preserve_mask(mask, classes), np_preserve(mask, classes)
    )


def test_normalize_ops():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (16, 16, 3), np.uint8)
    np.testing.assert_allclose(
        rn.u8_to_pm1(img), img.astype(np.float32) / 127.5 - 1, atol=1e-6
    )
    from reface_tpu.data.augment import clip_normalize_np

    np.testing.assert_allclose(
        rn.u8_to_clip(img), clip_normalize_np(img.astype(np.float32) / 255.0),
        atol=1e-5,
    )


def test_ert_roundtrip_and_predict(tmp_path):
    """Build a tiny synthetic ERT model, load it natively, check the cascade
    applies leaf offsets as specified."""
    from tools.convert_dlib_sp import write_model

    n_points, depth, n_feats = 5, 2, 8
    init = np.tile([0.5, 0.5], n_points).astype(np.float32)
    # one cascade, one tree; all splits route identically for a constant image
    splits = [(0, 1, -1.0)] * ((1 << depth) - 1)  # diff=0 > -1 -> left
    leaves = np.zeros((1 << depth, n_points * 2), np.float32)
    leaves[0] = 0.1  # the leaf a constant image lands in
    cascades = [dict(
        anchors=np.zeros(n_feats, np.int32),
        deltas=np.zeros((n_feats, 2), np.float32),
        trees=[(splits, leaves)],
    )]
    path = str(tmp_path / "tiny.rert")
    write_model(path, init, cascades)

    rn.ert_load(path)
    gray = np.full((100, 100), 128, np.uint8)
    out = rn.ert_predict(gray, (10, 20, 60, 80))
    assert out.shape == (n_points, 2)
    # shape = init + 0.1 -> x = 10 + 0.6*50 = 40, y = 20 + 0.6*60 = 56
    np.testing.assert_allclose(out[:, 0], 40.0, atol=1e-4)
    np.testing.assert_allclose(out[:, 1], 56.0, atol=1e-4)


def test_ert_load_rejects_garbage(tmp_path):
    p = tmp_path / "bad.rert"
    p.write_bytes(b"not a model")
    with pytest.raises(RuntimeError):
        rn.ert_load(str(p))


def test_ert_batch_matches_single(tmp_path):
    from tools.convert_dlib_sp import write_model

    n_points, depth, n_feats = 4, 1, 4
    init = np.tile([0.25, 0.75], n_points).astype(np.float32)
    splits = [(0, 1, -1.0)]
    leaves = np.zeros((2, n_points * 2), np.float32)
    leaves[0] = 0.05
    cascades = [dict(anchors=np.zeros(n_feats, np.int32),
                     deltas=np.zeros((n_feats, 2), np.float32),
                     trees=[(splits, leaves)])]
    path = str(tmp_path / "b.rert")
    write_model(path, init, cascades)
    rn.ert_load(path)

    rng = np.random.default_rng(0)
    grays = rng.integers(0, 255, (3, 50, 60), np.uint8)
    boxes = np.array([[5, 5, 45, 45], [0, 0, 59, 49], [10, 2, 30, 40]],
                     np.float32)
    batch = rn.ert_predict_batch(grays, boxes)
    for i in range(3):
        single = rn.ert_predict(grays[i], boxes[i])
        np.testing.assert_allclose(batch[i], single)
