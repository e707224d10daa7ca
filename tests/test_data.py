"""Data-layer tests over synthetic mini datasets."""

import numpy as np
import pytest

from reface_tpu.data import (
    CelebAHQConfig,
    CelebAHQDataset,
    FFHQConfig,
    FFHQDataset,
    PrefetchLoader,
    TestBenchConfig,
    TestBenchDataset,
    collate,
)
from reface_tpu.data.synthetic import make_synthetic_celeba, make_synthetic_ffhq


@pytest.fixture(scope="module")
def celeba_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("celeba"))
    # tiny train set at ids 0..3 and a "test bench" pair range
    make_synthetic_celeba(root, 0, 4, size=64)
    make_synthetic_celeba(root, 28000, 2, size=64, seed=1)
    make_synthetic_celeba(root, 29000, 2, size=64, seed=2)
    return root


def test_celeba_train_item(celeba_root):
    ds = CelebAHQDataset(CelebAHQConfig(
        dataset_dir=celeba_root, state="train", image_size=64, train_count=4
    ))
    assert len(ds) == 4
    it = ds[0]
    assert it["GT"].shape == (64, 64, 3)
    assert it["inpaint_image"].shape == (64, 64, 3)
    assert it["inpaint_mask"].shape == (64, 64, 1)
    assert it["ref_imgs"].shape == (224, 224, 3)
    assert it["GT"].min() >= -1.0 and it["GT"].max() <= 1.0
    # inpaint = GT * mask where mask==1; zero where mask==0
    m = it["inpaint_mask"]
    np.testing.assert_allclose(it["inpaint_image"], it["GT"] * m, atol=1e-6)
    # the synthetic face region must actually be masked out somewhere
    assert (m == 0).any() and (m == 1).any()


def test_celeba_determinism(celeba_root):
    cfg = CelebAHQConfig(dataset_dir=celeba_root, state="train",
                         image_size=64, train_count=4)
    a = CelebAHQDataset(cfg)[1]
    b = CelebAHQDataset(cfg)[1]
    for k in ("GT", "inpaint_image", "inpaint_mask", "ref_imgs"):
        np.testing.assert_array_equal(a[k], b[k])


def test_test_bench_pairs(celeba_root):
    ds = TestBenchDataset(TestBenchConfig(
        dataset_dir=celeba_root, dataset="celeba", image_size=64, num_pairs=2
    ))
    assert len(ds) == 2
    it = ds[0]
    assert it["target_id"] == 28000 and it["source_id"] == 29000
    assert it["target_image"].shape == (64, 64, 3)
    assert it["ref_clip224"].shape == (224, 224, 3)
    # test bench has no TPS: mask values in {0,1} (up to resize interpolation)
    np.testing.assert_allclose(
        it["inpaint_image"], it["target_image"] * it["inpaint_mask"], atol=1e-6
    )


def test_test_bench_prior_dir(celeba_root, tmp_path):
    """load_prior parity (test_bench_dataset.py:357-363): a prior dir adds a
    [-1,1] prior_image column keyed by target id."""
    import cv2

    prior_dir = str(tmp_path / "priors")
    import os

    os.makedirs(prior_dir)
    rng = np.random.default_rng(3)
    for tid in (28000, 28001):
        img = rng.integers(0, 255, (32, 32, 3), np.uint8)
        cv2.imwrite(os.path.join(prior_dir, f"{tid}.png"), img)
    ds = TestBenchDataset(TestBenchConfig(
        dataset_dir=celeba_root, dataset="celeba", image_size=64, num_pairs=2,
        prior_dir=prior_dir,
    ))
    it = ds[0]
    assert it["prior_image"].shape == (64, 64, 3)
    assert it["prior_image"].min() >= -1.0 and it["prior_image"].max() <= 1.0


def test_ffhq_layout(tmp_path):
    root = make_synthetic_ffhq(str(tmp_path), 0, 3, size=64)
    ds = FFHQDataset(FFHQConfig(dataset_dir=root, state="train",
                                image_size=64, train_count=3))
    it = ds[2]
    assert it["GT"].shape == (64, 64, 3)


def test_prefetch_loader(celeba_root):
    ds = CelebAHQDataset(CelebAHQConfig(
        dataset_dir=celeba_root, state="train", image_size=64, train_count=4
    ))
    loader = PrefetchLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["GT"].shape == (2, 64, 64, 3)
    # shuffle determinism across epochs differs but shapes consistent
    batches2 = list(loader)
    assert len(batches2) == 2


def test_collate():
    items = [{"a": np.zeros((2, 2)), "b": np.int32(1)} for _ in range(3)]
    out = collate(items)
    assert out["a"].shape == (3, 2, 2)
    assert out["b"].shape == (3,)
