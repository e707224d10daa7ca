"""Reference-protocol eval preprocessing (reface_tpu/eval/protocol.py)."""

import os

import numpy as np
import pytest

from reface_tpu.eval.protocol import (
    CLIP_MEAN,
    CLIP_STD,
    ID_EVAL_PRESERVE,
    clip_fid_load,
    expression_load,
    hopenet_load,
    id_embed_protocol,
    id_masked_112_load,
    parse_file_number,
)


@pytest.fixture
def img_file(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (300, 400, 3), np.uint8)  # landscape
    p = str(tmp_path / "29001_28001.png")
    Image.fromarray(arr).save(p)
    return p, arr


def test_clip_fid_load_matches_clip_preprocess(img_file):
    """Shorter-edge bicubic resize + center crop (fid_score.py:66-80 via
    clip.load's preprocess)."""
    from PIL import Image

    p, arr = img_file
    out = clip_fid_load([p])
    assert out.shape == (1, 224, 224, 3)
    # expected: 300x400 -> shorter edge 300 -> scale 224/300 -> (299, 224)
    img = Image.fromarray(arr).resize((299, 224), Image.BICUBIC)
    img = img.crop((37, 0, 37 + 224, 224))  # center crop
    expect = np.asarray(img, np.float32) / 255.0
    np.testing.assert_allclose(out[0], expect, atol=1e-6)


def test_id_masked_112_semantics(tmp_path, img_file):
    from PIL import Image

    p, _ = img_file
    # 19-class mask: left half skin (1), right half background (0)
    mask = np.zeros((300, 400), np.uint8)
    mask[:, :200] = 1
    mp = str(tmp_path / "mask.png")
    Image.fromarray(mask).save(mp)

    out = id_masked_112_load([p], [mp], "celeba")
    assert out.shape == (1, 112, 112, 3)
    # right side fully background -> masked to exactly 0
    np.testing.assert_allclose(out[0, :, 80:, :], 0.0, atol=1e-6)
    # left side: CLIP-normalized values, nonzero
    assert np.abs(out[0, :, :40, :]).max() > 0.1
    # values in the interior-left are (x - mean)/std of [0,1] pixels
    assert out.min() >= ((0 - CLIP_MEAN) / CLIP_STD).min() - 1e-3
    assert out.max() <= ((1 - CLIP_MEAN) / CLIP_STD).max() + 1e-3


def test_id_eval_preserve_lists():
    # ID_retrieval.py:204-212 — CelebA eval rule drops hair (17)
    assert 17 not in ID_EVAL_PRESERVE["celeba"]
    assert ID_EVAL_PRESERVE["ffhq"] == (1, 2, 3, 5, 6, 7, 9)


def test_id_embed_protocol_shapes():
    import jax

    from reface_tpu.nn.arcface import ArcFaceConfig, IRSE50

    cfg = ArcFaceConfig(depths=(8, 16, 16, 16), units=(1, 1, 1, 1))
    model = IRSE50(cfg)
    import jax.numpy as jnp

    params = model.init(jax.random.key(0), jnp.zeros((1, 112, 112, 3)))
    x = np.random.default_rng(0).normal(size=(3, 112, 112, 3)).astype(np.float32)
    f = id_embed_protocol(params, x, config=cfg)
    assert f.shape == (3, 512)
    np.testing.assert_allclose(np.linalg.norm(f, axis=1), 1.0, atol=1e-3)


def test_hopenet_and_expression_loads(img_file):
    p, arr = img_file
    h = hopenet_load([p])
    assert h.shape == (1, 224, 224, 3)
    assert 0.0 <= h.min() and h.max() <= 1.0

    from PIL import Image

    e = expression_load([p])
    assert e.shape == (1, 512, 512, 3)
    expect = np.asarray(
        Image.fromarray(arr).resize((512, 512), Image.BICUBIC), np.float32
    ) / 255.0
    np.testing.assert_allclose(e[0], expect, atol=1e-6)


def test_parse_file_number():
    assert parse_file_number("29001_28001.png") == 29001
    assert parse_file_number("abc.png") is None
    assert parse_file_number("img-00042.png") == 42
