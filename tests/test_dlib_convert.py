"""dlib shape_predictor conversion path (SURVEY hard-part #1).

Round-trips the dlib on-disk encoding (tools/dlib_serialize.py), converts a
synthesized .dat to .rert (tools/convert_dlib_sp.py), checks the native ERT
evaluator against a from-the-paper numpy reference (Kazemi & Sullivan 2014 /
dlib shape_predictor test-time semantics), and verifies the standalone C++
converter (native/tools/dump_dlib_sp.cpp) produces byte-identical output.

Tolerance documentation (alignmengt.py:39-80 consumers): the .rert stores
dlib's exact float32 tensors (the float_details encoding is exact for
float32), so converted-model predictions match dlib's up to the evaluator's
pixel-rounding convention — the fixture test below asserts exact agreement
with the reference implementation on integer pixel sampling.
"""

import shutil
import subprocess

import numpy as np
import pytest

from tools.dlib_serialize import (
    Reader,
    Writer,
    parse_shape_predictor,
    write_shape_predictor,
)


def _codec_roundtrip_int(v):
    w = Writer()
    w.write_int(v)
    return Reader(w.getvalue()).read_int()


def test_int_codec():
    for v in (0, 1, -1, 127, 128, 255, 256, 2**31, -(2**31), 2**63 - 1,
              -(2**63 - 1), 68, 499):
        assert _codec_roundtrip_int(v) == v


def test_float_codec_exact_for_float32():
    w = Writer()
    vals = [0.0, 1.0, -1.0, 0.5, 1 / 3, -2.5, 3.14159, 1e-20, -1e20,
            np.float32(0.123456).item()]
    for v in vals:
        w.write_float(v)
    r = Reader(w.getvalue())
    for v in vals:
        assert np.float32(r.read_float()) == np.float32(v)


def _random_model(rng, n_points=7, n_casc=3, n_trees=4, depth=3, n_feats=16):
    n_splits = (1 << depth) - 1
    cascades = []
    for _ in range(n_casc):
        trees = []
        for _ in range(n_trees):
            splits = [
                (int(rng.integers(0, n_feats)), int(rng.integers(0, n_feats)),
                 np.float32(rng.normal() * 20))
                for _ in range(n_splits)
            ]
            leaves = rng.normal(size=(n_splits + 1, n_points * 2)).astype(
                np.float32) * 0.01
            trees.append((splits, leaves))
        cascades.append(dict(
            anchors=rng.integers(0, n_points, n_feats).astype(np.int32),
            deltas=(rng.normal(size=(n_feats, 2)) * 0.05).astype(np.float32),
            trees=trees,
        ))
    init = (rng.uniform(0.2, 0.8, n_points * 2)).astype(np.float32)
    return {"init_shape": init, "cascades": cascades}


def test_shape_predictor_dat_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    model = _random_model(rng)
    dat = str(tmp_path / "synth.dat")
    write_shape_predictor(dat, model)
    back = parse_shape_predictor(dat)
    np.testing.assert_array_equal(back["init_shape"], model["init_shape"])
    assert len(back["cascades"]) == len(model["cascades"])
    for a, b in zip(back["cascades"], model["cascades"]):
        np.testing.assert_array_equal(a["anchors"], b["anchors"])
        np.testing.assert_array_equal(a["deltas"], b["deltas"])
        for (sa, la), (sb, lb) in zip(a["trees"], b["trees"]):
            assert [(int(x), int(y), np.float32(t)) for x, y, t in sa] == \
                   [(int(x), int(y), np.float32(t)) for x, y, t in sb]
            np.testing.assert_array_equal(la, lb)


def _numpy_ert_predict(model, gray, box):
    """Reference ERT evaluation with dlib test-time semantics."""
    bx0, by0, bx1, by1 = box
    bw, bh = bx1 - bx0, by1 - by0
    init = model["init_shape"].astype(np.float64)
    shape = init.copy()
    n = len(init) // 2
    h, w = gray.shape

    def sample(nx, ny):
        px = int(np.rint(bx0 + nx * bw))
        py = int(np.rint(by0 + ny * bh))
        if px < 0 or px >= w or py < 0 or py >= h:
            return 0.0
        return float(gray[py, px])

    for c in model["cascades"]:
        f = init.reshape(-1, 2)
        t = shape.reshape(-1, 2)
        fm, tm = f.mean(0), t.mean(0)
        fc, tc = f - fm, t - tm
        den = (fc * fc).sum()
        a = (fc * tc).sum() / den
        b = (fc[:, 0] * tc[:, 1] - fc[:, 1] * tc[:, 0]).sum() / den
        feats = np.empty(len(c["anchors"]))
        for i, (anchor, (dx, dy)) in enumerate(zip(c["anchors"], c["deltas"])):
            rx = a * dx - b * dy
            ry = b * dx + a * dy
            feats[i] = sample(shape[anchor * 2] + rx, shape[anchor * 2 + 1] + ry)
        n_splits = len(c["trees"][0][0])
        depth = (n_splits + 1).bit_length() - 1
        for splits, leaves in c["trees"]:
            node = 0
            for _ in range(depth):
                f1, f2, thr = splits[node]
                node = node * 2 + 1 + (0 if feats[f1] - feats[f2] > thr else 1)
            shape = shape + leaves[node - n_splits].astype(np.float64)
    out = shape.reshape(n, 2).copy()
    out[:, 0] = bx0 + out[:, 0] * bw
    out[:, 1] = by0 + out[:, 1] * bh
    return out


def test_convert_and_native_predict_match_reference(tmp_path):
    from reface_tpu import native_ops as rn
    from tools.convert_dlib_sp import convert

    if not rn.available():
        pytest.skip("native lib unavailable")

    rng = np.random.default_rng(1)
    model = _random_model(rng, n_points=5, n_casc=2, n_trees=3, depth=2,
                          n_feats=8)
    dat = str(tmp_path / "synth.dat")
    rert = str(tmp_path / "synth.rert")
    write_shape_predictor(dat, model)
    convert(dat, rert)

    rn.ert_load(rert)
    gray = rng.integers(0, 255, (80, 70), np.uint8)
    box = (8.0, 6.0, 60.0, 72.0)
    got = rn.ert_predict(gray, box)
    want = _numpy_ert_predict(model, gray, box)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_cpp_dump_tool_matches_python(tmp_path):
    """native/tools/dump_dlib_sp.cpp must produce byte-identical .rert."""
    gxx = shutil.which("g++")
    if gxx is None:
        pytest.skip("g++ unavailable")
    from tools.convert_dlib_sp import convert

    rng = np.random.default_rng(2)
    model = _random_model(rng, n_points=4, n_casc=2, n_trees=2, depth=2,
                          n_feats=6)
    dat = str(tmp_path / "synth.dat")
    write_shape_predictor(dat, model)

    py_rert = str(tmp_path / "py.rert")
    convert(dat, py_rert)

    exe = str(tmp_path / "dump_dlib_sp")
    subprocess.run(
        [gxx, "-O2", "-std=c++17", "-o", exe,
         "native/tools/dump_dlib_sp.cpp"],
        check=True,
    )
    cpp_rert = str(tmp_path / "cpp.rert")
    subprocess.run([exe, dat, cpp_rert], check=True)
    with open(py_rert, "rb") as a, open(cpp_rert, "rb") as b:
        assert a.read() == b.read()
