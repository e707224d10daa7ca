"""Standalone reader/writer for dlib's binary serialization format, enough
to parse `shape_predictor_68_face_landmarks.dat` WITHOUT dlib installed.

Format rules implemented (dlib/serialize.h + dlib/image_processing/
shape_predictor.h serialization, reproduced from the public dlib sources'
documented on-disk encoding — no dlib code is used):

  integer   control byte = n_significant_bytes | (0x80 if negative),
            then n bytes little-endian (LSB first); zero -> single 0x00 byte.
  float     serialized as float_details: mantissa (int64, packed as above)
            then exponent (int16, packed); value = mantissa * 2**exponent.
  matrix    long nr, long nc (packed ints), then nr*nc elements row-major.
  vector<f,2>  x then y (floats).
  std::vector  size (packed unsigned), then elements.
  split_feature  unsigned idx1, unsigned idx2, float thresh.
  regression_tree  vector<split_feature> splits, vector<matrix> leaf_values.
  shape_predictor  int version (must be 1), matrix initial_shape,
                   vector<vector<regression_tree>> forests,
                   vector<vector<unsigned>> anchor_idx,
                   vector<vector<vector<f,2>>> deltas.

The writer emits the same encoding, used to synthesize .dat fixtures for
round-trip tests (tests/test_dlib_convert.py).
"""

from __future__ import annotations

import io
import math

import numpy as np

__all__ = ["parse_shape_predictor", "write_shape_predictor",
           "Reader", "Writer"]


class Reader:
    def __init__(self, data: bytes):
        self.f = io.BytesIO(data)

    def _byte(self) -> int:
        b = self.f.read(1)
        if not b:
            raise EOFError("unexpected end of dlib stream")
        return b[0]

    def read_int(self) -> int:
        ctrl = self._byte()
        neg = bool(ctrl & 0x80)
        size = ctrl & 0x7F
        if size > 8:
            raise ValueError(f"bad dlib int control byte {ctrl:#x}")
        val = 0
        data = self.f.read(size)
        if len(data) != size:
            raise EOFError("truncated dlib int")
        for i, byte in enumerate(data):
            val |= byte << (8 * i)
        return -val if neg else val

    def read_float(self) -> float:
        mantissa = self.read_int()
        exponent = self.read_int()
        # float_details special values use extreme exponents
        if exponent > 1024 or exponent < -1100:
            raise ValueError("inf/nan float_details not supported")
        return math.ldexp(mantissa, exponent)

    def read_matrix(self) -> np.ndarray:
        nr = self.read_int()
        nc = self.read_int()
        out = np.empty((nr, nc), np.float32)
        for r in range(nr):
            for c in range(nc):
                out[r, c] = self.read_float()
        return out

    def read_vector2(self) -> tuple[float, float]:
        return self.read_float(), self.read_float()


class Writer:
    def __init__(self):
        self.f = io.BytesIO()

    def getvalue(self) -> bytes:
        return self.f.getvalue()

    def write_int(self, val: int):
        neg = val < 0
        if neg:
            val = -val
        data = []
        while val:
            data.append(val & 0xFF)
            val >>= 8
        if len(data) > 8:
            raise ValueError("int too large for dlib encoding")
        self.f.write(bytes([len(data) | (0x80 if neg else 0)] + data))

    def write_float(self, val: float):
        if not math.isfinite(val):
            raise ValueError("inf/nan not supported")
        mantissa, exponent = math.frexp(float(np.float32(val)))
        # frexp: val = mantissa * 2**exponent with 0.5 <= |mantissa| < 1;
        # float32 has 24 mantissa bits
        m_int = int(mantissa * (1 << 24))
        self.write_int(m_int)
        self.write_int(exponent - 24)

    def write_matrix(self, arr: np.ndarray):
        arr = np.atleast_2d(arr)
        self.write_int(arr.shape[0])
        self.write_int(arr.shape[1])
        for v in arr.ravel():
            self.write_float(float(v))

    def write_vector2(self, x: float, y: float):
        self.write_float(x)
        self.write_float(y)


def parse_shape_predictor(path: str) -> dict:
    """Parse a dlib shape_predictor .dat into plain numpy tensors:
    {"init_shape": (P*2,) float32 normalized coords,
     "cascades": [{"anchors": (F,) int32, "deltas": (F,2) float32,
                   "trees": [(splits [(f1,f2,thr)], leaves (L,P*2))]}]}.
    """
    with open(path, "rb") as f:
        r = Reader(f.read())
    version = r.read_int()
    if version != 1:
        raise ValueError(f"unsupported shape_predictor version {version}")
    init = r.read_matrix().reshape(-1).astype(np.float32)  # (P*2,) col vec
    n_points = init.size // 2

    # forests: vector<vector<regression_tree>>
    n_casc = r.read_int()
    forests = []
    for _ in range(n_casc):
        n_trees = r.read_int()
        trees = []
        for _ in range(n_trees):
            n_splits = r.read_int()
            splits = []
            for _ in range(n_splits):
                idx1 = r.read_int()
                idx2 = r.read_int()
                thr = r.read_float()
                splits.append((idx1, idx2, np.float32(thr)))
            n_leaves = r.read_int()
            leaves = np.empty((n_leaves, n_points * 2), np.float32)
            for i in range(n_leaves):
                leaves[i] = r.read_matrix().reshape(-1)
            trees.append((splits, leaves))
        forests.append(trees)

    # anchor_idx: vector<vector<unsigned long>>
    assert r.read_int() == n_casc, "anchor_idx cascade count mismatch"
    anchors = []
    for _ in range(n_casc):
        n = r.read_int()
        anchors.append(np.array([r.read_int() for _ in range(n)], np.int32))

    # deltas: vector<vector<dlib::vector<float,2>>>
    assert r.read_int() == n_casc, "deltas cascade count mismatch"
    deltas = []
    for _ in range(n_casc):
        n = r.read_int()
        deltas.append(
            np.array([r.read_vector2() for _ in range(n)], np.float32)
        )

    cascades = []
    for c in range(n_casc):
        cascades.append(dict(anchors=anchors[c], deltas=deltas[c],
                             trees=forests[c]))
    return {"init_shape": init, "cascades": cascades}


def write_shape_predictor(path: str, model: dict) -> None:
    """Inverse of parse_shape_predictor (test fixtures; same encoding as
    dlib's serialize(shape_predictor))."""
    w = Writer()
    w.write_int(1)  # version
    init = np.asarray(model["init_shape"], np.float32).reshape(-1, 1)
    w.write_matrix(init)
    cascades = model["cascades"]
    w.write_int(len(cascades))
    for c in cascades:
        w.write_int(len(c["trees"]))
        for splits, leaves in c["trees"]:
            w.write_int(len(splits))
            for f1, f2, thr in splits:
                w.write_int(int(f1))
                w.write_int(int(f2))
                w.write_float(float(thr))
            w.write_int(len(leaves))
            for leaf in leaves:
                w.write_matrix(np.asarray(leaf, np.float32).reshape(-1, 1))
    w.write_int(len(cascades))
    for c in cascades:
        anchors = np.asarray(c["anchors"])
        w.write_int(len(anchors))
        for a in anchors:
            w.write_int(int(a))
    w.write_int(len(cascades))
    for c in cascades:
        deltas = np.asarray(c["deltas"], np.float32)
        w.write_int(len(deltas))
        for dx, dy in deltas:
            w.write_vector2(float(dx), float(dy))
    with open(path, "wb") as f:
        f.write(w.getvalue())
