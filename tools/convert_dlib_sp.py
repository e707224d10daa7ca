"""Convert a dlib shape_predictor .dat into the reface ERT binary format.

Requires `dlib` installed (offline tool, not needed at runtime). The output
is consumed by native/libreface_native.so (rn_ert_load), giving landmark
parity with the reference's dlib 68-point predictor without a dlib runtime
dependency (SURVEY.md hard-part #1).

Usage:
  python tools/convert_dlib_sp.py shape_predictor_68_face_landmarks.dat out.rert
"""

from __future__ import annotations

import struct
import sys

MAGIC = 0x52455254  # 'RERT'


def write_model(path, init_shape, cascades):
    """cascades: list of dicts with keys anchors (F,), deltas (F,2),
    trees: list of (splits [(f1,f2,thr)...], leaves (L, P*2))."""
    n_points = len(init_shape) // 2
    n_casc = len(cascades)
    n_trees = len(cascades[0]["trees"])
    n_splits = len(cascades[0]["trees"][0][0])
    depth = (n_splits + 1).bit_length() - 1
    n_feats = len(cascades[0]["anchors"])
    with open(path, "wb") as f:
        f.write(struct.pack("<6i", MAGIC, n_points, n_casc, n_trees, depth,
                            n_feats))
        f.write(struct.pack(f"<{n_points*2}f", *init_shape))
        for c in cascades:
            f.write(struct.pack(f"<{n_feats}i", *c["anchors"]))
            flat = [v for d in c["deltas"] for v in d]
            f.write(struct.pack(f"<{n_feats*2}f", *flat))
            for splits, leaves in c["trees"]:
                for f1, f2, thr in splits:
                    f.write(struct.pack("<2if", f1, f2, thr))
                for leaf in leaves:
                    f.write(struct.pack(f"<{n_points*2}f", *leaf))


def convert(dat_path: str, out_path: str) -> dict:
    """Parse a dlib shape_predictor .dat (standalone reader — dlib NOT
    required; tools/dlib_serialize.py implements the on-disk encoding) and
    write the .rert binary. Returns the parsed model for inspection.

    All trees must share one depth (true for dlib-trained predictors: the
    trainer builds complete trees of fixed depth; Kazemi & Sullivan 2014)
    because the native evaluator indexes complete trees.
    """
    from tools.dlib_serialize import parse_shape_predictor

    model = parse_shape_predictor(dat_path)
    cascades = model["cascades"]
    if not cascades:
        raise ValueError("shape predictor has no cascades")

    n_splits = len(cascades[0]["trees"][0][0])
    depth = (n_splits + 1).bit_length() - 1
    if (1 << depth) - 1 != n_splits:
        raise ValueError(f"tree is not complete: {n_splits} splits")
    n_points = len(model["init_shape"]) // 2
    for c in cascades:
        if len(c["anchors"]) != len(c["deltas"]):
            raise ValueError("anchors/deltas length mismatch")
        if c["anchors"].size and int(c["anchors"].max()) >= n_points:
            raise ValueError("anchor index out of range")
        for splits, leaves in c["trees"]:
            if len(splits) != n_splits or len(leaves) != n_splits + 1:
                raise ValueError("ragged tree (all trees must share depth)")

    write_model(out_path, model["init_shape"], cascades)
    print(
        f"[convert_dlib_sp] {dat_path} -> {out_path}: "
        f"{n_points} points, {len(cascades)} cascades, "
        f"{len(cascades[0]['trees'])} trees/cascade, depth {depth}, "
        f"{len(cascades[0]['anchors'])} features/cascade"
    )
    return model


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2])
