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


def convert(dat_path: str, out_path: str) -> None:
    import dlib  # noqa: F401  (offline-only dependency)

    # dlib does not expose shape_predictor internals from Python; the
    # supported conversion path is via dlib's C++ deserialize into this
    # format (see native/tools/dump_dlib_sp.cpp sketch below) or via the
    # python bindings of a patched dlib. Document the expectation here.
    raise SystemExit(
        "dlib's python API does not expose predictor internals; build "
        "native/tools/dump_dlib_sp.cpp against dlib to dump the tensors, "
        "then call write_model(). See native/README.md."
    )


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2])
