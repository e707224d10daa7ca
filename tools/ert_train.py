"""Minimal ERT (cascaded regression trees) landmark trainer.

Trains a dlib-compatible shape predictor — the same model family as
dlib's `shape_predictor_68_face_landmarks.dat` (Kazemi & Sullivan 2014,
"One Millisecond Face Alignment with an Ensemble of Regression Trees")
— whose output serializes through tools/dlib_serialize.py +
tools/convert_dlib_sp.py into the native `.rert` evaluator (native/).

Why this exists: the environment ships no dlib model, so the landmark
stack's accuracy story (SURVEY hard-part #1) would otherwise be
unmeasurable. With this trainer the full loop closes on synthetic faces
with exact ground truth (data/synthetic.py::make_landmark_faces):

    GT geometry --train--> ERT (.rert)  : ERT-vs-GT px error
    ERT labels  --distill--> LandmarkNet : CNN-vs-ERT px error (the
                                           documented tolerance)

Training-time semantics mirror the test-time evaluator EXACTLY
(tests/test_dlib_convert._numpy_ert_predict + native ERT): normalized
box coords, init->current similarity via the least-squares (a, b) pair,
rounded integer pixel sampling with out-of-bounds -> 0, split rule
feats[f1] - feats[f2] > thr, leaf = node - n_splits.

CLI (also usable as a library; see tests/test_ert_train.py):
  python tools/ert_train.py --out model.rert --n-train 1500 --size 256
"""

from __future__ import annotations

import argparse

import numpy as np

__all__ = ["train_ert", "ert_predict_model", "normalized_targets"]


def _extract_feats_batch(images, boxes, img_of, init, cur, anchors, deltas):
    """Pixel intensities at the shape-indexed feature points, vectorized
    over ALL samples. images (n_img,H,W) float; boxes (n_img,4);
    img_of (S,); cur (S,n,2) normalized shapes. Returns (S,F).
    Semantics identical to the per-sample evaluator: per-sample
    init->current similarity (a,b), rotated deltas, rounded integer
    sampling, out-of-bounds -> 0."""
    fm = init.mean(0)
    fc = init - fm
    den = (fc * fc).sum()
    tc = cur - cur.mean(1, keepdims=True)                     # (S,n,2)
    a = (fc[None] * tc).sum((1, 2)) / den                     # (S,)
    b = (fc[None, :, 0] * tc[:, :, 1]
         - fc[None, :, 1] * tc[:, :, 0]).sum(1) / den         # (S,)
    rx = a[:, None] * deltas[None, :, 0] - b[:, None] * deltas[None, :, 1]
    ry = b[:, None] * deltas[None, :, 0] + a[:, None] * deltas[None, :, 1]
    nx = cur[:, anchors, 0] + rx                              # (S,F)
    ny = cur[:, anchors, 1] + ry
    bx0 = boxes[img_of, 0][:, None]
    by0 = boxes[img_of, 1][:, None]
    bw = (boxes[img_of, 2] - boxes[img_of, 0])[:, None]
    bh = (boxes[img_of, 3] - boxes[img_of, 1])[:, None]
    px = np.rint(bx0 + nx * bw).astype(np.int64)
    py = np.rint(by0 + ny * bh).astype(np.int64)
    h, w = images.shape[1:]
    ok = (px >= 0) & (px < w) & (py >= 0) & (py < h)
    vals = images[img_of[:, None],
                  np.clip(py, 0, h - 1), np.clip(px, 0, w - 1)]
    return np.where(ok, vals, 0.0)


def _fit_tree(feats, residuals, depth, n_candidates, lr, rng):
    """One gradient-boosting regression tree.

    feats (S,F), residuals (S,2n). Split selection maximizes
    sum_children |sum residuals|^2 / count (dlib's criterion) over
    n_candidates random (f1, f2, thr) proposals, thr drawn from the
    empirical feature-difference distribution at the node. Returns
    (splits [(f1,f2,thr)] BFS order, leaves (n_leaves,2n), per-sample
    leaf deltas (S,2n) scaled by lr)."""
    s, f = feats.shape
    n_splits = (1 << depth) - 1
    splits = []
    # node -> sample-index arrays, BFS
    node_idx = {0: np.arange(s)}
    for node in range(n_splits):
        idx = node_idx.get(node, np.arange(0))
        best = None
        if len(idx) >= 2:
            r = residuals[idx]
            r_tot = r.sum(0)
            for _ in range(n_candidates):
                f1, f2 = rng.integers(0, f, 2)
                d = feats[idx, f1] - feats[idx, f2]
                thr = d[rng.integers(0, len(d))] * rng.uniform(0.3, 0.9)
                left = d > thr
                nl = int(left.sum())
                if nl == 0 or nl == len(idx):
                    continue
                r_left = r[left].sum(0)
                r_right = r_tot - r_left
                score = (r_left @ r_left) / nl + (
                    r_right @ r_right) / (len(idx) - nl)
                if best is None or score > best[0]:
                    best = (score, f1, f2, thr, left)
        if best is None:  # degenerate node: constant split, all go right
            splits.append((0, 0, np.float32(1e9)))
            node_idx[2 * node + 1] = np.arange(0)
            node_idx[2 * node + 2] = idx
        else:
            _, f1, f2, thr, left = best
            splits.append((int(f1), int(f2), np.float32(thr)))
            node_idx[2 * node + 1] = idx[left]
            node_idx[2 * node + 2] = idx[~left]
    leaves = np.zeros((n_splits + 1, residuals.shape[1]), np.float32)
    delta = np.zeros_like(residuals)
    for leaf in range(n_splits + 1):
        idx = node_idx.get(n_splits + leaf, np.arange(0))
        if len(idx):
            v = lr * residuals[idx].mean(0)
            leaves[leaf] = v.astype(np.float32)
            delta[idx] = leaves[leaf]
    return splits, leaves, delta


def normalized_targets(landmarks, boxes):
    """(N,68,2) pixel landmarks + (N,4) boxes -> (N,68,2) box-normalized."""
    wh = np.stack([boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1]], -1)
    return (landmarks - boxes[:, None, :2]) / wh[:, None, :]


def train_ert(images, landmarks, boxes=None, n_cascades=8, n_trees=80,
              depth=3, n_feats=250, n_candidates=20, lr=0.12,
              oversample=4, feat_pad=0.08, seed=0, verbose=True):
    """Train an ERT shape predictor. images (N,H,W[,3]) uint8;
    landmarks (N,68,2) pixel coords; boxes (N,4) or None = full image
    (the deployment convention of landmark68_fn_from_rert). Returns the
    model dict tools/dlib_serialize.write_shape_predictor accepts."""
    rng = np.random.default_rng(seed)
    images = np.asarray(images)
    if images.ndim == 4:  # rgb -> luma, the evaluator's input convention
        images = (images[..., 0] * 0.299 + images[..., 1] * 0.587
                  + images[..., 2] * 0.114)
    images = images.astype(np.float64)
    n_img, h, w = images.shape
    if boxes is None:
        boxes = np.tile(np.array([0, 0, w - 1, h - 1], np.float64),
                        (n_img, 1))
    targets = normalized_targets(np.asarray(landmarks, np.float64), boxes)
    n_pts = targets.shape[1]
    mean_shape = targets.mean(0)

    # oversampled training set: first start = mean shape, rest = random
    # other images' GT shapes (dlib's oversampling_amount)
    img_of, cur, tgt = [], [], []
    for i in range(n_img):
        for j in range(oversample):
            img_of.append(i)
            tgt.append(targets[i])
            if j == 0:
                cur.append(mean_shape.copy())
            else:
                cur.append(targets[rng.integers(0, n_img)].copy())
    img_of = np.asarray(img_of)
    cur = np.stack(cur)          # (S, n, 2) current shapes
    tgt = np.stack(tgt)          # (S, n, 2) targets
    s = len(img_of)

    lo, hi = mean_shape.min(0) - feat_pad, mean_shape.max(0) + feat_pad
    cascades = []
    for c in range(n_cascades):
        # feature points: uniform in the padded shape region, anchored to
        # the nearest mean-shape landmark (dlib's randomly_sample_pixel_
        # coordinates + nearest-part anchoring)
        pts = rng.uniform(lo, hi, (n_feats, 2))
        d2 = ((pts[:, None, :] - mean_shape[None]) ** 2).sum(-1)
        anchors = d2.argmin(1).astype(np.int32)
        deltas = (pts - mean_shape[anchors]).astype(np.float32)

        feats = _extract_feats_batch(
            images, boxes, img_of, mean_shape, cur, anchors,
            deltas.astype(np.float64),
        )  # (S, F)

        trees = []
        res = (tgt - cur).reshape(s, -1)
        for t in range(n_trees):
            splits, leaves, delta = _fit_tree(
                feats, res, depth, n_candidates, lr, rng)
            trees.append((splits, leaves))
            res = res - delta
        cur = tgt - res.reshape(s, n_pts, 2)
        if verbose:
            err = np.sqrt(((tgt - cur) ** 2).sum(-1)).mean()
            print(f"[ert] cascade {c}: mean normalized err {err:.4f}")
        cascades.append(dict(anchors=anchors, deltas=deltas, trees=trees))

    return {
        "init_shape": mean_shape.reshape(-1).astype(np.float32),
        "cascades": cascades,
    }


def ert_predict_model(model, gray, box):
    """Evaluate the model dict directly (same semantics as the native
    evaluator); returns (n,2) pixel coords. For validation/tests."""
    from tests.test_dlib_convert import _numpy_ert_predict

    return _numpy_ert_predict(model, gray, box)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True,
                    help=".rert output path (a sibling .dat is written too)")
    ap.add_argument("--n-train", type=int, default=1500)
    ap.add_argument("--n-val", type=int, default=200)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--cascades", type=int, default=8)
    ap.add_argument("--trees", type=int, default=80)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--feats", type=int, default=250)
    ap.add_argument("--oversample", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dump-data", default=None,
                    help="also save the train+val arrays as an .npz (the "
                         "distillation input for cli/train_landmarks.py)")
    args = ap.parse_args()

    from reface_tpu.data.synthetic import make_landmark_faces
    from tools.convert_dlib_sp import convert
    from tools.dlib_serialize import write_shape_predictor

    imgs, lms = make_landmark_faces(args.n_train + args.n_val,
                                    size=args.size, seed=args.seed)
    tr, va = slice(0, args.n_train), slice(args.n_train, None)
    model = train_ert(imgs[tr], lms[tr], n_cascades=args.cascades,
                      n_trees=args.trees, depth=args.depth,
                      n_feats=args.feats, oversample=args.oversample,
                      seed=args.seed)

    dat = args.out + ".dat" if not args.out.endswith(".rert") \
        else args.out[:-5] + ".dat"
    write_shape_predictor(dat, model)
    convert(dat, args.out)
    print(f"[ert] wrote {dat} + {args.out}")

    # validation: native evaluator vs known geometry
    from reface_tpu import native_ops as rn

    if rn.available():
        rn.ert_load(args.out)
        g = (imgs[va, ..., 0] * 0.299 + imgs[va, ..., 1] * 0.587
             + imgs[va, ..., 2] * 0.114).astype(np.uint8)
        nval = g.shape[0]
        boxes = np.tile(np.array([0, 0, args.size - 1, args.size - 1],
                                 np.float32), (nval, 1))
        pred = rn.ert_predict_batch(g, boxes).reshape(nval, 68, 2)
        err = np.sqrt(((pred - lms[va]) ** 2).sum(-1)).mean()
        init = model["init_shape"].reshape(68, 2) * (args.size - 1)
        err0 = np.sqrt(((init[None] - lms[va]) ** 2).sum(-1)).mean()
        print(f"[ert] val mean px error @{args.size}px: {err:.2f} "
              f"(mean-shape baseline {err0:.2f}, n={nval})")

    if args.dump_data:
        np.savez_compressed(args.dump_data, images=imgs, landmarks=lms,
                            n_train=args.n_train)
        print(f"[ert] wrote {args.dump_data}")


if __name__ == "__main__":
    main()
