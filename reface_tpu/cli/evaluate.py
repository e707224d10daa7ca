"""Evaluation driver: CLIP-FID / ID-retrieval / pose / expression over a
results directory vs the dataset, like evaluate_all.sh.

Functional parity target: /root/reference/evaluate_all.sh — four independent
metric CLIs per dataset; here one driver with --metrics selection. Frozen
eval-model weights load via --*-ckpt (torch state dicts converted on the
fly) or run random-init for pipeline smoke tests (--allow-random).

Usage:
  python -m reface_tpu.cli.evaluate --results-dir out/results \
      --dataset-dir dataset/FaceData/CelebAMask-HQ --dataset celeba \
      --metrics fid id pose expression
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re

import numpy as np


def _load_images01(paths, size):
    import cv2

    out = np.zeros((len(paths), size, size, 3), np.float32)
    for i, p in enumerate(paths):
        img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        if img.shape[0] != size:
            img = cv2.resize(img, (size, size))
        out[i] = img.astype(np.float32) / 255.0
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--results-dir", required=True,
                    help="dir of {source}_{target}.png swaps")
    ap.add_argument("--dataset-dir", required=True)
    ap.add_argument("--dataset", default="celeba", choices=["celeba", "ffhq"])
    ap.add_argument("--metrics", nargs="+",
                    default=["fid", "id", "pose", "expression"])
    ap.add_argument("--allow-random", action="store_true",
                    help="random-init eval towers (smoke only)")
    ap.add_argument("--arcface-ckpt", default=None)
    ap.add_argument("--clip-ckpt", default=None)
    ap.add_argument("--hopenet-ckpt", default=None)
    ap.add_argument("--facerecon-ckpt", default=None)
    ap.add_argument("--out", default=None, help="write metrics JSON here")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"])
    args = ap.parse_args(argv)
    from reface_tpu.cli.common import apply_backend

    apply_backend(args)

    import jax
    import jax.numpy as jnp

    from reface_tpu.data.test_bench import TestBenchConfig

    bench = TestBenchConfig(dataset_dir=args.dataset_dir, dataset=args.dataset)

    swaps = sorted(glob.glob(os.path.join(args.results_dir, "*.png")))
    if args.limit:
        swaps = swaps[: args.limit]
    if not swaps:
        raise SystemExit(f"no swaps found in {args.results_dir}")
    pair_re = re.compile(r"(\d+)_(\d+)\.png$")
    pairs = []
    for p in swaps:
        m = pair_re.search(p)
        if m:
            pairs.append((p, int(m.group(1)), int(m.group(2))))
    print(f"[evaluate] {len(pairs)} swap images")

    swap_imgs = _load_images01([p for p, _, _ in pairs], 224)
    tgt_imgs = _load_images01(
        [bench.img_path(t) for _, _, t in pairs], 224
    )
    results = {}

    if "fid" in args.metrics:
        from reface_tpu.eval import CLIP_B32, clip_features, clip_fid
        from reface_tpu.nn.clip import CLIPVisionTower

        tower = CLIPVisionTower(CLIP_B32)
        if args.clip_ckpt:
            from reface_tpu.ckpt.convert import convert_clip_vision, load_torch_state_dict

            shapes = jax.eval_shape(
                tower.init, jax.random.key(0), jnp.zeros((1, 224, 224, 3))
            )
            p = convert_clip_vision(
                jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes),
                load_torch_state_dict(args.clip_ckpt),
            )
        elif args.allow_random:
            p = tower.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
        else:
            raise SystemExit("--clip-ckpt required (or --allow-random)")
        fa = clip_features(p, jnp.asarray(swap_imgs))
        fb = clip_features(p, jnp.asarray(tgt_imgs))
        results["clip_fid"] = clip_fid(fa, fb)

    if "id" in args.metrics:
        from reface_tpu.eval import embed_identities, id_retrieval_metrics
        from reface_tpu.nn.arcface import ArcFaceConfig, IRSE50
        import cv2

        model = IRSE50(ArcFaceConfig())
        if args.arcface_ckpt:
            from reface_tpu.ckpt import convert_arcface, load_torch_state_dict

            shapes = jax.eval_shape(
                model.init, jax.random.key(0), jnp.zeros((1, 112, 112, 3))
            )
            p = convert_arcface(
                jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes),
                load_torch_state_dict(args.arcface_ckpt),
            )
        elif args.allow_random:
            p = model.init(jax.random.key(0), jnp.zeros((1, 112, 112, 3)))
        else:
            raise SystemExit("--arcface-ckpt required (or --allow-random)")

        def crops112(imgs01):
            x = imgs01 * 2 - 1
            x = jax.image.resize(jnp.asarray(x), (x.shape[0], 256, 256, 3),
                                 "bilinear")
            x = x[:, 35:223, 32:220, :]
            return jax.image.resize(x, (x.shape[0], 112, 112, 3), "bilinear")

        src_imgs = _load_images01(
            [bench.img_path(s) for _, s, _ in pairs], 224
        )
        f_swap = embed_identities(p, crops112(swap_imgs))
        f_src = embed_identities(p, crops112(src_imgs))
        results.update(id_retrieval_metrics(f_swap, f_src))

    if "pose" in args.metrics:
        from reface_tpu.eval import Hopenet, pose_angles, pose_l2

        model = Hopenet()
        if args.hopenet_ckpt:
            from reface_tpu.ckpt.convert import convert_hopenet, load_torch_state_dict

            shapes = jax.eval_shape(
                model.init, jax.random.key(0), jnp.zeros((1, 224, 224, 3))
            )
            p = convert_hopenet(
                jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes),
                load_torch_state_dict(args.hopenet_ckpt),
            )
        elif args.allow_random:
            p = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
        else:
            raise SystemExit("--hopenet-ckpt required (or --allow-random)")
        a_t = pose_angles(p, jnp.asarray(tgt_imgs))
        a_s = pose_angles(p, jnp.asarray(swap_imgs))
        results["pose_l2_deg"] = pose_l2(a_t, a_s)

    if "expression" in args.metrics:
        from reface_tpu.eval import expression_coeffs, expression_l2
        from reface_tpu.eval.backbones import FaceReconCoeffNet

        model = FaceReconCoeffNet()
        if args.facerecon_ckpt:
            from reface_tpu.ckpt.convert import convert_facerecon, load_torch_state_dict

            shapes = jax.eval_shape(
                model.init, jax.random.key(0), jnp.zeros((1, 224, 224, 3))
            )
            p = convert_facerecon(
                jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes),
                load_torch_state_dict(args.facerecon_ckpt),
            )
        elif args.allow_random:
            p = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
        else:
            raise SystemExit("--facerecon-ckpt required (or --allow-random)")
        e_t = expression_coeffs(p, jnp.asarray(tgt_imgs))
        e_s = expression_coeffs(p, jnp.asarray(swap_imgs))
        results["expression_l2"] = expression_l2(e_t, e_s)

    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
