"""Evaluation driver: CLIP-FID / ID-retrieval / pose / expression over a
results directory vs the dataset, like evaluate_all.sh.

Functional parity target: /root/reference/evaluate_all.sh — four independent
metric CLIs per dataset; here one driver with --metrics selection, using the
reference's exact preprocessing (reface_tpu/eval/protocol.py):
  - FID compares the results dir against the DATASET image dir
    (evaluate_all.sh:50-53), CLIP bicubic-resize-224 + center crop.
  - ID retrieval embeds dataset-rule MASKED 112px crops of sources and
    swaps (ID_retrieval.py:171-250) through the IDLoss pool/crop protocol.
  - Pose/expression use the reference's tensor-Resize / bicubic-512 loads.

Frozen eval-model weights load via --*-ckpt (torch state dicts converted on
the fly) or run random-init for pipeline smoke tests (--allow-random).

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


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--results-dir", required=True,
                    help="dir of {source}_{target}.png swaps")
    ap.add_argument("--dataset-dir", required=True)
    ap.add_argument("--dataset", default="celeba", choices=["celeba", "ffhq", "ff"])
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
    ap.add_argument("--fid-limit", type=int, default=0,
                    help="cap the FID dataset reference set (0 = all)")
    ap.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"])
    args = ap.parse_args(argv)
    from reface_tpu.cli.common import apply_backend

    apply_backend(args)

    import numpy as np

    import jax
    import jax.numpy as jnp

    from reface_tpu.data.test_bench import TestBenchConfig
    from reface_tpu.eval.protocol import (
        clip_fid_load,
        expression_load,
        hopenet_load,
        id_embed_protocol,
        id_masked_112_load,
    )

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
    swap_paths = [p for p, _, _ in pairs]
    tgt_paths = [bench.img_path(t) for _, _, t in pairs]
    results = {}

    def _eval_params(model, init_shape, ckpt, convert_name):
        """Converted torch ckpt or random-init (smoke) params."""
        if ckpt:
            from reface_tpu.ckpt import convert as C

            shapes = jax.eval_shape(
                model.init, jax.random.key(0), jnp.zeros(init_shape)
            )
            return getattr(C, convert_name)(
                jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes),
                C.load_torch_state_dict(ckpt),
            )
        if args.allow_random:
            return model.init(jax.random.key(0), jnp.zeros(init_shape))
        raise SystemExit(f"--ckpt required for this metric (or --allow-random)")

    if "fid" in args.metrics:
        from reface_tpu.eval import CLIP_B32, clip_features, clip_fid
        from reface_tpu.nn.clip import CLIPVisionTower

        tower = CLIPVisionTower(CLIP_B32)
        p = _eval_params(tower, (1, 224, 224, 3), args.clip_ckpt,
                         "convert_clip_vision")
        # reference set = the dataset image dir itself (evaluate_all.sh:50-53)
        img_dir = os.path.dirname(bench.img_path(0))
        ds_paths = sorted(
            q for ext in ("*.jpg", "*.png")
            for q in glob.glob(os.path.join(img_dir, ext))
        )
        if args.fid_limit:
            ds_paths = ds_paths[: args.fid_limit]
        if not ds_paths:
            raise SystemExit(f"no dataset images found in {img_dir}")

        def feats_chunked(paths, chunk=256):
            # load+featurize in chunks: the dataset dir can be 30k images
            # (~18 GB as one float32 array)
            out = [
                clip_features(p, jnp.asarray(clip_fid_load(paths[i:i + chunk])))
                for i in range(0, len(paths), chunk)
            ]
            return np.concatenate(out, axis=0)

        results["clip_fid"] = clip_fid(
            feats_chunked(swap_paths), feats_chunked(ds_paths)
        )

    if "id" in args.metrics:
        from reface_tpu.eval import id_retrieval_metrics
        from reface_tpu.nn.arcface import ArcFaceConfig, IRSE50

        model = IRSE50(ArcFaceConfig())
        p = _eval_params(model, (1, 112, 112, 3), args.arcface_ckpt,
                         "convert_arcface")
        # sources: unique ids, masked by their own parsing mask; swaps:
        # masked by the TARGET's mask (ID_retrieval.py:171-250 +
        # evaluate_all.sh source/target mask args)
        src_ids = sorted({s for _, s, _ in pairs})
        src_index = {s: i for i, s in enumerate(src_ids)}
        preserve_key = {"ff": "ff++"}.get(args.dataset, args.dataset)
        src112 = id_masked_112_load(
            [bench.img_path(s) for s in src_ids],
            [bench.mask_path(s) for s in src_ids],
            preserve_key,
        )
        swap112 = id_masked_112_load(
            swap_paths,
            [bench.mask_path(t) for _, _, t in pairs],
            preserve_key,
        )
        f_src = id_embed_protocol(p, src112)
        f_swap = id_embed_protocol(p, swap112)
        true_idx = np.array([src_index[s] for _, s, _ in pairs])
        results.update(id_retrieval_metrics(f_swap, f_src, true_idx))

    if "pose" in args.metrics:
        from reface_tpu.eval import Hopenet, pose_angles, pose_l2

        model = Hopenet()
        p = _eval_params(model, (1, 224, 224, 3), args.hopenet_ckpt,
                         "convert_hopenet")
        a_t = pose_angles(p, jnp.asarray(hopenet_load(tgt_paths)))
        a_s = pose_angles(p, jnp.asarray(hopenet_load(swap_paths)))
        results["pose_l2_deg"] = pose_l2(a_t, a_s)

    if "expression" in args.metrics:
        from reface_tpu.eval import expression_coeffs, expression_l2
        from reface_tpu.eval.backbones import FaceReconCoeffNet

        model = FaceReconCoeffNet()
        p = _eval_params(model, (1, 224, 224, 3), args.facerecon_ckpt,
                         "convert_facerecon")
        e_t = expression_coeffs(p, jnp.asarray(expression_load(tgt_paths)))
        e_s = expression_coeffs(p, jnp.asarray(expression_load(swap_paths)))
        results["expression_l2"] = expression_l2(e_t, e_s)

    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
