"""Single/folder face-swap driver (one_inference / inference_swap_selected).

Functional parity target: /root/reference/scripts/one_inference.py (folder
mode) and inference_swap_selected.py — loop sources x targets, align+parse,
swap, paste back, save. `--precropped` skips detection/parsing for inputs
that are already aligned with masks (test-bench style).

Usage:
  python -m reface_tpu.cli.swap --target path/dir --source path/dir \
      --outdir out [--tiny]
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from reface_tpu.cli.common import add_model_args, apply_backend, build_swapper


def _list_images(path):
    if os.path.isdir(path):
        out = []
        for ext in ("*.png", "*.jpg", "*.jpeg"):
            out += glob.glob(os.path.join(path, ext))
        return sorted(out)
    return [path]


def _read01(path, size=None):
    import cv2

    img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
    if size is not None and img.shape[0] != size:
        img = cv2.resize(img, (size, size))
    return img.astype(np.float32) / 255.0


def _write01(path, img01):
    import cv2

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    u8 = np.clip(np.asarray(img01) * 255.0, 0, 255).astype(np.uint8)
    cv2.imwrite(path, cv2.cvtColor(u8, cv2.COLOR_RGB2BGR))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    add_model_args(ap)
    ap.add_argument("--target", required=True, help="image or folder")
    ap.add_argument("--source", required=True, help="image or folder")
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--landmark-ckpt", default=None)
    ap.add_argument("--bisenet-ckpt", default=None)
    ap.add_argument("--precropped", action="store_true",
                    help="inputs already aligned; skip detect/parse/paste")
    ap.add_argument("--mask-dir", default=None,
                    help="precropped mode: dir of keep-masks (white=keep) "
                         "matching target basenames; default = inpaint a "
                         "central face-shaped ellipse")
    ap.add_argument("--head-swap", action="store_true",
                    help="universal head swap: include hair/accessories")
    args = ap.parse_args(argv)
    apply_backend(args)

    import jax
    import jax.numpy as jnp

    from reface_tpu.pipelines.raw import RawPipelineConfig, RawSwapPipeline
    from reface_tpu.pipelines.swap import clip_normalize

    swapper = build_swapper(args)
    size = swapper.config.image_size
    targets = _list_images(args.target)
    sources = _list_images(args.source)
    key = jax.random.key(args.seed)

    if args.precropped:
        from reface_tpu.cli.common import decode_keep_mask, default_inpaint_mask

        def keep_mask(tp):
            """Explicit keep-mask file, else a central elliptical inpaint
            region (legacy inference.py takes --mask_path per target)."""
            if args.mask_dir:
                mp = os.path.join(args.mask_dir, os.path.basename(tp))
                try:
                    return decode_keep_mask(mp, size)
                except ValueError:
                    raise SystemExit(f"mask not found: {mp}")
            return default_inpaint_mask(size)

        for sp in sources:
            src = _read01(sp)
            ref = clip_normalize(jnp.asarray(src)[None])
            for tp in targets:
                tgt01 = _read01(tp, size)
                tgt = jnp.asarray(tgt01)[None] * 2 - 1
                mask = jnp.asarray(keep_mask(tp))[None]
                key, sub = jax.random.split(key)
                out = swapper.swap(
                    target_image=tgt, inpaint_image=tgt * mask,
                    inpaint_mask=mask, ref_clip224=ref, key=sub,
                )
                name = (
                    os.path.splitext(os.path.basename(sp))[0]
                    + "_"
                    + os.path.basename(tp)
                )
                _write01(os.path.join(args.outdir, name),
                         (np.asarray(out[0]) + 1) / 2)
                print(f"[swap] {name}")
        return

    bn_params = lm_params = None
    if args.head_swap:
        from reface_tpu.preprocess.masks import HEAD_SWAP_SEG12

        raw_cfg = RawPipelineConfig(seg12_face_classes=HEAD_SWAP_SEG12)
    else:
        raw_cfg = RawPipelineConfig()
    if args.bisenet_ckpt:
        from reface_tpu.ckpt.convert import convert_bisenet, load_torch_state_dict
        from reface_tpu.nn.bisenet import BiSeNet
        import functools

        m = BiSeNet(raw_cfg.bisenet)
        shapes = jax.eval_shape(
            functools.partial(m.init, aux_heads=True), jax.random.key(0),
            jnp.zeros((1, 64, 64, 3)),
        )
        bn_params = convert_bisenet(
            jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes),
            load_torch_state_dict(args.bisenet_ckpt),
        )
    if args.landmark_ckpt:
        from reface_tpu.ckpt.io import load_params

        lm_params = load_params(args.landmark_ckpt)

    pipe = RawSwapPipeline(swapper, raw_cfg, landmark_params=lm_params,
                           bisenet_params=bn_params)

    for sp in sources:
        src = _read01(sp)
        for tp in targets:
            tgt = _read01(tp)
            key, sub = jax.random.split(key)
            out = pipe.swap_images(
                jnp.asarray(tgt)[None], jnp.asarray(src)[None], key=sub
            )
            name = (
                os.path.splitext(os.path.basename(sp))[0]
                + "_"
                + os.path.basename(tp)
            )
            _write01(os.path.join(args.outdir, name), np.asarray(out[0]))
            print(f"[swap] {name}")


if __name__ == "__main__":
    main()
