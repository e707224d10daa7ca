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
    ap.add_argument("--landmark-ckpt", default=None,
                    help="LandmarkNet params (batched on-device landmarks)")
    ap.add_argument("--landmark-rert", default=None,
                    help="native .rert ERT model: EXACT dlib-parity "
                         "landmarks on the host for align + conditioning "
                         "(eager path only — rejected with --fused, whose "
                         "one-XLA-program body cannot call the host; use "
                         "--landmark-ckpt there)")
    ap.add_argument("--bisenet-ckpt", default=None)
    ap.add_argument("--precropped", action="store_true",
                    help="inputs already aligned; skip detect/parse/paste")
    ap.add_argument("--mask-dir", default=None,
                    help="precropped mode: dir of keep-masks (white=keep) "
                         "matching target basenames; default = inpaint a "
                         "central face-shaped ellipse")
    ap.add_argument("--head-swap", action="store_true",
                    help="universal head swap: include hair/accessories")
    ap.add_argument("--guidance", default=None,
                    help="comma list of gradient-guidance terms: id,seg,exp "
                         "(ddim_guided.py:380-609 semantics)")
    ap.add_argument("--guidance-scale", type=float, default=1.0)
    ap.add_argument("--id-guidance-weight", type=float, default=1.0)
    ap.add_argument("--seg-guidance-weight", type=float, default=10.0,
                    help="seg-L1 over classes 1,11,12,13 (ddim_guided:434-456)")
    ap.add_argument("--exp-guidance-weight", type=float, default=100.0,
                    help="3DMM expression cosine (ddim_guided:460-508)")
    ap.add_argument("--d3dfr-ckpt", default=None,
                    help="D3DFR coeff net for --guidance exp")
    ap.add_argument("--fused", action="store_true",
                    help="latency mode: compile the whole raw path "
                         "(detect+align+parse+swap+paste-back) as ONE XLA "
                         "program — one device dispatch per image pair "
                         "(RawSwapPipeline.swap_images_fused). XLA "
                         "specializes on input shape: best when all frames "
                         "share one resolution (each new (H,W) recompiles)")
    args = ap.parse_args(argv)
    apply_backend(args)

    import jax
    import jax.numpy as jnp

    from reface_tpu.pipelines.raw import RawPipelineConfig, RawSwapPipeline
    from reface_tpu.pipelines.swap import clip_normalize

    if args.guidance and args.fused:
        # swap_images_fused passes the param tree as jit ARGUMENTS to
        # keep multi-GB constants out of the MLIR (pipelines/raw.py);
        # the guided monkeypatch below binds the ORIGINAL swapper, so
        # tracing it inside the fused program would read the concrete
        # self.params and bake them in as dense constants — the exact
        # remote-compile failure that plumbing prevents.
        raise SystemExit("--fused cannot be combined with --guidance: "
                         "the gradient-guided sampler runs eager "
                         "(per-stage) only")

    swapper = build_swapper(args)
    size = swapper.config.image_size

    if args.guidance:
        # route every swap through the gradient-guided sampler; the raw
        # pipeline and the precropped loop below both call swapper.swap
        import functools

        terms = tuple(t.strip() for t in args.guidance.split(",") if t.strip())
        bad = set(terms) - {"id", "seg", "exp"}
        if bad:
            raise SystemExit(f"unknown --guidance terms: {sorted(bad)}")
        seg_fn = exp_fn = None
        if "seg" in terms:
            from reface_tpu.nn.bisenet import (
                SEG_MEAN,
                SEG_STD,
                BiSeNet,
                BiSeNetConfig,
            )

            bcfg = BiSeNetConfig(dtype=jnp.float32)
            bise = BiSeNet(bcfg)
            if args.bisenet_ckpt:
                from reface_tpu.ckpt.convert import (
                    convert_bisenet,
                    load_torch_state_dict,
                )

                shapes = jax.eval_shape(
                    bise.init, jax.random.key(0), jnp.zeros((1, 64, 64, 3))
                )
                bparams = convert_bisenet(
                    jax.tree.map(lambda s: np.zeros(s.shape, np.float32),
                                 shapes),
                    load_torch_state_dict(args.bisenet_ckpt),
                )
            else:
                print("[swap] WARNING: --guidance seg with random BiSeNet "
                      "(no --bisenet-ckpt)")
                bparams = bise.init(jax.random.key(0),
                                    jnp.zeros((1, 64, 64, 3)))

            def seg_fn(img_pm1):
                # 19-class logits at 256px (ddim_guided.py:434-456)
                b = img_pm1.shape[0]
                x01 = jax.image.resize(
                    (img_pm1 + 1.0) / 2.0, (b, 256, 256, 3), "bilinear"
                )
                return bise.apply(bparams, (x01 - SEG_MEAN) / SEG_STD)

        if "exp" in terms:
            from reface_tpu.eval.backbones import FaceReconCoeffNet

            net = FaceReconCoeffNet()
            if args.d3dfr_ckpt:
                from reface_tpu.ckpt.convert import (
                    convert_facerecon,
                    load_torch_state_dict,
                )

                shapes = jax.eval_shape(
                    net.init, jax.random.key(0), jnp.zeros((1, 224, 224, 3))
                )
                nparams = convert_facerecon(
                    jax.tree.map(lambda s: np.zeros(s.shape, np.float32),
                                 shapes),
                    load_torch_state_dict(args.d3dfr_ckpt),
                    prefix="net_recon.backbone.",
                )
            else:
                print("[swap] WARNING: --guidance exp with random D3DFR "
                      "(no --d3dfr-ckpt)")
                nparams = net.init(jax.random.key(0),
                                   jnp.zeros((1, 224, 224, 3)))

            def exp_fn(img01):
                b = img01.shape[0]
                x = jax.image.resize(img01, (b, 224, 224, 3), "bilinear")
                return net.apply(nparams, x)[:, 80:144]

        swapper.swap = functools.partial(
            swapper.swap_guided, guidance=terms,
            guidance_scale=args.guidance_scale,
            id_weight=args.id_guidance_weight,
            seg_weight=args.seg_guidance_weight,
            exp_weight=args.exp_guidance_weight,
            seg_logits_fn=seg_fn, exp_coeff_fn=exp_fn,
        )

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

    if args.head_swap:
        from reface_tpu.preprocess.masks import HEAD_SWAP_SEG12

        seg12 = HEAD_SWAP_SEG12
    else:
        from reface_tpu.pipelines.raw import DEFAULT_SEG12_FACE as seg12
    if args.tiny:
        from reface_tpu.pipelines.raw import tiny_raw_config

        raw_cfg = tiny_raw_config(seg12_face_classes=seg12)
    else:
        raw_cfg = RawPipelineConfig(seg12_face_classes=seg12)
    from reface_tpu.cli.common import build_raw_pipeline

    pipe = build_raw_pipeline(args, swapper, raw_cfg)

    for sp in sources:
        src = _read01(sp)
        for tp in targets:
            tgt = _read01(tp)
            key, sub = jax.random.split(key)
            swap_fn = pipe.swap_images_fused if args.fused else pipe.swap_images
            out = swap_fn(
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
