"""Dataset preparation tools.

Functional parity targets:
  - merge-celeba-masks: /root/reference/process_CelebA_mask.py — merge
    CelebAMask-HQ per-class PNGs ({id//2000}/{id:05d}_{class}.png) into a
    single 19-class Overall_mask/{id}.png.
  - estimate-ffhq-masks: /root/reference/esitmate_FFHQ_mask.py — run the
    BiSeNet parser over FFHQ images512 and save 19-class masks.
  - crop-and-mask: /root/reference/Crop_and_mask.py — align the eval source
    range to 1024^2 crops and produce masks (needs landmark + parser ckpts).

Usage:
  python -m reface_tpu.cli.prepare_data merge-celeba-masks --dataset-dir D
  python -m reface_tpu.cli.prepare_data estimate-ffhq-masks --dataset-dir D \
      --bisenet-ckpt 79999_iter.pth [--batch 8]
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

# CelebAMask-HQ per-class file suffixes, index = class id (1-based)
CELEBA_CLASS_SUFFIXES = [
    "skin", "nose", "eye_g", "l_eye", "r_eye", "l_brow", "r_brow", "l_ear",
    "r_ear", "mouth", "u_lip", "l_lip", "hair", "hat", "ear_r", "neck_l",
    "neck", "cloth",
]


def merge_celeba_masks(dataset_dir: str, count: int = 30000) -> None:
    import cv2

    mask_root = os.path.join(dataset_dir, "CelebA-HQ-mask")
    out_dir = os.path.join(mask_root, "Overall_mask")
    os.makedirs(out_dir, exist_ok=True)
    for idx in range(count):
        folder = os.path.join(mask_root, str(idx // 2000))
        overall = None
        for cls_id, suffix in enumerate(CELEBA_CLASS_SUFFIXES, start=1):
            p = os.path.join(folder, f"{idx:05d}_{suffix}.png")
            if not os.path.exists(p):
                continue
            m = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
            if overall is None:
                overall = np.zeros_like(m, np.uint8)
            overall[m > 127] = cls_id
        if overall is not None:
            cv2.imwrite(os.path.join(out_dir, f"{idx}.png"), overall)
        if idx % 1000 == 0:
            print(f"[merge] {idx}/{count}")


def estimate_ffhq_masks(dataset_dir: str, bisenet_ckpt: str | None,
                        batch: int = 8, allow_random: bool = False) -> None:
    import cv2
    import jax
    import jax.numpy as jnp

    from reface_tpu.nn.bisenet import BiSeNet, BiSeNetConfig, SEG_MEAN, SEG_STD

    model = BiSeNet(BiSeNetConfig())
    if bisenet_ckpt:
        import functools

        from reface_tpu.ckpt.convert import convert_bisenet, load_torch_state_dict

        shapes = jax.eval_shape(
            functools.partial(model.init, aux_heads=True), jax.random.key(0),
            jnp.zeros((1, 64, 64, 3)),
        )
        params = convert_bisenet(
            jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes),
            load_torch_state_dict(bisenet_ckpt),
        )
    elif allow_random:
        params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                            aux_heads=True)
    else:
        raise SystemExit("--bisenet-ckpt required (or --allow-random)")

    fwd = jax.jit(
        lambda p, x: jnp.argmax(model.apply(p, (x - SEG_MEAN) / SEG_STD),
                                axis=-1).astype(jnp.int32)
    )
    img_dir = os.path.join(dataset_dir, "images512")
    out_dir = os.path.join(dataset_dir, "BiSeNet_mask")
    os.makedirs(out_dir, exist_ok=True)
    paths = sorted(glob.glob(os.path.join(img_dir, "*.png")))
    for i in range(0, len(paths), batch):
        chunk = paths[i : i + batch]
        imgs = np.stack([
            cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB) for p in chunk
        ]).astype(np.float32) / 255.0
        if imgs.shape[0] < batch:  # pad tail to compiled shape
            imgs = np.concatenate(
                [imgs, np.repeat(imgs[-1:], batch - imgs.shape[0], 0)]
            )
        masks = np.asarray(fwd(params, jnp.asarray(imgs)))[: len(chunk)]
        for p, m in zip(chunk, masks):
            cv2.imwrite(os.path.join(out_dir, os.path.basename(p)),
                        m.astype(np.uint8))
        print(f"[ffhq-masks] {min(i + batch, len(paths))}/{len(paths)}")


def crop_and_mask(dataset_dir: str, out_dir: str, start: int, count: int,
                  allow_random: bool = False, landmark_ckpt: str | None = None,
                  bisenet_ckpt: str | None = None, batch: int = 4) -> None:
    """Align + mask an id range (Crop_and_mask.py parity: the 29000-30000
    eval source set) using the on-device raw pipeline stages."""
    import cv2
    import jax
    import jax.numpy as jnp

    from reface_tpu.pipelines.raw import RawPipelineConfig, RawSwapPipeline
    from reface_tpu.pipelines.swap import SwapModules, tiny_swap_config

    if not (allow_random or (landmark_ckpt and bisenet_ckpt)):
        raise SystemExit("need --landmark-ckpt + --bisenet-ckpt (or --allow-random)")
    # only the detection/alignment/parsing stages are used
    pipe = RawSwapPipeline(SwapModules(tiny_swap_config()), RawPipelineConfig())
    os.makedirs(os.path.join(out_dir, "crops"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "masks"), exist_ok=True)
    ids = list(range(start, start + count))
    for i in range(0, len(ids), batch):
        chunk = ids[i : i + batch]
        imgs = []
        for idx in chunk:
            p_img = os.path.join(dataset_dir, "CelebA-HQ-img", f"{idx}.jpg")
            imgs.append(cv2.cvtColor(cv2.imread(p_img), cv2.COLOR_BGR2RGB))
        arr = np.stack(imgs).astype(np.float32) / 255.0
        x = jnp.asarray(arr)
        lm = pipe.detect_landmarks(x)
        crops, _ = pipe.align(x, lm)
        seg = pipe.parse(crops)
        for j, idx in enumerate(chunk):
            u8 = np.clip(np.asarray(crops[j]) * 255, 0, 255).astype(np.uint8)
            cv2.imwrite(os.path.join(out_dir, "crops", f"{idx}.png"),
                        cv2.cvtColor(u8, cv2.COLOR_RGB2BGR))
            cv2.imwrite(os.path.join(out_dir, "masks", f"{idx}.png"),
                        np.asarray(seg[j]).astype(np.uint8))
        print(f"[crop-and-mask] {min(i + batch, len(ids))}/{len(ids)}")


def make_priors(target_dir: str, source_dir: str, mask_dir: str,
                out_dir: str, method: str = "tps", grid: int = 128,
                size: int = 512, tiny: bool = False,
                ckpt: str | None = None,
                landmark_ckpt: str | None = None) -> None:
    """make_priors.py parity: prior images for Start_from_target.

    Pairs the i-th (sorted) target with the i-th source (the reference
    pairs tar_start+i with src_start+i over pre-cropped Val_target/Val
    dirs, make_priors.py:33-52). The target mask (white = face) matches
    the target basename in mask_dir.

    method=dift: argmax-cosine correspondence over the swap UNet's own
    diffusion features at t=261 (the reference's DIFT mechanism);
    method=tps: 68-landmark TPS warp (classical equivalent).
    """
    import cv2
    import jax
    import jax.numpy as jnp

    from reface_tpu.pipelines.swap import FaceSwapper, SwapConfig, tiny_swap_config
    from reface_tpu.preprocess.priors import (
        dift_prior,
        landmark_tps_prior,
        make_unet_feats_fn,
    )

    def listing(d):
        out = []
        for ext in ("*.png", "*.jpg", "*.jpeg"):
            out += glob.glob(os.path.join(d, ext))
        return sorted(out)

    targets, sources = listing(target_dir), listing(source_dir)
    n = min(len(targets), len(sources))
    if n == 0:
        raise SystemExit("no image pairs found")

    cfg = tiny_swap_config(image_size=size) if tiny else SwapConfig(image_size=size)
    if ckpt:
        from reface_tpu.ckpt.io import load_params

        shapes = jax.eval_shape(
            lambda k: FaceSwapper.init_params(cfg, k), jax.random.key(0)
        )
        params = load_params(
            ckpt, jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
        )
    else:
        params = FaceSwapper.init_params(cfg, jax.random.key(0))
    swapper = FaceSwapper(cfg, params)

    feats_fn = None
    landmark_fn = None
    if method == "dift":
        feats_fn = make_unet_feats_fn(swapper, params)
    else:
        from reface_tpu.nn.landmarks import LandmarkNet, LandmarkNetConfig

        lm_cfg = LandmarkNetConfig() if not tiny else LandmarkNetConfig(
            widths=(8, 16, 32, 32), input_size=64, dtype=jnp.float32
        )
        net = LandmarkNet(lm_cfg)
        if landmark_ckpt:
            from reface_tpu.ckpt.io import load_params as _lp

            lm_params = _lp(landmark_ckpt)
        else:
            lm_params = net.init(
                jax.random.key(1),
                jnp.zeros((1, lm_cfg.input_size, lm_cfg.input_size, 3)),
            )

        def landmark_fn(img01):
            s = lm_cfg.input_size
            x = jax.image.resize(img01[None], (1, s, s, 3), "bilinear") * 2 - 1
            lm = net.apply(lm_params, x).reshape(68, 2)
            return lm * (img01.shape[0] / s)

    os.makedirs(out_dir, exist_ok=True)
    for i in range(n):
        t_im = cv2.cvtColor(cv2.imread(targets[i]), cv2.COLOR_BGR2RGB)
        s_im = cv2.cvtColor(cv2.imread(sources[i]), cv2.COLOR_BGR2RGB)
        if t_im.shape[0] != size:
            t_im = cv2.resize(t_im, (size, size))
        if s_im.shape[0] != size:
            s_im = cv2.resize(s_im, (size, size))
        mp = os.path.join(mask_dir, os.path.basename(targets[i]))
        mp = mp if os.path.exists(mp) else os.path.splitext(mp)[0] + ".png"
        m = cv2.imread(mp, cv2.IMREAD_GRAYSCALE)
        if m is None:
            raise SystemExit(f"mask not found for {targets[i]}")
        if m.shape[0] != size:
            m = cv2.resize(m, (size, size), interpolation=cv2.INTER_NEAREST)
        mask = jnp.asarray((m > 127).astype(np.float32))[..., None]
        tgt = jnp.asarray(t_im.astype(np.float32) / 127.5 - 1.0)
        src = jnp.asarray(s_im.astype(np.float32) / 127.5 - 1.0)
        if method == "dift":
            prior = dift_prior(tgt, src, mask, feats_fn, grid=grid)
        else:
            t_lm = landmark_fn(jnp.asarray(t_im, jnp.float32) / 255.0)
            s_lm = landmark_fn(jnp.asarray(s_im, jnp.float32) / 255.0)
            prior = landmark_tps_prior(tgt, src, t_lm, s_lm, mask)
        u8 = np.clip((np.asarray(prior) + 1) * 127.5, 0, 255).astype(np.uint8)
        cv2.imwrite(os.path.join(out_dir, os.path.basename(targets[i])),
                    cv2.cvtColor(u8, cv2.COLOR_RGB2BGR))
        if (i + 1) % 10 == 0 or i == n - 1:
            print(f"[make-priors:{method}] {i + 1}/{n}")


def expand_sd_checkpoint(src: str, dst: str) -> None:
    """modify_checkpoints.py parity: 4->9 channel conv_in zero-pad."""
    import torch

    from reface_tpu.ckpt.convert import expand_conv_in

    obj = torch.load(src, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    sd = expand_conv_in(sd)
    torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v))
                               for k, v in sd.items()}}, dst)
    print(f"[expand] wrote {dst}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    m = sub.add_parser("merge-celeba-masks")
    m.add_argument("--dataset-dir", required=True)
    m.add_argument("--count", type=int, default=30000)
    e = sub.add_parser("estimate-ffhq-masks")
    e.add_argument("--dataset-dir", required=True)
    e.add_argument("--bisenet-ckpt", default=None)
    e.add_argument("--batch", type=int, default=8)
    e.add_argument("--allow-random", action="store_true")
    e.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"])
    x = sub.add_parser("expand-sd-checkpoint")
    x.add_argument("--src", required=True)
    x.add_argument("--dst", required=True)
    p = sub.add_parser("make-priors")
    p.add_argument("--target-dir", required=True)
    p.add_argument("--source-dir", required=True)
    p.add_argument("--mask-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--method", default="tps", choices=["tps", "dift"])
    p.add_argument("--grid", type=int, default=128)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--ckpt", default=None,
                   help="swap params dir (dift features / none = random)")
    p.add_argument("--landmark-ckpt", default=None)
    p.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"])
    c = sub.add_parser("crop-and-mask")
    c.add_argument("--dataset-dir", required=True)
    c.add_argument("--out-dir", required=True)
    c.add_argument("--start", type=int, default=29000)
    c.add_argument("--count", type=int, default=1000)
    c.add_argument("--allow-random", action="store_true")
    c.add_argument("--landmark-ckpt", default=None)
    c.add_argument("--bisenet-ckpt", default=None)
    c.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"])
    args = ap.parse_args(argv)

    if args.cmd == "merge-celeba-masks":
        merge_celeba_masks(args.dataset_dir, args.count)
    elif args.cmd == "estimate-ffhq-masks":
        from reface_tpu.cli.common import apply_backend

        apply_backend(args)
        estimate_ffhq_masks(args.dataset_dir, args.bisenet_ckpt, args.batch,
                            args.allow_random)
    elif args.cmd == "expand-sd-checkpoint":
        expand_sd_checkpoint(args.src, args.dst)
    elif args.cmd == "make-priors":
        from reface_tpu.cli.common import apply_backend

        apply_backend(args)
        make_priors(args.target_dir, args.source_dir, args.mask_dir,
                    args.out_dir, args.method, args.grid, args.size,
                    args.tiny, args.ckpt, args.landmark_ckpt)
    elif args.cmd == "crop-and-mask":
        from reface_tpu.cli.common import apply_backend

        apply_backend(args)
        crop_and_mask(args.dataset_dir, args.out_dir, args.start, args.count,
                      args.allow_random, args.landmark_ckpt, args.bisenet_ckpt)


if __name__ == "__main__":
    main()
