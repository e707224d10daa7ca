"""First-stage (VAE) fine-tuning with the LPIPS+KL+PatchGAN loss.

Driver for `diffusion/vae_loss.py` — the TPU-native rebuild of the
reference's `LPIPSWithDiscriminator` / AutoencoderKL two-optimizer training
(ldm/models/autoencoder.py:351-418, ldm/modules/losses/contperceptual.py).
REFace's shipped config freezes the VAE (`torch.nn.Identity` loss,
configs/train.yaml:69-70), so this driver is the beyond-shipped-config
capability: adapting the first stage itself (e.g. to a new face domain)
before UNet training.

Usage:
  python -m reface_tpu.cli.train_vae --images <dir> --out vae_ckpt \
      --steps 1000 --lpips-ckpt lpips.pth [--vae-ckpt sd.ckpt] \
      [--disc-start 0] [--backend cpu --tiny]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time


def _load_images(folder: str, size: int, limit: int = 0):
    """Folder of images -> (N,size,size,3) float32 in [-1,1]."""
    from PIL import Image
    import numpy as np

    paths = sorted(
        p for ext in ("png", "jpg", "jpeg") for p in glob.glob(
            os.path.join(folder, f"*.{ext}"))
    )
    if limit:
        paths = paths[:limit]
    if not paths:
        raise SystemExit(f"no images in {folder}")
    out = np.stack([
        np.asarray(
            Image.open(p).convert("RGB").resize((size, size), Image.BILINEAR),
            np.float32,
        ) / 127.5 - 1.0
        for p in paths
    ])
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--images", required=True, help="folder of face images")
    ap.add_argument("--out", required=True, help="orbax checkpoint dir")
    ap.add_argument("--vae-ckpt", default=None,
                    help="torch .ckpt/.pth (converted) or orbax VAE params; "
                         "default: fresh init")
    ap.add_argument("--lpips-ckpt", default=None,
                    help="LPIPS torch weights; REQUIRED for a meaningful "
                         "perceptual term (random features otherwise)")
    ap.add_argument("--allow-random-lpips", action="store_true")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--max-images", type=int, default=4096,
                    help="cap on images loaded to host RAM (a 256px image "
                         "is ~0.8 MB as float32; 0 = no cap)")
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=4.5e-6,
                    help="base lr (autoencoder.py uses lr for both opts)")
    ap.add_argument("--disc-start", type=int, default=50001,
                    help="step after which the GAN term engages "
                         "(contperceptual disc_start)")
    ap.add_argument("--disc-loss", default="hinge",
                    choices=["hinge", "vanilla"])
    ap.add_argument("--kl-weight", type=float, default=1e-6,
                    help="reference first-stage configs use 1e-6")
    ap.add_argument("--disc-weight", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log-every", type=int, default=25)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny VAE width (smoke/CI)")
    ap.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"])
    args = ap.parse_args(argv)
    from reface_tpu.cli.common import apply_backend

    apply_backend(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from reface_tpu.ckpt.io import load_params, save_params
    from reface_tpu.diffusion.vae_loss import VAELossConfig, make_vae_train_step
    from reface_tpu.nn.vae import AutoencoderKL, VAEConfig

    vae_cfg = (
        VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1,
                  dtype=jnp.float32)
        if args.tiny else VAEConfig(remat=True)
    )
    vae = AutoencoderKL(vae_cfg)
    key = jax.random.key(args.seed)
    if args.vae_ckpt and not os.path.isdir(args.vae_ckpt):
        from reface_tpu.ckpt.convert import convert_vae, load_torch_state_dict

        shapes = jax.eval_shape(
            lambda: vae.init(jax.random.key(0),
                             jnp.zeros((1, args.image_size, args.image_size, 3)))
        )
        sd = load_torch_state_dict(args.vae_ckpt)
        # full SD/REFace checkpoints nest the VAE under first_stage_model.*
        # (ckpt/convert.py full-ckpt assembly); standalone dumps don't
        prefix = ("first_stage_model."
                  if any(k.startswith("first_stage_model.") for k in sd)
                  else "")
        vae_params = convert_vae(shapes, sd, prefix=prefix)
        print(f"[vae] converted torch weights from {args.vae_ckpt} "
              f"(prefix={prefix or 'none'})")
    elif args.vae_ckpt:
        vae_params = load_params(args.vae_ckpt)
        print(f"[vae] loaded {args.vae_ckpt}")
    else:
        vae_params = vae.init(
            key, jnp.zeros((1, args.image_size, args.image_size, 3))
        )
        print("[vae] fresh init (no --vae-ckpt)")

    loss_cfg = VAELossConfig(
        disc_start=args.disc_start, kl_weight=args.kl_weight,
        disc_weight=args.disc_weight, disc_loss=args.disc_loss,
    )
    init_state, step_fn, _disc, lpips = make_vae_train_step(
        vae, loss_cfg, lr=args.lr
    )
    if args.lpips_ckpt:
        from reface_tpu.ckpt.convert import convert_lpips, load_torch_state_dict

        shapes = jax.eval_shape(
            lambda: lpips.init(
                jax.random.key(0),
                jnp.zeros((1, args.image_size, args.image_size, 3)),
                jnp.zeros((1, args.image_size, args.image_size, 3)),
            )
        )
        lpips_params = convert_lpips(
            shapes, load_torch_state_dict(args.lpips_ckpt)
        )
        print(f"[vae] LPIPS weights loaded from {args.lpips_ckpt}")
    elif args.allow_random_lpips:
        lpips_params = lpips.init(
            jax.random.key(1),
            jnp.zeros((1, args.image_size, args.image_size, 3)),
            jnp.zeros((1, args.image_size, args.image_size, 3)),
        )
        print("[vae] WARNING: RANDOM LPIPS features — the perceptual term "
              "is meaningless; pass --lpips-ckpt for real runs")
    else:
        raise SystemExit("pass --lpips-ckpt (or --allow-random-lpips for "
                         "smoke runs)")

    images = _load_images(args.images, args.image_size,
                          limit=args.max_images)
    print(f"[vae] {len(images)} images @ {args.image_size}px")
    state = init_state(vae_params, key, image_size=args.image_size)

    os.makedirs(args.out, exist_ok=True)
    metrics_path = os.path.join(args.out, "metrics.jsonl")
    rng = np.random.default_rng(args.seed)
    t0 = time.perf_counter()
    with open(metrics_path, "a") as mf:
        for i in range(args.steps):
            idx = rng.integers(0, len(images), args.batch_size)
            x = jnp.asarray(images[idx])
            state, logs = step_fn(
                state, x, jax.random.fold_in(key, i), lpips_params=lpips_params
            )
            if i % args.log_every == 0 or i == args.steps - 1:
                row = {k: float(v) for k, v in logs.items()}
                row.update(step=i, wall_s=round(time.perf_counter() - t0, 2))
                mf.write(json.dumps(row) + "\n")
                mf.flush()
                print(f"[vae] step {i}: ae {row['aeloss']:.4f} "
                      f"disc {row['discloss']:.4f} nll {row['nll_loss']:.4f} "
                      f"kl {row['kl_loss']:.2f}", flush=True)

    save_params(os.path.join(args.out, "vae"),
                jax.device_get(state.vae_params))
    save_params(os.path.join(args.out, "disc"),
                jax.device_get(state.disc_params))
    print(f"[vae] saved {args.out}/vae (+disc)")


if __name__ == "__main__":
    main()
