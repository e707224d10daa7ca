"""Shared CLI plumbing: model assembly, checkpoint resolution, image IO."""

from __future__ import annotations

import os
import numpy as np


def apply_backend(args) -> None:
    """Force the JAX platform before any backend initialization.

    The environment's sitecustomize force-registers a TPU plugin, so env vars
    alone don't switch platforms; jax.config does (pre-init)."""
    if getattr(args, "backend", None):
        import jax

        jax.config.update("jax_platforms", args.backend)


def add_model_args(ap):
    ap.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"],
                    help="force JAX platform (default: auto)")
    ap.add_argument("--config", nargs="*", default=[], help="YAML config(s)")
    ap.add_argument("--ckpt", default=None,
                    help="orbax params dir or torch .ckpt/.pth to convert")
    ap.add_argument("--clip-ckpt", default=None, help="HF CLIP state dict")
    ap.add_argument("--arcface-ckpt", default=None, help="ArcFace state dict")
    ap.add_argument("--ddim-steps", type=int, default=50)
    ap.add_argument("--scale", type=float, default=3.0, help="CFG scale")
    ap.add_argument("--sampler", default="ddim", choices=["ddim", "plms"])
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--tiny", action="store_true",
                    help="random tiny model (smoke runs without weights)")
    ap.add_argument("--save-params", default=None, metavar="DIR",
                    help="after loading/converting, save params as an orbax "
                         "dir (fast reload via --ckpt DIR)")
    ap.add_argument("--weights-dtype", default="bfloat16")
    ap.add_argument("--overrides", nargs="*", default=[],
                    help="dotlist config overrides a.b=v")


def build_swapper(args):
    """Resolve config + params into a ready FaceSwapper."""
    import jax
    import jax.numpy as jnp

    from reface_tpu.pipelines.swap import FaceSwapper, SwapConfig, tiny_swap_config

    if args.tiny:
        cfg = tiny_swap_config(image_size=64, ddim_steps=min(args.ddim_steps, 4))
    else:
        cfg = SwapConfig(
            ddim_steps=args.ddim_steps,
            cfg_scale=args.scale,
            sampler=args.sampler,
        )

    if args.ckpt is None:
        params = FaceSwapper.init_params(cfg, jax.random.key(args.seed))
    elif os.path.isdir(args.ckpt):
        from reface_tpu.ckpt import load_params

        shapes = jax.eval_shape(
            lambda k: FaceSwapper.init_params(cfg, k), jax.random.key(0)
        )
        target = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
        params = load_params(args.ckpt, target)
    else:
        from reface_tpu.ckpt import (
            convert_reface_checkpoint,
            load_torch_state_dict,
        )

        sd = load_torch_state_dict(args.ckpt)
        clip_sd = load_torch_state_dict(args.clip_ckpt) if args.clip_ckpt else None
        af_sd = (
            load_torch_state_dict(args.arcface_ckpt) if args.arcface_ckpt else None
        )
        params = convert_reface_checkpoint(cfg, sd, clip_sd, af_sd)

    if getattr(args, "save_params", None):
        from reface_tpu.ckpt import save_params

        save_params(args.save_params, jax.device_get(params))
        print(f"[ckpt] saved converted params -> {args.save_params}")

    wd = jnp.dtype(args.weights_dtype)
    if wd != jnp.float32:
        params = jax.tree.map(
            lambda x: x.astype(wd)
            if getattr(x, "dtype", None) == jnp.float32
            else x,
            params,
        )
    return FaceSwapper(cfg, params)


def save_image_pm1(path: str, img: np.ndarray) -> None:
    """Save an HWC [-1,1] float image as PNG."""
    import cv2

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    u8 = np.clip((np.asarray(img) + 1.0) * 127.5, 0, 255).astype(np.uint8)
    cv2.imwrite(path, cv2.cvtColor(u8, cv2.COLOR_RGB2BGR))


def save_grid_pm1(path: str, imgs: list[np.ndarray]) -> None:
    grid = np.concatenate([np.asarray(i) for i in imgs], axis=1)
    save_image_pm1(path, grid)
