"""Shared CLI plumbing: model assembly, checkpoint resolution, image IO."""

from __future__ import annotations

import os
import numpy as np


def apply_backend(args) -> None:
    """Force the JAX platform before any backend initialization.

    The environment's sitecustomize force-registers a TPU plugin, so env vars
    alone don't switch platforms; jax.config does (pre-init). Also points the
    persistent compilation cache at the repo's .jax_cache (first compile of
    the 512px programs is ~15 min over the tunnel; every driver should reuse
    it, not just bench.py and tools/)."""
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    if getattr(args, "backend", None):
        jax.config.update("jax_platforms", args.backend)


def add_model_args(ap):
    ap.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"],
                    help="force JAX platform (default: auto)")
    ap.add_argument("--config", nargs="*", default=[], help="YAML config(s)")
    ap.add_argument("--ckpt", default=None,
                    help="orbax params dir or torch .ckpt/.pth to convert")
    ap.add_argument("--clip-ckpt", default=None, help="HF CLIP state dict")
    ap.add_argument("--arcface-ckpt", default=None, help="ArcFace state dict")
    # sampler flags default to None so "explicitly set" is detectable —
    # explicit CLI flags must beat YAML (main.py precedence) and also apply
    # under --tiny; unset flags resolve to the config's values
    ap.add_argument("--ddim-steps", type=int, default=None,
                    help="DDIM steps (default 50)")
    ap.add_argument("--scale", type=float, default=None,
                    help="CFG scale (default 3.0)")
    ap.add_argument("--cfg-steps", type=int, default=None,
                    help="serving mode: CFG only on the first N steps "
                         "(default 0 = reference protocol, CFG every step)")
    ap.add_argument("--attn", default=None,
                    choices=["auto", "fast", "flash", "einsum"],
                    help="self-attention kernel (fast = bf16-prob serving "
                         "mode; see ops/attention.py; default auto)")
    ap.add_argument("--quant", default=None,
                    choices=["none", "int8", "int8conv"],
                    help="serving mode: int8 MXU matmuls in the transformer "
                         "blocks (ops/quant.py; default none)")
    ap.add_argument("--quant-cond", action="store_true",
                    help="serving mode: int8 MXU matmuls in the CLIP "
                         "conditioner tower too — attacks the fixed "
                         "per-swap conditioning cost that dominates the "
                         "short distilled rungs (composes with --quant)")
    ap.add_argument("--sampler", default=None, choices=["ddim", "plms", "dpm"],
                    help="dpm = DPM-Solver++(2M), 2nd-order training-free "
                         "step-count reducer (diffusion/dpm_solver.py); "
                         "(default ddim)")
    ap.add_argument("--discretize", default=None,
                    choices=["uniform", "quad", "lam_uniform"],
                    help="timestep-subset spacing; lam_uniform (logSNR) is "
                         "the grid --sampler dpm wants (default uniform)")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--tiny", action="store_true",
                    help="random tiny model (smoke runs without weights)")
    ap.add_argument("--save-params", default=None, metavar="DIR",
                    help="after loading/converting, save params as an orbax "
                         "dir (fast reload via --ckpt DIR)")
    ap.add_argument("--weights-dtype", default="bfloat16")
    ap.add_argument("--overrides", nargs="*", default=[],
                    help="dotlist config overrides a.b=v")


def apply_config_node(dc, node: dict):
    """Overlay a YAML/dotlist mapping onto a (frozen) dataclass instance.

    Nested dataclass nodes overlay RECURSIVELY onto the instance's current
    field value (not the class defaults), so a partial `swap.unet:` node on
    a tiny/base config only changes the listed keys."""
    import dataclasses

    node = dict(node)
    for k in list(node):
        if isinstance(node[k], dict) and dataclasses.is_dataclass(
            getattr(dc, k, None)
        ):
            node[k] = apply_config_node(getattr(dc, k), node[k])
        elif isinstance(node[k], list):
            node[k] = tuple(node[k])
    return dataclasses.replace(dc, **node)


def resolve_swap_config(args):
    """SwapConfig from layered YAML + dotlist overrides + CLI flags.

    Precedence (main.py:504-506 parity): base YAMLs left-to-right, then
    --overrides dotlist, then explicitly-set CLI flags (--ddim-steps etc.).
    YAML schema = SwapConfig field names, optionally under a `swap:` node.
    """
    import dataclasses

    from reface_tpu.pipelines.swap import SwapConfig, tiny_swap_config

    if args.tiny:
        base = tiny_swap_config(image_size=64,
                                ddim_steps=args.ddim_steps or 4)
    else:
        base = SwapConfig()
    yaml_keys: set = set()
    if getattr(args, "config", None) or getattr(args, "overrides", None):
        from reface_tpu.core.config import load_config, merge

        node = load_config(args.config or [], args.overrides or [])
        # a config may use a sectioned schema (swap:/train:/recon: nodes,
        # the cli/train.py layout) or bare top-level SwapConfig fields;
        # merge the bare fields with the swap: section so mixed YAML +
        # swap.* dotlists both apply, and other sections are ignored here
        sections = ("swap", "train", "recon")
        bare = {k: v for k, v in node.items() if k not in sections}
        merged = merge(bare, node.get("swap", {}))
        yaml_keys = set(merged)
        base = apply_config_node(base, merged)
    # explicitly-set CLI flags win over YAML (and apply under --tiny too)
    cli = {}
    if args.ddim_steps is not None and not args.tiny:
        cli["ddim_steps"] = args.ddim_steps
    if args.scale is not None:
        cli["cfg_scale"] = args.scale
    if args.sampler is not None:
        cli["sampler"] = args.sampler
    if getattr(args, "discretize", None) is not None:
        cli["ddim_discretize"] = args.discretize
    elif (cli.get("sampler", base.sampler) == "dpm"
          and base.ddim_discretize == "uniform"
          and "ddim_discretize" not in yaml_keys):
        # DPM-Solver++'s 2nd-order advantage assumes the lam-uniform grid;
        # the t-uniform grid's terminal lam-jump (t=101->1 spans lam
        # 1.06->3.19 on the SD schedule) degrades it to near-DDIM quality
        # (diffusion/dpm_solver.py docstring). Default the grid to what the
        # solver wants; an explicit --discretize OR an explicit YAML
        # ddim_discretize (even "uniform") still wins.
        cli["ddim_discretize"] = "lam_uniform"
    if getattr(args, "cfg_steps", None) is not None:
        cli["cfg_steps"] = args.cfg_steps
    if getattr(args, "quant_cond", False):
        cli["conditioner"] = dataclasses.replace(
            base.conditioner,
            clip=dataclasses.replace(base.conditioner.clip, quant="int8"),
        )
    if (getattr(args, "attn", None) is not None
            or getattr(args, "quant", None) is not None):
        ukw = {}
        if getattr(args, "attn", None) is not None:
            ukw["attn_impl"] = args.attn
        if getattr(args, "quant", None) is not None:
            ukw["quant"] = args.quant
            cli["vae"] = dataclasses.replace(base.vae, quant=args.quant)
        cli["unet"] = dataclasses.replace(base.unet, **ukw)
    if cli:
        base = dataclasses.replace(base, **cli)
    return base


def build_swapper(args):
    """Resolve config + params into a ready FaceSwapper."""
    import jax
    import jax.numpy as jnp

    from reface_tpu.pipelines.swap import FaceSwapper

    cfg = resolve_swap_config(args)

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


def build_raw_pipeline(args, swapper, raw_cfg):
    """RawSwapPipeline from the shared raw-driver flags: --landmark-ckpt
    (on-device LandmarkNet params), --landmark-rert (host exact-ERT,
    dlib-parity — eager path only), --bisenet-ckpt (face parser weights).

    Every inference flow in the reference feeds dlib landmarks into
    alignment AND the 136-d conditioning (one_inference.py:532-541,
    ddpm.py:1068-1099); --landmark-rert is the exact-parity equivalent."""
    import functools

    import jax
    import jax.numpy as jnp

    from reface_tpu.pipelines.raw import RawSwapPipeline

    bn_params = lm_params = lm_fn = None
    if getattr(args, "bisenet_ckpt", None):
        from reface_tpu.ckpt.convert import convert_bisenet, load_torch_state_dict
        from reface_tpu.nn.bisenet import BiSeNet

        m = BiSeNet(raw_cfg.bisenet)
        shapes = jax.eval_shape(
            functools.partial(m.init, aux_heads=True), jax.random.key(0),
            jnp.zeros((1, 64, 64, 3)),
        )
        bn_params = convert_bisenet(
            jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes),
            load_torch_state_dict(args.bisenet_ckpt),
        )
    if getattr(args, "landmark_ckpt", None):
        from reface_tpu.ckpt.io import load_params

        lm_params = load_params(args.landmark_ckpt)
    if getattr(args, "landmark_rert", None):
        if getattr(args, "fused", False):
            raise SystemExit(
                "--landmark-rert is a host-side (exact ERT) landmark "
                "source; the --fused one-XLA-program path cannot call the "
                "host mid-program. Use the eager path, or --landmark-ckpt "
                "(an ERT-distilled LandmarkNet) with --fused."
            )
        from reface_tpu.nn.landmarks import landmark68_fn_from_rert

        lm_fn = landmark68_fn_from_rert(args.landmark_rert)
    return RawSwapPipeline(swapper, raw_cfg, landmark_params=lm_params,
                           bisenet_params=bn_params, landmark_fn=lm_fn)


def build_safety_checker(ckpt_path: str | None):
    """SafetyChecker from a converted diffusers state dict, or None.

    Reference loads it at import in the batch driver
    (inference_test_bench.py:48-51); here it is opt-in via --safety-ckpt."""
    if not ckpt_path:
        return None
    import jax
    import jax.numpy as jnp

    from reface_tpu.ckpt.convert import (
        convert_safety_checker,
        load_torch_state_dict,
    )
    from reface_tpu.nn.safety import SafetyChecker, SafetyCheckerConfig

    scfg = SafetyCheckerConfig()
    shapes = jax.eval_shape(
        SafetyChecker(scfg).tower.init, jax.random.key(0),
        jnp.zeros((1, 224, 224, 3)),
    )
    params = convert_safety_checker(
        jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes),
        load_torch_state_dict(ckpt_path),
    )
    return SafetyChecker(scfg, params)


def decode_keep_mask(data, size: int) -> np.ndarray:
    """Decode a keep-mask (white=keep) from PNG bytes or a file path to a
    (size, size, 1) float array — shared by the precropped modes of
    cli/swap.py and cli/demo_server.py."""
    import cv2

    if isinstance(data, (bytes, bytearray)):
        m = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_GRAYSCALE)
    else:
        m = cv2.imread(str(data), cv2.IMREAD_GRAYSCALE)
    if m is None:
        raise ValueError("could not decode mask image")
    m = cv2.resize(m, (size, size), interpolation=cv2.INTER_LINEAR)
    return (m.astype(np.float32) / 255.0)[..., None]


def default_inpaint_mask(size: int) -> np.ndarray:
    """Keep-mask (1=keep) with a central face-shaped ellipse to inpaint —
    the --precropped fallback when no parser/mask is available (aligned
    crops put the face around (0.5, 0.55) of the frame)."""
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float32) / size
    ellipse = ((xs - 0.5) / 0.30) ** 2 + ((ys - 0.55) / 0.40) ** 2 <= 1.0
    return 1.0 - ellipse.astype(np.float32)[..., None]


def save_image_pm1(path: str, img: np.ndarray) -> None:
    """Save an HWC [-1,1] float image as PNG."""
    import cv2

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    u8 = np.clip((np.asarray(img) + 1.0) * 127.5, 0, 255).astype(np.uint8)
    cv2.imwrite(path, cv2.cvtColor(u8, cv2.COLOR_RGB2BGR))


def save_grid_pm1(path: str, imgs: list[np.ndarray]) -> None:
    grid = np.concatenate([np.asarray(i) for i in imgs], axis=1)
    save_image_pm1(path, grid)
