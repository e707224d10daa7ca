"""Real-size training-step reality check on the chip (VERDICT r2 item #6).

Measures ms/step + HBM for the 512px train step on the real device:
  - eps-only (loss_simple, the dryrun path)
  - --full-losses: k-step DDIM recon + ID + multi-scale LPIPS
    (p_losses_face, ddpm.py:1679-1837) with UNet remat
Reference protocol: batch 1/GPU, AdamW, configs/train.yaml:2,99,143-148.

  python tools/bench_train_step.py [--batch 1] [--full-losses] [--no-remat]
      [--steps 3] [--tiny]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--full-losses", action="store_true")
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--backend", default=None)
    # compile-bisection knobs (the 512px full-loss program crashed the
    # remote TPU compile helper; these isolate the breaking component)
    ap.add_argument("--attn", default="flash",
                    choices=["flash", "einsum"])
    ap.add_argument("--id-weight", type=float, default=None)
    ap.add_argument("--lpips-weight", type=float, default=None)
    ap.add_argument("--recon-steps", type=int, default=None)
    ap.add_argument("--fwd-only", action="store_true",
                    help="compile/run loss_fn only (no grad, no update)")
    ap.add_argument("--mu-dtype", default=None,
                    choices=[None, "bfloat16"],
                    help="AdamW first-moment dtype (HBM saver)")
    ap.add_argument("--acc-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="inter-program grad accumulator dtype (split mode)")
    ap.add_argument("--split-grad", type=int, nargs="?", const=1,
                    default=0,
                    help="1 = two-program split (recon-grad + eps-grad/"
                         "update); 2 = four-program (collect/tower-grad/"
                         "pullback/eps-update)")
    args = ap.parse_args()
    if args.backend == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from reface_tpu.diffusion.losses import ReconLossConfig
    from reface_tpu.nn.unet import UNetConfig
    from reface_tpu.pipelines.swap import FaceSwapper, SwapConfig, tiny_swap_config
    from reface_tpu.pipelines.train import TrainConfig, make_train_step

    remat = not args.no_remat
    if args.tiny:
        swap_cfg = tiny_swap_config(image_size=args.image_size or 64)
    else:
        swap_cfg = SwapConfig(
            image_size=args.image_size,
            unet=UNetConfig(remat=remat, attn_impl=args.attn),
        )
    recon = None
    if args.full_losses:
        import dataclasses

        kw = {}
        if args.id_weight is not None:
            kw["id_weight"] = args.id_weight
        if args.lpips_weight is not None:
            kw["lpips_weight"] = args.lpips_weight
        if args.recon_steps is not None:
            kw["ddim_steps"] = args.recon_steps
        recon = dataclasses.replace(ReconLossConfig(), **kw)

    params = FaceSwapper.init_params(swap_cfg, jax.random.key(0))
    if recon is not None and recon.lpips_weight > 0:
        from reface_tpu.nn.lpips import LPIPS

        x0 = jnp.zeros((1, swap_cfg.image_size, swap_cfg.image_size, 3))
        params["lpips"] = LPIPS().init(jax.random.key(1), x0, x0)

    step_fn, loss_fn, init_state = make_train_step(
        swap_cfg, TrainConfig(split_grad=args.split_grad,
                              split_acc_dtype=args.acc_dtype,
                              mu_dtype=args.mu_dtype,
                              # honor --no-remat as a real A/B knob
                              force_unet_remat=not args.no_remat),
        recon=recon
    )
    state = init_state(params)
    if args.fwd_only:
        def fwd_step(state, batch, key):
            _, metrics = loss_fn(state.params, batch, key)
            return state, metrics

        jit_step = jax.jit(fwd_step)
    elif getattr(step_fn, "precompiled", False):
        jit_step = step_fn  # split mode: already two jitted programs
    else:
        jit_step = jax.jit(step_fn, donate_argnums=(0,))

    s = swap_cfg.image_size
    b = args.batch
    ks = jax.random.split(jax.random.key(2), 4)
    batch = dict(
        target_image=jax.random.uniform(ks[0], (b, s, s, 3), minval=-1, maxval=1),
        inpaint_image=jax.random.uniform(ks[1], (b, s, s, 3), minval=-1, maxval=1),
        inpaint_mask=(jax.random.uniform(ks[2], (b, s, s, 1)) > 0.5).astype(
            jnp.float32
        ),
        ref_clip224=jax.random.normal(ks[3], (b, 224, 224, 3)),
    )

    mode = "full" if args.full_losses else "eps"
    if args.full_losses:
        if args.lpips_weight == 0:
            mode += "-nolpips"
        if args.id_weight == 0:
            mode += "-noid"
        if args.recon_steps is not None:
            mode += f"-k{args.recon_steps}"
    if args.attn != "flash":
        mode += f"-{args.attn}"
    if args.fwd_only:
        mode += "-fwdonly"
    if args.split_grad:
        mode += "-split"
    print(f"[bench_train_step] compiling {mode} step (batch {b}, {s}px, "
          f"remat={remat}) ...")
    t0 = time.perf_counter()
    try:
        state, metrics = jit_step(state, batch, jax.random.key(3))
        first = {k: float(v) for k, v in metrics.items()}
    except Exception as e:
        import traceback

        traceback.print_exc()
        print(json.dumps({"mode": mode, "batch": b, "error": str(e)[:400]}))
        raise SystemExit(1)
    print(f"[bench_train_step] first step (incl. compile) "
          f"{time.perf_counter() - t0:.1f}s, metrics={first}")

    times = []
    for i in range(args.steps):
        t0 = time.perf_counter()
        state, metrics = jit_step(state, batch, jax.random.key(4 + i))
        # scalar readback is the only reliable sync over the axon tunnel
        _ = float(metrics[list(metrics)[0]])
        times.append(time.perf_counter() - t0)

    dev = jax.local_devices()[0]
    stats = {}
    try:
        ms = dev.memory_stats() or {}
        stats = {
            "hbm_peak_gb": round(ms.get("peak_bytes_in_use", 0) / 2**30, 2),
            "hbm_in_use_gb": round(ms.get("bytes_in_use", 0) / 2**30, 2),
            "hbm_limit_gb": round(ms.get("bytes_limit", 0) / 2**30, 2),
        }
    except Exception:
        pass
    out = {
        "mode": mode, "batch": b, "image_size": s, "remat": remat,
        "ms_per_step": round(min(times) * 1e3, 1),
        "steps_per_s": round(1.0 / min(times), 3),
        "times_s": [round(t, 3) for t in times],
        **stats,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
