"""Step-count distillation driver: teacher DDIM-50+CFG -> student DDIM-K.

The quality-preserving serving mechanism (replaces the truncated DDIM-8
ladder rung): progressive distillation with guidance folding — see
reface_tpu/diffusion/distill.py. Teacher protocol = the exact reference
chain (ldm/models/diffusion/ddim.py:338-346, DDIM-50 CFG 3).

Trains ONLY the student UNet; VAE/conditioner stay frozen and shared. The
output directory is a params dir loadable by every driver via --ckpt, plus
manifest.json recording the student schedule — serve with
  --ckpt <out> --ddim-steps <K> --cfg-scale 1.0   (fold-cfg default)

Usage:
  python -m reface_tpu.cli.distill --out distilled [--dataset-dir D]
      [--teacher-ckpt params_dir] [--tiny --steps-per-round 10]
"""

from __future__ import annotations

import argparse
import json
import os
import time
from functools import partial

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--teacher-ckpt", default=None,
                    help="params dir (converted reference ckpt); default "
                         "random init (smoke)")
    ap.add_argument("--dataset-dir", default=None,
                    help="CelebA-HQ layout for training batches; default "
                         "synthetic noise batches (smoke)")
    ap.add_argument("--dataset", default="celeba", choices=["celeba", "ffhq"])
    ap.add_argument("--teacher-steps", type=int, default=50)
    ap.add_argument("--target-steps", type=int, default=10)
    ap.add_argument("--cfg-scale", type=float, default=3.0)
    ap.add_argument("--no-fold-cfg", action="store_true",
                    help="keep CFG in the student (2x serving cost)")
    ap.add_argument("--steps-per-round", type=int, default=2000)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--max-rounds", type=int, default=0,
                    help="run only the first N plan rounds (0 = all); "
                         "round 0 is the guidance-folding round and the "
                         "memory-heaviest — use 1 for a chip fit/rate check")
    ap.add_argument("--teacher-dtype", default=None,
                    choices=[None, "bfloat16"],
                    help="store the frozen teacher tree in bf16 (forward-"
                         "only; halves its resident HBM on a 16G chip)")
    ap.add_argument("--mu-dtype", default=None, choices=[None, "bfloat16"],
                    help="adam first-moment dtype (memory lever, same knob "
                         "as cli/train.py)")
    ap.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"])
    args = ap.parse_args(argv)
    from reface_tpu.cli.common import apply_backend

    apply_backend(args)

    import jax
    import jax.numpy as jnp
    import optax

    from reface_tpu.diffusion.distill import (
        DistillConfig,
        distill_schedule_plan,
        make_distill_loss,
    )
    from reface_tpu.ops.resize import resize_bilinear_no_aa
    from reface_tpu.pipelines.swap import (
        FaceSwapper,
        SwapConfig,
        SwapModules,
        tiny_swap_config,
    )

    swap_cfg = (
        tiny_swap_config(image_size=args.image_size)
        if args.tiny
        else SwapConfig(image_size=args.image_size)
    )
    # The distill step differentiates through the STUDENT UNet; the
    # inference-default attention kernels (smalld Pallas) define no VJP —
    # queue5 distill_rs died in linearization on exactly this. Reuse the
    # training-mode resolver: flash attention + UNet block remat (the
    # backward at 512px needs remat for the same reason cli/train does).
    from reface_tpu.pipelines.train import TrainConfig, resolve_train_swap_cfg

    swap_cfg = resolve_train_swap_cfg(swap_cfg, TrainConfig(), None)
    modules = SwapModules(swap_cfg)

    if args.teacher_ckpt:
        from reface_tpu.ckpt.io import load_params

        shapes = jax.eval_shape(
            lambda k: FaceSwapper.init_params(swap_cfg, k), jax.random.key(0)
        )
        target = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
        params = load_params(args.teacher_ckpt, target)
    else:
        print("[distill] WARNING: random teacher (no --teacher-ckpt) — "
              "infrastructure smoke only")
        params = FaceSwapper.init_params(swap_cfg, jax.random.key(args.seed))

    # The update step DONATES the student tree, so the teacher must never
    # alias it: both branches produce fresh ON-DEVICE buffers. device_put
    # matters twice over — a host-numpy tree (the --teacher-ckpt path:
    # load_params restores into np.zeros targets) passed as a jit argument
    # is re-uploaded EVERY step (~multi-GB over the ~5 MB/s tunnel), and
    # numpy.astype(bfloat16) stays a numpy array.
    if args.teacher_dtype == "bfloat16":
        teacher_cast = lambda x: jax.device_put(
            x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else jnp.array(x))
    else:
        teacher_cast = lambda x: jax.device_put(jnp.array(x))
    student_unet = params["unet"]  # init = teacher weights
    teacher_unet = jax.tree.map(teacher_cast, params["unet"])

    # ---- data ----
    if args.dataset_dir:
        from reface_tpu.data import (
            CelebAHQConfig,
            CelebAHQDataset,
            FFHQConfig,
            FFHQDataset,
            PrefetchLoader,
        )

        ds_cls, cfg_cls = (
            (CelebAHQDataset, CelebAHQConfig) if args.dataset == "celeba"
            else (FFHQDataset, FFHQConfig)
        )
        ds = ds_cls(cfg_cls(dataset_dir=args.dataset_dir, state="train",
                            image_size=args.image_size, data_seed=args.seed))
        loader = PrefetchLoader(ds, batch_size=args.batch_size, shuffle=True,
                                seed=args.seed)

        def batches():
            while True:
                for raw in loader:
                    yield {
                        "target_image": raw["GT"],
                        "inpaint_image": raw["inpaint_image"],
                        "inpaint_mask": raw["inpaint_mask"],
                        "ref_clip224": raw["ref_imgs"],
                    }
    else:
        rng = np.random.default_rng(args.seed)
        s = args.image_size

        def batches():
            while True:
                t = rng.uniform(-1, 1, (args.batch_size, s, s, 3))
                m = np.ones((args.batch_size, s, s, 1), np.float32)
                m[:, s // 4 : -s // 4, s // 4 : -s // 4] = 0.0
                yield {
                    "target_image": t.astype(np.float32),
                    "inpaint_image": (t * m).astype(np.float32),
                    "inpaint_mask": m,
                    "ref_clip224": rng.normal(
                        size=(args.batch_size, 224, 224, 3)
                    ).astype(np.float32),
                }

    # ---- per-round training ----
    def make_step(dcfg: DistillConfig):
        loss_fn, tt, ts = make_distill_loss(dcfg)
        mu_dtype = jnp.bfloat16 if args.mu_dtype == "bfloat16" else None
        opt = optax.adam(args.lr, mu_dtype=mu_dtype)

        # teacher_unet and the frozen tower params MUST be jit ARGUMENTS,
        # not closure captures: captured trees are baked into the MLIR as
        # dense constants (~2.5G at real size here) and the remote-compile
        # upload over the tunnel dies with a transport error — the same
        # failure mode fixed for swap_images_fused (pipelines/raw.py).
        def loss_of(student_unet, teacher_unet, frozen, batch, key):
            p_t = {**frozen, "unet": teacher_unet}
            p_s = {**frozen, "unet": student_unet}
            c, uc = modules.build_context(
                p_t, batch["ref_clip224"], batch["target_image"], None
            )
            z0 = jax.lax.stop_gradient(
                modules.encode_latent(p_t, batch["target_image"])
            )
            z_inp = jax.lax.stop_gradient(
                modules.encode_latent(p_t, batch["inpaint_image"])
            )
            hw = z0.shape[1]
            mask_l = resize_bilinear_no_aa(batch["inpaint_mask"], hw, hw)
            rest = jnp.concatenate([z_inp, mask_l], axis=-1)
            teacher_fn = lambda x9, t, cc: modules.unet.apply(
                jax.lax.stop_gradient(teacher_unet), x9, t, cc
            )
            student_fn = lambda x9, t, cc: modules.unet.apply(
                student_unet, x9, t, cc
            )
            return loss_fn(student_fn, teacher_fn, z0, rest, c, uc, key)

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(student_unet, opt_state, teacher_unet, frozen, batch, key):
            (loss, m), g = jax.value_and_grad(loss_of, has_aux=True)(
                student_unet, teacher_unet, frozen, batch, key
            )
            up, opt_state = opt.update(g, opt_state)
            return optax.apply_updates(student_unet, up), opt_state, m

        return step, opt

    plan = distill_schedule_plan(args.teacher_steps, args.target_steps)
    if args.max_rounds:
        plan = plan[: args.max_rounds]
    print(f"[distill] round plan: {args.teacher_steps} -> {plan}")
    key = jax.random.key(args.seed + 1)
    gen = batches()
    cur_teacher_steps = args.teacher_steps
    for round_i, student_steps in enumerate(plan):
        fold = not args.no_fold_cfg
        # with folding, the round-0 student absorbs the guidance; later
        # teachers (= previous students) are already unguided
        scale = args.cfg_scale if (round_i == 0 or not fold) else 1.0
        dcfg = DistillConfig(
            teacher_steps=cur_teacher_steps, student_steps=student_steps,
            cfg_scale=scale, fold_cfg=fold,
        )
        step, opt = make_step(dcfg)
        # device_put once: a host-numpy frozen tree (--teacher-ckpt path)
        # as a jit argument would re-upload every step (see teacher_cast)
        frozen = jax.device_put(
            {k: v for k, v in params.items() if k != "unet"})
        opt_state = opt.init(student_unet)
        print(f"[distill] round {round_i}: {cur_teacher_steps} -> "
              f"{student_steps} steps, cfg={scale}, fold={dcfg.fold_cfg}")
        t0 = time.perf_counter()
        for it in range(args.steps_per_round):
            key, sub = jax.random.split(key)
            student_unet, opt_state, m = step(
                student_unet, opt_state, teacher_unet, frozen, next(gen), sub
            )
            if (it + 1) % args.log_every == 0 or it == 0:
                # float() readback syncs the step (CLAUDE.md timing rules)
                loss_v = float(m["distill_loss"])
                dt = time.perf_counter() - t0
                rate = (1 if it == 0 else it) / dt
                print(f"[distill] r{round_i} it{it + 1} "
                      f"loss={loss_v:.5f} "
                      f"eps_mse={float(m['eps_mse']):.5f} "
                      f"({rate:.3f} it/s"
                      f"{' incl-compile' if it == 0 else ' post-compile'})")
            if it == 0:
                # restart the clock after the compile step so the printed
                # rate is the steady-state step rate
                float(m["distill_loss"])
                t0 = time.perf_counter()
        # next round distills the student; copy (or cast) so the new
        # teacher doesn't alias the donated student tree
        teacher_unet = jax.tree.map(teacher_cast, student_unet)
        cur_teacher_steps = student_steps

    from reface_tpu.ckpt.io import save_params

    out_params = {**params, "unet": student_unet}
    save_params(args.out, jax.device_get(out_params))
    manifest = {
        "ddim_steps": cur_teacher_steps,
        "cfg_scale": 1.0 if not args.no_fold_cfg else args.cfg_scale,
        "teacher_steps": args.teacher_steps,
        "teacher_cfg_scale": args.cfg_scale,
        "rounds": plan,
        "mode": "distilled",
    }
    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"[distill] saved student -> {args.out} "
          f"(serve: --ckpt {args.out} --ddim-steps {manifest['ddim_steps']} "
          f"--cfg-scale {manifest['cfg_scale']})")


if __name__ == "__main__":
    main()
