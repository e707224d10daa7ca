"""Training driver: data-parallel pjit train loop with checkpointing/logging.

Functional parity target: /root/reference/main.py + train.sh —
OmegaConf-style layered YAML + dotlist overrides, LR scaling by world size,
periodic image logging, top-k + last checkpointing, crash checkpoint,
SIGUSR1 on-demand checkpoint, resume. Implemented TPU-native: one jitted DP
train step over a jax.sharding Mesh (XLA inserts the gradient all-reduce),
orbax sharded checkpoints, host prefetch loader.

Usage:
  python -m reface_tpu.cli.train --dataset-dir ... --logdir logs/run1 \
      [--tiny --image-size 64 --steps 10]   # smoke
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset-dir", required=True)
    ap.add_argument("--dataset", default="celeba", choices=["celeba", "ffhq"])
    ap.add_argument("--logdir", required=True)
    ap.add_argument("--batch-size", type=int, default=1, help="per device")
    ap.add_argument("--base-lr", type=float, default=1e-5)
    ap.add_argument("--warmup-steps", type=int, default=10000)
    ap.add_argument("--steps", type=int, default=0, help="0 = epochs mode")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--train-count", type=int, default=28000)
    ap.add_argument("--black-outer-mask", dest="gray_outer_mask",
                    action="store_false",
                    help="use the __getitem_black__ item recipe "
                         "(gray_outer_mask: False in the reference config, "
                         "celebA.py:405-409): no decow TPS warp of the "
                         "inpaint mask (celeba only)")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--full-losses", action="store_true",
                    help="enable DDIM-recon ID/LPIPS losses")
    ap.add_argument("--split-grad", type=int, nargs="?", const=1,
                    default=0,
                    help="compile the full loss as multiple programs — "
                         "exact numerics, required at 512px on the real "
                         "chip where the monolithic backward exceeds the "
                         "compiler's program limit. 1 = two programs "
                         "(recon-grad + eps-grad/update), 2 = four "
                         "(collect/tower-grad/pullback/eps-update)")
    ap.add_argument("--mu-dtype", default=None, choices=[None, "bfloat16"],
                    help="AdamW first-moment dtype; bfloat16 saves ~1.8G "
                         "HBM at 860M trainable params")
    ap.add_argument("--split-acc-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="split-grad accumulator dtype; bfloat16 halves its "
                         "HBM residency (needed for 512px full losses on a "
                         "single 16G chip), ~1e-3 relative rounding on the "
                         "recon grad contribution")
    ap.add_argument("--ckpt-every", type=int, default=10000)
    ap.add_argument("--final-ckpt", default=True,
                    action=argparse.BooleanOptionalAction,
                    help="save the full train state as 'last' at the end "
                         "(default; --no-final-ckpt for measurement runs — "
                         "a real-size full-state save is ~10G, ~35 min over "
                         "the axon tunnel)")
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--image-log-every", type=int, default=500)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--val-every", type=int, default=0, help="0 = off")
    ap.add_argument("--val-count", type=int, default=64)
    ap.add_argument("--keep-top-k", type=int, default=3,
                    help="retain k best val-loss checkpoints (ref keeps 30)")
    ap.add_argument("--sample-log-every", type=int, default=0,
                    help="generate swap samples every N steps (0 = off)")
    ap.add_argument("--ema-decay", type=float, default=0.0,
                    help="0 = EMA off (shipped config)")
    ap.add_argument("--ema-dtype", default=None,
                    choices=[None, "bfloat16", "float32"],
                    help="EMA shadow dtype; bfloat16 halves the shadow's "
                         "HBM (-1.7G at 860M) — what fits EMA on a single "
                         "16G v5e at 512px (default: param dtype / fp32)")
    ap.add_argument("--lpips-ckpt", default=None,
                    help="pretrained LPIPS(alex) torch checkpoint (full "
                         "module dump, or torchvision alexnet merged with "
                         "the official lin weights); without it the LPIPS "
                         "term runs on RANDOM features")
    ap.add_argument("--landmark-ckpt", default=None,
                    help="LandmarkNet params: batched landmark conditioning "
                         "of the GT batch (ddpm.py:1206 get_landmarks parity)")
    ap.add_argument("--landmark-rert", default=None,
                    help="native ERT model (.rert): exact dlib-parity host "
                         "landmarks for the GT batch")
    ap.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--coordinator", default=None,
                    help="multi-process: coordinator host:port "
                         "(jax.distributed; multi-node DDP role, "
                         "main.py:23,511,521). On TPU pods, omit all three "
                         "flags for auto-detection")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--config", nargs="*", default=[],
                    help="layered YAML config(s) with swap:/train: nodes "
                         "(main.py:504-506 parity)")
    ap.add_argument("--overrides", nargs="*", default=[],
                    help="dotlist overrides, e.g. train.learning_rate=2e-5 "
                         "swap.ddim_steps=30")
    args = ap.parse_args(argv)
    from reface_tpu.cli.common import apply_backend

    apply_backend(args)

    import jax
    import jax.numpy as jnp

    from reface_tpu.cli.common import save_grid_pm1
    from reface_tpu.data import (
        CelebAHQConfig,
        CelebAHQDataset,
        FFHQConfig,
        FFHQDataset,
        PrefetchLoader,
    )
    from reface_tpu.diffusion.losses import ReconLossConfig
    from reface_tpu.parallel import create_mesh, shard_batch, shard_params
    from reface_tpu.parallel.mesh import init_distributed
    from reface_tpu.pipelines.swap import FaceSwapper, SwapConfig, tiny_swap_config
    from reface_tpu.pipelines.train import TrainConfig, make_train_step

    proc_id, proc_count = init_distributed(
        args.coordinator, args.num_processes, args.process_id
    )
    is_main = proc_id == 0
    if proc_count > 1:
        print(f"[train] process {proc_id}/{proc_count}, "
              f"{jax.local_device_count()} local / {jax.device_count()} "
              f"global devices")

    mesh = create_mesh()
    n_dev = mesh.devices.size
    world_batch = args.batch_size * n_dev
    # reference LR scaling rule: lr = accum x nodes x ngpu x bs x base_lr
    lr = args.base_lr * world_batch

    swap_cfg = (
        tiny_swap_config(image_size=args.image_size)
        if args.tiny
        else SwapConfig(image_size=args.image_size)
    )
    train_cfg = TrainConfig(
        learning_rate=lr, warmup_steps=args.warmup_steps,
        ema_decay=args.ema_decay or None, ema_dtype=args.ema_dtype,
        split_grad=args.split_grad,
        split_acc_dtype=args.split_acc_dtype, mu_dtype=args.mu_dtype,
    )
    recon = ReconLossConfig() if args.full_losses else None
    if args.config or args.overrides:
        from reface_tpu.cli.common import apply_config_node
        from reface_tpu.core.config import load_config

        node = load_config(args.config, args.overrides)
        if "swap" in node:
            swap_cfg = apply_config_node(swap_cfg, node["swap"])
        if "train" in node:
            train_cfg = apply_config_node(train_cfg, node["train"])
        if "recon" in node:
            recon = apply_config_node(recon or ReconLossConfig(), node["recon"])

    params = FaceSwapper.init_params(swap_cfg, jax.random.key(args.seed))
    if recon is not None and recon.lpips_weight > 0:
        # recon can arrive via --full-losses OR a config-file recon: node
        from reface_tpu.nn.lpips import LPIPS

        x0 = jnp.zeros((1, args.image_size, args.image_size, 3))
        if args.lpips_ckpt:
            # pretrained AlexNet + lin calibration (ddpm.py:634,1779-1797)
            from reface_tpu.ckpt.convert import (
                convert_lpips,
                load_torch_state_dict,
            )

            shapes = jax.eval_shape(LPIPS().init, jax.random.key(1), x0, x0)
            params["lpips"] = convert_lpips(
                shapes, load_torch_state_dict(args.lpips_ckpt)
            )
            print(f"[train] LPIPS weights loaded from {args.lpips_ckpt}")
        else:
            print("[train] WARNING: no --lpips-ckpt; the lpips_loss term "
                  "uses RANDOM AlexNet features, not a perceptual loss")
            params["lpips"] = LPIPS().init(jax.random.key(1), x0, x0)
    if recon is not None and recon.landmark_weight > 0:
        # landmark aux head on the UNet's 64x64 decoder taps
        # (LandmarkDetectionModel role, ddpm.py:163-177, 1691-1693)
        from reface_tpu.nn.landmarks import LandmarkAuxHead
        from reface_tpu.nn.unet import UNetModel

        latent = swap_cfg.latent_size
        _, feat_shapes = jax.eval_shape(
            lambda p: UNetModel(swap_cfg.unet).apply(
                p, jnp.zeros((1, latent, latent, 9)),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 1, swap_cfg.conditioner.context_dim)),
                return_features=True,
            ),
            params["unet"],
        )
        i0 = min(9, len(feat_shapes) - 2)
        f0, f1 = feat_shapes[i0], feat_shapes[i0 + 1]
        feat0 = jnp.zeros(
            (1, f0.shape[1], f0.shape[2], f0.shape[-1] + f1.shape[-1])
        )
        params["landmark_head"] = LandmarkAuxHead().init(
            jax.random.key(2), feat0
        )
    step_fn, loss_fn, init_state = make_train_step(swap_cfg, train_cfg, recon=recon)
    jit_loss = jax.jit(loss_fn)
    state = init_state(shard_params(params, mesh))
    # split-grad steps are already two jitted programs; re-jitting would
    # trace through and re-fuse them into the too-big monolith.
    # donate_argnums=(0,): without donation the step double-buffers the
    # whole TrainState (old params+mu+nu+EMA live next to the new ones at
    # the output) — ~9G extra at 860M; donating is what lets the eps config
    # carry a bf16 EMA shadow on a single 16G v5e. Trade-off: if the step
    # itself faults (OOM), the old state's buffers are gone — the crash
    # checkpoint below tolerates that.
    jit_step = (step_fn if getattr(step_fn, "precompiled", False)
                else jax.jit(step_fn, donate_argnums=(0,)))

    resume_step = 0
    if args.resume:
        # FULL resume (params + optimizer state + step + EMA, the
        # resume_from_checkpoint role); params-only dirs (e.g. converted
        # reference checkpoints or --save-params caches) still bootstrap
        from reface_tpu.ckpt.io import load_params, load_train_state

        try:
            state = load_train_state(args.resume, state)
            resume_step = int(jax.device_get(state.step))
            # The restored tree is host numpy (uploaded lazily at the first
            # step); the fresh-init device params are now dead weight but
            # stay resident through this local — measured on the 16G chip:
            # init fp32 params (3.4G) + the uploaded restored state put the
            # first resumed step over HBM (RESOURCE_EXHAUSTED). Free them —
            # guarded against EMA-shadow aliasing for safety (EmaState.create
            # copies since the donation fix, so the guard should never trip).
            if state.ema is None or not any(
                r is p for r, p in zip(jax.tree.leaves(state.ema),
                                       jax.tree.leaves(params["unet"]))
            ):
                for leaf in jax.tree.leaves(params):
                    if hasattr(leaf, "delete"):
                        leaf.delete()
                params = None
            print(f"[train] resumed FULL train state at step {resume_step} "
                  f"from {args.resume}")
        except Exception as e:
            # fall back to params-only (converted reference checkpoints /
            # --save-params caches) — loudly: optimizer state, EMA, and the
            # step counter are NOT restored. A structure mismatch (e.g. a
            # checkpoint saved with a different --ema-decay setting) lands
            # here too; if params-only also fails, raise the original error.
            print(f"[train] WARNING: full-state resume failed "
                  f"({type(e).__name__}: {e}); trying params-only "
                  f"(optimizer/EMA/step will restart)")
            try:
                params = load_params(args.resume, jax.device_get(state.params))
            except Exception:
                raise e
            state = init_state(shard_params(params, mesh))
            print(f"[train] resumed params only from {args.resume}")

    if args.dataset == "celeba":
        ds = CelebAHQDataset(CelebAHQConfig(
            dataset_dir=args.dataset_dir, state="train",
            image_size=args.image_size, train_count=args.train_count,
            data_seed=args.seed, gray_outer_mask=args.gray_outer_mask,
        ))
    else:
        ds = FFHQDataset(FFHQConfig(
            dataset_dir=args.dataset_dir, state="train",
            image_size=args.image_size, train_count=args.train_count,
            data_seed=args.seed,
        ))

    # landmark conditioning of the GT batch (0.05-weight stream; the
    # reference computes dlib landmarks inside get_input, ddpm.py:1206)
    landmark_fn = None
    if args.landmark_ckpt:
        from reface_tpu.ckpt.io import load_params as _load_lm
        from reface_tpu.nn.landmarks import (
            LandmarkNet,
            LandmarkNetConfig,
            landmark_fn_from_net,
        )

        landmark_fn = landmark_fn_from_net(
            LandmarkNet(LandmarkNetConfig()), _load_lm(args.landmark_ckpt),
            args.image_size,
        )
    elif args.landmark_rert:
        from reface_tpu.nn.landmarks import landmark_fn_from_rert

        landmark_fn = landmark_fn_from_rert(args.landmark_rert, args.image_size)

    def to_batch(raw):
        d = dict(
            target_image=raw["GT"],
            inpaint_image=raw["inpaint_image"],
            inpaint_mask=raw["inpaint_mask"],
            ref_clip224=raw["ref_imgs"],
        )
        if landmark_fn is not None:
            d["landmarks"] = np.asarray(landmark_fn(raw["GT"]))
        return shard_batch(d, mesh)

    loader = PrefetchLoader(ds, batch_size=world_batch, shuffle=True,
                            seed=args.seed, device_put=to_batch,
                            process_index=proc_id, process_count=proc_count)

    val_loader = None
    if args.val_every:
        if args.dataset == "celeba":
            val_ds = CelebAHQDataset(CelebAHQConfig(
                dataset_dir=args.dataset_dir, state="validation",
                image_size=args.image_size, train_count=args.train_count,
                eval_count=args.val_count, data_seed=args.seed,
            ))
        else:
            val_ds = FFHQDataset(FFHQConfig(
                dataset_dir=args.dataset_dir, state="validation",
                image_size=args.image_size, train_count=args.train_count,
                eval_count=args.val_count, data_seed=args.seed,
            ))
        val_loader = PrefetchLoader(val_ds, batch_size=world_batch,
                                    shuffle=False, device_put=to_batch,
                                    process_index=proc_id,
                                    process_count=proc_count)

    os.makedirs(os.path.join(args.logdir, "checkpoints"), exist_ok=True)
    os.makedirs(os.path.join(args.logdir, "images"), exist_ok=True)
    metrics_path = os.path.join(args.logdir, "metrics.jsonl")

    want_ckpt = {"now": False}
    try:
        signal.signal(signal.SIGUSR1, lambda *_: want_ckpt.update(now=True))
    except (ValueError, OSError):
        pass

    def checkpoint(tag):
        if not is_main:  # rank-zero-only callbacks (main.py:280,337 parity)
            return
        path = os.path.join(args.logdir, "checkpoints", tag)
        from reface_tpu.ckpt.io import save_train_state

        # full state (params + opt + step + EMA) so --resume continues
        # exactly; params-only consumers read the "params" subtree
        save_train_state(path, jax.device_get(state), int(state.step))
        print(f"[train] checkpoint -> {path}")

    top_k: list[tuple[float, str]] = []  # (val_loss, tag), best first

    def maybe_top_k(vloss, step_no):
        """ModelCheckpoint parity: keep the k best checkpoints by val loss."""
        import shutil

        if len(top_k) < args.keep_top_k or vloss < top_k[-1][0]:
            tag = f"best_{step_no:08d}_loss{vloss:.4f}"
            checkpoint(tag)
            top_k.append((vloss, tag))
            top_k.sort(key=lambda t: t[0])
            while len(top_k) > args.keep_top_k:
                _, old = top_k.pop()
                shutil.rmtree(
                    os.path.join(args.logdir, "checkpoints", old),
                    ignore_errors=True,
                )

    key = jax.random.key(args.seed + 1)
    step = resume_step
    t0 = time.perf_counter()
    try:
        with mesh:
            for epoch in range(args.epochs):
                for raw_batch in loader:
                    key, sub = jax.random.split(key)
                    state, metrics = jit_step(state, raw_batch, sub)
                    step += 1
                    if step % args.log_every == 0 and is_main:
                        m = {k: float(v) for k, v in metrics.items()}
                        m.update(step=step, epoch=epoch,
                                 sps=step / (time.perf_counter() - t0))
                        with open(metrics_path, "a") as f:
                            f.write(json.dumps(m) + "\n")
                        print(f"[train] {m}")
                    # image/sample logging reads the host batch — rank-zero
                    # only, and per-process batches aren't host-complete on
                    # multi-host, so it's single-process only
                    if (step % args.image_log_every == 0 and is_main
                            and proc_count == 1):
                        raw = jax.device_get(raw_batch)
                        save_grid_pm1(
                            os.path.join(args.logdir, "images",
                                         f"inputs_{step:08d}.png"),
                            [raw["target_image"][0], raw["inpaint_image"][0]],
                        )
                    if (args.sample_log_every and proc_count == 1
                            and step % args.sample_log_every == 0):
                        # ImageLogger parity: periodic swap samples with the
                        # current (EMA when enabled) weights, few DDIM steps
                        from reface_tpu.pipelines.swap import FaceSwapper
                        from reface_tpu.pipelines.train import params_with_ema

                        sample_cfg = swap_cfg.__class__(
                            **{**swap_cfg.__dict__, "ddim_steps": 8}
                        )
                        sw = FaceSwapper(
                            sample_cfg,
                            params_with_ema(jax.device_get(state.params), state),
                        )
                        raw = jax.device_get(raw_batch)
                        n = min(2, raw["target_image"].shape[0])
                        out = sw.swap(
                            target_image=raw["target_image"][:n],
                            inpaint_image=raw["inpaint_image"][:n],
                            inpaint_mask=raw["inpaint_mask"][:n],
                            ref_clip224=raw["ref_clip224"][:n],
                            key=jax.random.key(step),
                        )
                        save_grid_pm1(
                            os.path.join(args.logdir, "images",
                                         f"samples_{step:08d}.png"),
                            [raw["target_image"][i] for i in range(n)]
                            + [jax.device_get(out)[i] for i in range(n)],
                        )
                    if args.val_every and step % args.val_every == 0:
                        vlosses = []
                        for vb in val_loader:
                            vlosses.append(float(
                                jit_loss(state.params, vb, jax.random.key(99))[0]
                            ))
                        vloss = float(np.mean(vlosses)) if vlosses else float("nan")
                        if is_main:
                            with open(metrics_path, "a") as f:
                                f.write(json.dumps({"step": step,
                                                    "val_loss": vloss}) + "\n")
                        maybe_top_k(vloss, step)
                    if want_ckpt["now"]:
                        want_ckpt["now"] = False
                        checkpoint(f"sig_{step:08d}")
                    if step % args.ckpt_every == 0:
                        checkpoint(f"step_{step:08d}")
                    if args.steps and step >= args.steps:
                        raise StopIteration
    except StopIteration:
        pass
    except Exception:
        # melk() parity: save before re-raising. Best-effort — if the step
        # program itself faulted, the state is unfetchable (donated inputs
        # freed / poisoned outputs), and the crash save must not mask the
        # real error.
        try:
            checkpoint("crash_last")
        except Exception as ce:
            print(f"[train] WARNING: crash checkpoint failed "
                  f"({type(ce).__name__}): state was lost with the step")
        raise
    if args.final_ckpt:
        checkpoint("last")
    else:
        # measurement runs skip it: a full-state orbax save is ~10G at
        # 860M and moves at ~5 MB/s over the axon tunnel (~35 min)
        print("[train] --no-final-ckpt: skipping the final 'last' save")
    if step == resume_step:
        # a silent no-op run is almost always a config error, e.g. a batch
        # size that doesn't divide the mesh's data axis (the loader drops
        # every batch) or an empty dataset slice on this process
        print(f"[train] WARNING: no steps ran (still at step {step}) — "
              f"check batch size divisibility by the data-axis size "
              f"({jax.device_count()} devices) and the dataset slice")
    print(f"[train] done at step {step}")


if __name__ == "__main__":
    main()
