"""Batched test-bench swap driver.

Functional parity target: /root/reference/scripts/inference_test_bench.py +
inference_test_bench.sh — deterministic pair lists (seed 42), DDIM-50 CFG 3.0,
n_samples per device batch, per-pair result PNGs named
results/{source}_{target}.png plus grid/mask/GT/inpaint/ref dumps.

TPU-native: the whole per-batch swap is one jitted program; the host loader
prefetches/decodes while the device runs the previous batch.

Usage:
  python -m reface_tpu.cli.inference_test_bench --dataset-dir ... \
      --dataset celeba --outdir results/celeba --n-samples 10 [--ckpt ...]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from reface_tpu.cli.common import add_model_args, apply_backend, build_swapper, save_grid_pm1, save_image_pm1


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    add_model_args(ap)
    ap.add_argument("--dataset-dir", required=True)
    ap.add_argument("--dataset", default="celeba", choices=["celeba", "ffhq", "ff"])
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--n-samples", type=int, default=10, help="device batch")
    ap.add_argument("--num-pairs", type=int, default=1000)
    ap.add_argument("--save-aux", action="store_true",
                    help="also dump grid/mask/GT/inpaint/ref")
    ap.add_argument("--head-swap", action="store_true",
                    help="universal head swap: extend masks with hair/hat")
    ap.add_argument("--landmark-ckpt", default=None,
                    help="LandmarkNet params; enables landmark conditioning")
    ap.add_argument("--landmark-rert", default=None,
                    help="native .rert ERT model: EXACT dlib-parity "
                         "landmark conditioning computed on the host per "
                         "batch (get_landmarks parity, ddpm.py:1068-1099)")
    ap.add_argument("--prior-dir", default=None,
                    help="dir of {target_id}.png priors: q-sample the DDIM "
                         "start from the prior latent (load_prior parity, "
                         "inference_test_bench.py:414-436)")
    ap.add_argument("--start-from-target", action="store_true",
                    help="q-sample the DDIM start from the TARGET latent "
                         "(--Start_from_target with use_prior and no prior "
                         "dir: prior == GT, test_bench_dataset.py:363)")
    ap.add_argument("--safety-ckpt", default=None,
                    help="StableDiffusionSafetyChecker state dict: flag/blur "
                         "NSFW outputs (inference_test_bench.py:48-51)")
    args = ap.parse_args(argv)
    apply_backend(args)

    import jax
    import jax.numpy as jnp

    from reface_tpu.data import PrefetchLoader, TestBenchConfig, TestBenchDataset

    swapper = build_swapper(args)
    size = swapper.config.image_size

    landmark_fn = None
    if args.landmark_ckpt:
        # get_landmarks parity: 68-point coords of the TARGET feed the
        # conditioning fusion (ddpm.py:1068-1099), batched on device here
        from reface_tpu.ckpt.io import load_params
        from reface_tpu.nn.landmarks import LandmarkNet, LandmarkNetConfig

        lm_net = LandmarkNet(LandmarkNetConfig())
        lm_params = load_params(args.landmark_ckpt)
        lm_s = lm_net.config.input_size

        @jax.jit
        def landmark_fn(tgt_pm1):
            x = jax.image.resize(
                tgt_pm1, (tgt_pm1.shape[0], lm_s, lm_s, 3), "bilinear"
            )
            lm = lm_net.apply(lm_params, x)
            return lm * (size / lm_s)
    elif args.landmark_rert:
        # exact dlib-ERT landmarks of the 512px target crop on the host —
        # the reference's own source for this conditioning stream
        # (get_landmarks loops dlib over the GT batch, ddpm.py:1068-1099)
        from reface_tpu.nn.landmarks import landmark_fn_from_rert

        rert_fn = landmark_fn_from_rert(args.landmark_rert, size)

        def landmark_fn(tgt_pm1):
            return jnp.asarray(rert_fn(tgt_pm1))
    from reface_tpu.cli.common import build_safety_checker

    safety = build_safety_checker(args.safety_ckpt)

    bench_kw = dict(
        dataset_dir=args.dataset_dir, dataset=args.dataset,
        image_size=size, num_pairs=args.num_pairs,
        prior_dir=args.prior_dir,
    )
    if args.head_swap:
        from reface_tpu.preprocess.masks import HEAD_SWAP_CELEBA

        bench_kw.update(remove_tar=HEAD_SWAP_CELEBA,
                        preserve_src=HEAD_SWAP_CELEBA)
    ds = TestBenchDataset(TestBenchConfig(**bench_kw))
    loader = PrefetchLoader(ds, batch_size=args.n_samples, shuffle=False,
                            drop_last=False)

    os.makedirs(os.path.join(args.outdir, "results"), exist_ok=True)
    key = jax.random.key(args.seed)
    done = 0
    t0 = time.perf_counter()
    for batch in loader:
        b = batch["target_image"].shape[0]
        if b < args.n_samples:  # pad the ragged tail to the compiled shape
            pad = args.n_samples - b
            batch = {
                k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
                for k, v in batch.items()
            }
        key, sub = jax.random.split(key)
        tgt = jnp.asarray(batch["target_image"])
        lm = landmark_fn(tgt) if landmark_fn is not None else None
        prior = None
        if args.prior_dir:
            prior = jnp.asarray(batch["prior_image"])
        elif args.start_from_target:
            prior = tgt  # prior == GT when no prior dir is loaded
        out = swapper.swap(
            target_image=tgt,
            inpaint_image=jnp.asarray(batch["inpaint_image"]),
            inpaint_mask=jnp.asarray(batch["inpaint_mask"]),
            ref_clip224=jnp.asarray(batch["ref_clip224"]),
            landmarks=lm,
            key=sub,
            prior_image=prior,
        )
        if safety is not None:
            out01, flags = safety((out + 1.0) / 2.0)
            out = out01 * 2.0 - 1.0
            # count only the real rows (the ragged tail repeats the last item)
            nflag = int(np.asarray(flags)[:b].sum())
            if nflag:
                print(f"[test_bench] safety checker flagged {nflag} images")
        out = np.asarray(out)[:b]
        for i in range(b):
            tid = int(batch["target_id"][i])
            sid = int(batch["source_id"][i])
            save_image_pm1(
                os.path.join(args.outdir, "results", f"{sid}_{tid}.png"), out[i]
            )
            if args.save_aux:
                save_image_pm1(
                    os.path.join(args.outdir, "GT", f"{tid}.png"),
                    batch["target_image"][i],
                )
                save_image_pm1(
                    os.path.join(args.outdir, "inpaint", f"{tid}.png"),
                    batch["inpaint_image"][i],
                )
                save_image_pm1(
                    os.path.join(args.outdir, "mask", f"{tid}.png"),
                    np.repeat(batch["inpaint_mask"][i] * 2 - 1, 3, axis=-1),
                )
                save_grid_pm1(
                    os.path.join(args.outdir, "grid", f"{sid}_{tid}.png"),
                    [batch["target_image"][i], batch["inpaint_image"][i], out[i]],
                )
        done += b
        rate = done / (time.perf_counter() - t0)
        print(f"[test_bench] {done}/{len(ds)} swaps ({rate:.2f} swaps/s)")
    print(f"[test_bench] wrote {done} swaps to {args.outdir}")


if __name__ == "__main__":
    main()
