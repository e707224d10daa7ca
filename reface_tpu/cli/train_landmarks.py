"""Distill the batched LandmarkNet from reference landmark labels.

The reference calls dlib per image inside the training loop
(ddpm.py:1068-1099); our hot path uses the batched LandmarkNet
(nn/landmarks.py) instead, distilled offline from dlib outputs so the 136-d
conditioning matches (SURVEY.md hard-part #1).

Label sources:
  * `.npz` arrays `images` (N,S,S,3 uint8, aligned crops) and `landmarks`
    (N,68,2 float pixel coords) — produced offline by any annotator.
  * `--rert model.rert`: labels computed HERE by the native exact-parity
    ERT cascade over the npz's images (full-image boxes, the deployment
    convention) — the actual dlib->CNN distillation flow. The npz's own
    `landmarks` array (if present) is kept as an independent ground truth
    and the final report shows CNN-vs-ERT AND CNN-vs-GT px errors.

A `--val-frac` holdout is never trained on; the final line reports its
mean per-point px error — the documented CNN tolerance (SURVEY.md
hard-part #1; measured numbers in BENCH_LOG.md "Landmark stack").

Usage:
  python -m reface_tpu.cli.train_landmarks --data landmarks.npz \
      --out lmnet_ckpt --steps 2000 [--rert model.rert] \
      [--backend cpu --tiny]
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", required=True, help=".npz with images"
                    "[+landmarks]")
    ap.add_argument("--out", required=True, help="orbax checkpoint dir")
    ap.add_argument("--rert", default=None,
                    help="native .rert model: labels come from the exact "
                         "ERT over the npz images (distill-from-dlib mode)")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--val-frac", type=float, default=0.1,
                    help="holdout fraction for the px-error report")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log-every", type=int, default=100)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"])
    args = ap.parse_args(argv)
    from reface_tpu.cli.common import apply_backend

    apply_backend(args)

    import jax
    import jax.numpy as jnp
    import optax

    from reface_tpu.ckpt.io import save_params
    from reface_tpu.nn.landmarks import LandmarkNet, LandmarkNetConfig

    data = np.load(args.data)
    images = data["images"]
    n, s = images.shape[0], images.shape[1]
    gt = (data["landmarks"].astype(np.float32)
          if "landmarks" in data else None)

    if args.rert:
        from reface_tpu.nn.landmarks import landmark68_fn_from_rert

        ert_fn = landmark68_fn_from_rert(args.rert)
        labels = np.concatenate([
            ert_fn(images[i:i + 256].astype(np.float32) / 255.0)
            for i in range(0, n, 256)
        ]).astype(np.float32)
        print(f"[lm] labels: native ERT over {n} crops ({args.rert})")
    elif gt is not None:
        labels = gt
        print(f"[lm] labels: npz landmarks")
    else:
        raise SystemExit("--data has no `landmarks` array; pass --rert")
    labels_flat = labels.reshape(n, -1)

    n_val = max(1, int(n * args.val_frac)) if args.val_frac > 0 else 0
    n_tr = n - n_val
    print(f"[lm] {n_tr} train / {n_val} val @ {s}px")

    cfg = (
        LandmarkNetConfig(widths=(8, 16, 32, 32), input_size=s,
                          dtype=jnp.float32)
        if args.tiny
        else LandmarkNetConfig(input_size=s)
    )
    model = LandmarkNet(cfg)
    params = model.init(jax.random.key(args.seed), jnp.zeros((1, s, s, 3)))
    tx = optax.adamw(optax.cosine_decay_schedule(args.lr, args.steps))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, imgs, lms):
        def loss_fn(p):
            pred = model.apply(p, imgs)
            return jnp.mean(jnp.abs(pred - lms))  # L1 in pixels

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def predict(params, imgs):
        return model.apply(params, imgs)

    def px_error(params, idx, ref):
        """Mean per-point euclidean px error of the CNN vs `ref` coords."""
        errs = []
        for i in range(0, len(idx), 64):
            ii = idx[i:i + 64]
            imgs = jnp.asarray(images[ii].astype(np.float32) / 127.5 - 1.0)
            pred = np.asarray(predict(params, imgs)).reshape(-1, 68, 2)
            errs.append(np.sqrt(
                ((pred - ref[ii].reshape(-1, 68, 2)) ** 2).sum(-1)
            ).mean(-1))
        return float(np.concatenate(errs).mean())

    rng = np.random.default_rng(args.seed)
    for i in range(args.steps):
        idx = rng.integers(0, n_tr, args.batch_size)
        imgs = jnp.asarray(images[idx].astype(np.float32) / 127.5 - 1.0)
        lms = jnp.asarray(labels_flat[idx])
        params, opt_state, loss = step(params, opt_state, imgs, lms)
        if i % args.log_every == 0 or i == args.steps - 1:
            print(f"[lm] step {i}: L1 {float(loss):.3f} px", flush=True)

    save_params(args.out, jax.device_get(params))
    print(f"[lm] saved {args.out}")

    if n_val:
        val_idx = np.arange(n_tr, n)
        err = px_error(params, val_idx, labels)
        src = "ERT" if args.rert else "labels"
        print(f"[lm] val mean px error vs {src} @{s}px: {err:.2f} "
              f"(n={n_val})")
        if args.rert and gt is not None:
            err_gt = px_error(params, val_idx, gt)
            ert_gt = float(np.sqrt(
                ((labels[val_idx] - gt[val_idx]) ** 2).sum(-1)
            ).mean())
            print(f"[lm] val mean px error vs GT @{s}px: {err_gt:.2f} "
                  f"(teacher ERT vs GT: {ert_gt:.2f})")


if __name__ == "__main__":
    main()
