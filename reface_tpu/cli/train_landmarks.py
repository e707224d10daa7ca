"""Distill the batched LandmarkNet from reference landmark labels.

The reference calls dlib per image inside the training loop
(ddpm.py:1068-1099); our hot path uses the batched LandmarkNet
(nn/landmarks.py) instead, distilled offline from dlib outputs so the 136-d
conditioning matches (SURVEY.md hard-part #1).

Labels come from an .npz with arrays `images` (N,S,S,3 uint8, aligned crops)
and `landmarks` (N,68,2 float pixel coords) — produced by running dlib (or
the native ERT evaluator) offline, or any landmark annotator.

Usage:
  python -m reface_tpu.cli.train_landmarks --data landmarks.npz \
      --out lmnet_ckpt --steps 2000 [--backend cpu --tiny]
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", required=True, help=".npz with images+landmarks")
    ap.add_argument("--out", required=True, help="orbax checkpoint dir")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
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
    landmarks = data["landmarks"].astype(np.float32).reshape(len(images), -1)
    n, s = images.shape[0], images.shape[1]
    print(f"[lm] {n} samples @ {s}px")

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

    rng = np.random.default_rng(args.seed)
    for i in range(args.steps):
        idx = rng.integers(0, n, args.batch_size)
        imgs = jnp.asarray(images[idx].astype(np.float32) / 127.5 - 1.0)
        lms = jnp.asarray(landmarks[idx])
        params, opt_state, loss = step(params, opt_state, imgs, lms)
        if i % 100 == 0 or i == args.steps - 1:
            print(f"[lm] step {i}: L1 {float(loss):.3f} px")

    save_params(args.out, jax.device_get(params))
    print(f"[lm] saved {args.out}")


if __name__ == "__main__":
    main()
