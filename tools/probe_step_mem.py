"""AOT memory analysis of the MONOLITHIC (eps-config) train-step program.

Companion to tools/probe_split_mem.py (which probes the four split-grad
programs): compiles the single-program eps step with abstract inputs and
prints XLA's buffer-assignment numbers — temp/argument/output/alias bytes —
so the "does eps + EMA fit on a 16G v5e" question is answered by the
compiler, not by burning a 35-minute compile-then-OOM cycle. The step is
lowered exactly as cli/train.py runs it: jit with donate_argnums=(0,), so
the alias column shows how much of the old TrainState XLA reuses in place.

  python tools/probe_step_mem.py [--batch 1] [--mu-dtype bfloat16]
      [--ema-decay 0.9999 --ema-dtype bfloat16] [--backend cpu --tiny]
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--mu-dtype", default=None)
    ap.add_argument("--ema-decay", type=float, default=0.0)
    ap.add_argument("--ema-dtype", default=None)
    ap.add_argument("--no-donate", action="store_true",
                    help="probe the pre-round-5 no-donation lowering for A/B")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"])
    args = ap.parse_args()
    from reface_tpu.cli.common import apply_backend

    apply_backend(args)  # shared platform forcing + .jax_cache wiring
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from reface_tpu.nn.unet import UNetConfig
    from reface_tpu.pipelines.swap import FaceSwapper, SwapConfig, tiny_swap_config
    from reface_tpu.pipelines.train import TrainConfig, make_train_step

    swap_cfg = (tiny_swap_config(image_size=64)
                if args.tiny else
                SwapConfig(image_size=args.image_size,
                           unet=UNetConfig(remat=True)))
    train_cfg = TrainConfig(
        mu_dtype=args.mu_dtype,
        ema_decay=args.ema_decay or None,
        ema_dtype=args.ema_dtype,
    )

    # abstract params/state — nothing real is allocated
    params = jax.eval_shape(
        lambda k: FaceSwapper.init_params(swap_cfg, k), jax.random.key(0)
    )
    step_fn, _, init_state = make_train_step(swap_cfg, train_cfg, recon=None)
    assert not getattr(step_fn, "precompiled", False), (
        "monolithic step expected; use probe_split_mem for split-grad")
    state = jax.eval_shape(init_state, params)

    b, s = args.batch, swap_cfg.image_size
    key = jax.ShapeDtypeStruct((), jax.random.key(0).dtype)
    batch = dict(
        target_image=jax.ShapeDtypeStruct((b, s, s, 3), jnp.float32),
        inpaint_image=jax.ShapeDtypeStruct((b, s, s, 3), jnp.float32),
        inpaint_mask=jax.ShapeDtypeStruct((b, s, s, 1), jnp.float32),
        ref_clip224=jax.ShapeDtypeStruct((b, 224, 224, 3), jnp.float32),
    )

    donate = () if args.no_donate else (0,)
    comp = (jax.jit(step_fn, donate_argnums=donate)
            .lower(state, batch, key).compile())
    ma = comp.memory_analysis()
    gb = 1 / 2**30
    print(f"[eps_step donate={not args.no_donate} "
          f"mu={args.mu_dtype} ema={args.ema_decay or None}/"
          f"{args.ema_dtype}] "
          f"temp={ma.temp_size_in_bytes*gb:.2f}G "
          f"args={ma.argument_size_in_bytes*gb:.2f}G "
          f"out={ma.output_size_in_bytes*gb:.2f}G "
          f"alias={ma.alias_size_in_bytes*gb:.2f}G "
          f"code={ma.generated_code_size_in_bytes*gb:.3f}G")
    peak = (ma.temp_size_in_bytes + ma.argument_size_in_bytes
            + ma.output_size_in_bytes - ma.alias_size_in_bytes)
    print(f"[eps_step] resident upper bound (args+out-alias+temp) = "
          f"{peak*gb:.2f}G")


if __name__ == "__main__":
    main()
