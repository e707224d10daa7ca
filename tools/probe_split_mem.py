"""AOT memory analysis of the split-grad train-step programs.

Compiles each of the four split programs with abstract inputs (no real
allocation) and prints XLA's buffer-assignment numbers — temp bytes,
argument/output bytes, aliasing — so single-chip HBM budgeting is measured
rather than guessed. Compiles hit the persistent cache when available.

  python tools/probe_split_mem.py [--batch 1] [--acc-dtype bfloat16]
      [--mu-dtype bfloat16] [--programs pull,update]
"""

from __future__ import annotations

import argparse
import os


def sds_like(tree):
    import jax

    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree
    )


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--acc-dtype", default="bfloat16")
    ap.add_argument("--mu-dtype", default="bfloat16")
    ap.add_argument("--programs", default="collect,towers,pull,update")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--backend", default=None)
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
    from reface_tpu.nn.lpips import LPIPS
    from reface_tpu.nn.unet import UNetConfig
    from reface_tpu.pipelines.swap import FaceSwapper, SwapConfig, tiny_swap_config
    from reface_tpu.pipelines.train import TrainConfig, make_train_step

    swap_cfg = (tiny_swap_config(image_size=args.image_size or 64)
                if args.tiny else
                SwapConfig(image_size=args.image_size,
                           unet=UNetConfig(remat=True)))
    recon = ReconLossConfig()
    train_cfg = TrainConfig(split_grad=2, split_acc_dtype=args.acc_dtype,
                            mu_dtype=args.mu_dtype)

    # abstract params/state — nothing real is allocated
    params = jax.eval_shape(
        lambda k: FaceSwapper.init_params(swap_cfg, k), jax.random.key(0)
    )
    s = swap_cfg.image_size
    x0 = jax.ShapeDtypeStruct((1, s, s, 3), jnp.float32)
    params["lpips"] = jax.eval_shape(
        lambda k: LPIPS().init(k, jnp.zeros((1, s, s, 3)),
                               jnp.zeros((1, s, s, 3))), jax.random.key(1)
    )

    step_fn, _, init_state = make_train_step(swap_cfg, train_cfg, recon=recon)
    assert hasattr(step_fn, "programs"), "split-2 step required"
    state = jax.eval_shape(init_state, params)

    b = args.batch
    key = jax.ShapeDtypeStruct((), jax.random.key(0).dtype)
    batch = dict(
        target_image=jax.ShapeDtypeStruct((b, s, s, 3), jnp.float32),
        inpaint_image=jax.ShapeDtypeStruct((b, s, s, 3), jnp.float32),
        inpaint_mask=jax.ShapeDtypeStruct((b, s, s, 1), jnp.float32),
        ref_clip224=jax.ShapeDtypeStruct((b, 224, 224, 3), jnp.float32),
    )
    lat = swap_cfg.latent_size
    pl = tuple(jax.ShapeDtypeStruct((b, lat, lat, 4), jnp.float32)
               for _ in range(3))
    ref_flip = batch["ref_clip224"]
    rest = jax.ShapeDtypeStruct((b, lat, lat, 5), jnp.float32)

    # loss_r/metrics_r scalars for the update program
    f32 = jax.ShapeDtypeStruct((), jnp.float32)
    metrics_r = {"id_loss": f32, "lpips_loss": f32}
    grads_r = jax.eval_shape(
        lambda p, bt, k, c: step_fn.programs["pull"](p, bt, k, c),
        params, batch, key, pl,
    )

    calls = {
        "collect": lambda P: P.lower(params, batch, key),
        "towers": lambda P: P.lower(pl, params, batch, ref_flip, rest),
        "pull": lambda P: P.lower(params, batch, key, pl),
        "update": lambda P: P.lower(state, batch, key, f32, metrics_r,
                                    grads_r),
    }
    gb = 1 / 2**30
    for name in args.programs.split(","):
        P = step_fn.programs[name]
        try:
            comp = calls[name](P).compile()
            ma = comp.memory_analysis()
            print(f"[{name}] temp={ma.temp_size_in_bytes*gb:.2f}G "
                  f"args={ma.argument_size_in_bytes*gb:.2f}G "
                  f"out={ma.output_size_in_bytes*gb:.2f}G "
                  f"alias={ma.alias_size_in_bytes*gb:.2f}G "
                  f"code={ma.generated_code_size_in_bytes*gb:.3f}G")
        except Exception as e:
            print(f"[{name}] FAILED: {str(e)[:300]}")


if __name__ == "__main__":
    main()
