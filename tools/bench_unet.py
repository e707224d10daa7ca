"""UNet-forward micro-benchmark for kernel A/B on the real chip.

Measurement rules (CLAUDE.md): the axon tunnel lies to block_until_ready and
caches identical-arg results, so each measurement is a CHAIN of dependent
UNet forwards ending in a scalar readback; the first chain in a process
reads ~35% slow (power ramp), so several chains are run and the converged
minimum is reported.

Usage:
  python tools/bench_unet.py [--batch 8] [--chain 10] [--iters 5]
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
    ap.add_argument("--batch", type=int, default=8, help="CFG batch (2x4)")
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--context-tokens", type=int, default=1)
    ap.add_argument("--fused-gn", action="store_true")
    ap.add_argument("--quant", default="none",
                    choices=["none", "int8", "int8conv"])
    ap.add_argument("--attn", default="auto",
                    choices=["auto", "fast", "flash", "einsum"])
    ap.add_argument("--ablate", default="none",
                    choices=["none", "attn-core", "ff", "transformer"],
                    help="timing probes: replace a component with identity "
                         "to attribute cost (NOT a numerics mode)")
    args = ap.parse_args()

    import reface_tpu.nn.layers as L
    import reface_tpu.nn.unet as U

    if args.ablate == "attn-core":
        L._attention = lambda q, k, v, h, **kw: v  # projections stay
    elif args.ablate == "ff":
        L.FeedForwardGEGLU.__call__ = lambda self, x: x
    elif args.ablate == "transformer":
        U.SpatialTransformer.__call__ = lambda self, x, ctx: x

    from reface_tpu.nn.unet import UNetConfig, UNetModel

    cfg = UNetConfig(fused_groupnorm=args.fused_gn, attn_impl=args.attn,
                     quant=args.quant)
    model = UNetModel(cfg)
    b = args.batch
    key = jax.random.key(0)
    x9 = jax.random.normal(key, (b, 64, 64, 9), jnp.float32)
    t = jnp.full((b,), 617, jnp.int32)
    ctx = jax.random.normal(key, (b, args.context_tokens, 768), jnp.float32)
    params = jax.jit(model.init)(key, x9, t, ctx)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params,
    )

    @jax.jit
    def chain(params, x9, t, ctx, seed):
        def body(x, i):
            eps = model.apply(params, x, t + i, ctx)
            x = x.at[..., :4].add(eps * 1e-3)
            return x, ()

        x9 = x9.at[0, 0, 0, 0].add(seed * 1e-6)  # defeat result caching
        x_final, _ = jax.lax.scan(body, x9, jnp.arange(args.chain))
        return jnp.mean(x_final)

    # compile + warm up
    _ = float(chain(params, x9, t, ctx, jnp.float32(0.0)))
    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        _ = float(chain(params, x9, t, ctx, jnp.float32(i + 1.0)))
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"chain {i}: {dt*1000:.1f} ms total, "
              f"{dt/args.chain*1000:.2f} ms/fwd")
    best = min(times) / args.chain
    tflop_per_fwd = 1.0238 * b  # ~1.02 TF/image at 64x64 (BENCH_LOG)
    tfs = tflop_per_fwd / best
    print(f"best: {best*1000:.2f} ms/fwd at batch {b} "
          f"(~{tfs:.0f} TFLOP/s, {tfs/197*100:.0f}% of v5e bf16 peak)")


if __name__ == "__main__":
    main()
