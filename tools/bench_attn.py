"""Standalone attention-kernel A/B on the real chip.

Benchmarks the UNet's level-1 self-attention workload (BH=64, N=4096, D=40)
plus the other levels, comparing the generic flash kernel against
ops/attention_smalld. Readback-synced chains per CLAUDE.md rules.
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
    ap.add_argument("--impl", default="smalld",
                    choices=["smalld", "smalld-fast", "smalld-tn", "smalld-tn-fast", "flash", "einsum"])
    ap.add_argument("--bh", type=int, default=64)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--d", type=int, default=40)
    ap.add_argument("--block-q", type=int, default=256)
    ap.add_argument("--chain", type=int, default=20)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    bh, n, d = args.bh, args.n, args.d
    key = jax.random.key(0)
    q = jax.random.normal(key, (bh, n, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (bh, n, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (bh, n, d), jnp.bfloat16)

    if args.impl.startswith("smalld"):
        from reface_tpu.ops.attention_smalld import self_attention_smalld

        fast = args.impl.endswith("fast")
        layout = "tn" if "-tn" in args.impl else "nn"
        attn = lambda q, k, v: self_attention_smalld(
            q, k, v, block_q=args.block_q, fast=fast, layout=layout
        )
    elif args.impl == "flash":
        from reface_tpu.ops.attention import attention_bhnd

        # flash expects (B, H, N, D); fold bh into H with B=1
        attn = lambda q, k, v: attention_bhnd(
            q[None], k[None], v[None], use_flash=True
        )[0]
    else:
        from reface_tpu.ops.attention import attention_bhnd

        attn = lambda q, k, v: attention_bhnd(
            q[None], k[None], v[None], use_flash=False
        )[0]

    @jax.jit
    def chain(q, k, v, seed):
        q = q.at[0, 0, 0].add(seed.astype(q.dtype) * 1e-6)

        def body(q, _):
            o = attn(q, k, v)
            return o, ()

        q_final, _ = jax.lax.scan(body, q, None, length=args.chain)
        return jnp.mean(q_final.astype(jnp.float32))

    _ = float(chain(q, k, v, jnp.float32(0.0)))
    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        _ = float(chain(q, k, v, jnp.float32(i + 1.0)))
        times.append(time.perf_counter() - t0)
    best = min(times) / args.chain
    gf = 2 * 2 * bh * n * n * d / 1e9  # QK + PV
    print(f"{args.impl}: {best*1e3:.3f} ms/attn (bh={bh} n={n} d={d}), "
          f"{gf/best/1e3:.1f} TFLOP/s matmul-equiv, "
          f"times={[round(t,3) for t in times]}")


if __name__ == "__main__":
    main()
