"""Per-stage micro-benchmarks: conditioner / VAE encode / VAE decode.

The fixed (non-sampler) cost per swap — conditioning towers + VAE encode +
VAE decode — bounds the serving-mode ladder; this attributes it. Chained,
readback-synced per CLAUDE.md measurement rules.
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


def _time_chain(fn, params, args0, chain, iters=4):
    """fn(params, *args) -> array; params passed as a jit ARGUMENT (closed-
    over params would be baked into the HLO as constants — gigabytes over
    the tunnel)."""

    @jax.jit
    def chained(params, seed, *args):
        def body(c, _):
            out = fn(params, *args)
            return c + jnp.mean(out.astype(jnp.float32)), ()

        c, _ = jax.lax.scan(body, seed, None, length=chain)
        return c

    _ = float(chained(params, jnp.float32(0), *args0))
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        _ = float(chained(params, jnp.float32(i + 1), *args0))
        times.append(time.perf_counter() - t0)
    return min(times) / chain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--chain", type=int, default=8)
    args = ap.parse_args()

    from reface_tpu.pipelines.swap import FaceSwapper, SwapConfig

    cfg = SwapConfig()
    params = FaceSwapper.init_params(cfg, jax.random.key(0))
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    sw = FaceSwapper(cfg, params)
    b = args.batch
    s = cfg.image_size
    ks = jax.random.split(jax.random.key(1), 4)
    img = jax.random.uniform(ks[0], (b, s, s, 3), minval=-1, maxval=1)
    ref = jax.random.normal(ks[1], (b, 224, 224, 3))
    lm = jax.random.uniform(ks[2], (b, 136)) * s
    z = jax.random.normal(ks[3], (b, cfg.latent_size, cfg.latent_size, 4))

    t_cond = _time_chain(
        lambda p, ref, img, lm: sw.build_context(p, ref, img, lm)[0],
        params, (ref, img, lm), args.chain,
    )
    t_enc = _time_chain(
        lambda p, im: sw.encode_latent(p, im), params, (img,), args.chain
    )
    t_dec = _time_chain(
        lambda p, zz: sw.decode_latent(p, zz), params, (z,), args.chain
    )
    print(f"batch {b}: conditioner {t_cond*1e3:.1f} ms, "
          f"vae-encode {t_enc*1e3:.1f} ms, vae-decode {t_dec*1e3:.1f} ms, "
          f"sum {1e3*(t_cond+t_enc+t_dec):.1f} ms "
          f"({1e3*(t_cond+t_enc+t_dec)/b:.1f} ms/swap)")


if __name__ == "__main__":
    main()
