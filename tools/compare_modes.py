"""Numerics deltas between the exact protocol and the serving modes.

Runs the SAME swap batch (real-size model, fixed PRNG) under several
sampler/kernel configurations and reports image-space deltas vs the exact
DDIM-50 protocol output. With random-init weights perceptual metrics are
meaningless, but the numerics delta of kernel modes (exact vs fast
attention) is weight-independent in character, and the protocol deltas
(step count, CFG interval) document the measurement methodology to rerun
with trained checkpoints (BENCH_LOG.md):

  python tools/compare_modes.py [--ckpt <params-dir>]

For each mode prints JSON {mode, mae, max_abs, psnr_vs_exact}.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import numpy as np

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
    ap.add_argument("--ckpt", default=None, help="orbax params dir")
    ap.add_argument("--batch", type=int, default=4,
                    help="4 reuses the bench.py compile cache")
    args = ap.parse_args()

    from reface_tpu.nn.unet import UNetConfig
    from reface_tpu.nn.vae import VAEConfig
    from reface_tpu.pipelines.swap import FaceSwapper, SwapConfig

    def params_for(cfg):
        p = FaceSwapper.init_params(cfg, jax.random.key(0))
        if args.ckpt:
            from reface_tpu.ckpt.io import load_params

            p = load_params(args.ckpt, p)
        else:
            # SD zero-inits the residual-gate kernels (out_conv, proj_out);
            # at random init those zeros disconnect the transformer blocks
            # entirely and make kernel-numerics deltas vacuously 0 — fill
            # every all-zero kernel with small noise so each path matters.
            cnt = [0]

            def fill(x):
                if x.ndim >= 2 and not np.any(np.asarray(x)):
                    cnt[0] += 1
                    return 0.05 * jax.random.normal(
                        jax.random.key(cnt[0]), x.shape, x.dtype
                    )
                return x

            p = jax.tree.map(fill, p)
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, p,
        )

    b = args.batch
    s = 512
    ks = jax.random.split(jax.random.key(1), 5)
    batch = dict(
        target_image=jax.random.uniform(ks[0], (b, s, s, 3), minval=-1, maxval=1),
        inpaint_image=jax.random.uniform(ks[1], (b, s, s, 3), minval=-1, maxval=1),
        inpaint_mask=(jax.random.uniform(ks[2], (b, s, s, 1)) > 0.5).astype(
            jnp.float32
        ),
        ref_clip224=jax.random.normal(ks[3], (b, 224, 224, 3)),
        landmarks=jax.random.uniform(ks[4], (b, 136)) * s,
    )

    modes = {
        "exact_ddim50": SwapConfig(),
        "fast_attn_ddim50": SwapConfig(unet=UNetConfig(attn_impl="fast")),
        "ddim30": SwapConfig(ddim_steps=30),
        "ddim15_cfg8_fast": SwapConfig(
            ddim_steps=15, cfg_steps=8, unet=UNetConfig(attn_impl="fast")
        ),
        # int8 MXU matmuls/convs at the exact protocol: a pure
        # kernel-numerics delta (weight-independent in character, like the
        # fast-attention row). Matches the shipped --quant int8 knob:
        # UNet transformer blocks + ResBlock convs + VAE ResnetBlock convs.
        "int8_ddim50": SwapConfig(unet=UNetConfig(quant="int8"),
                                  vae=VAEConfig(quant="int8")),
        # conv-only int8 (--quant int8conv): the transformer matmuls keep
        # exact bf16 math, so the transformer numerics delta comes from the
        # ResBlock + VAE ResnetBlock convs alone — strictly tighter than
        # full int8
        "int8conv_ddim50": SwapConfig(unet=UNetConfig(quant="int8conv"),
                                      vae=VAEConfig(quant="int8conv")),
        # the reference's --plms protocol switch at the same 50-step grid
        # (inference_test_bench.py:185,336-337): solver delta only
        "plms50": SwapConfig(sampler="plms"),
        # DPM-Solver++(2M) step-count reduction on its logSNR-uniform grid
        # (the cli/common.py auto-default for --sampler dpm): the
        # training-free alternative to the distilled student's 2nd-order
        # rungs at DDIM-30/DDIM-15-equivalent cost
        "dpm30_lam": SwapConfig(sampler="dpm", ddim_steps=30,
                                ddim_discretize="lam_uniform"),
        "dpm15_lam": SwapConfig(sampler="dpm", ddim_steps=15,
                                ddim_discretize="lam_uniform"),
    }
    base_cfg = modes["exact_ddim50"]
    base_params = params_for(base_cfg)
    outs = {}
    for name, cfg in modes.items():
        sw = FaceSwapper(cfg, base_params)
        out = sw.swap(**batch, key=jax.random.key(7))
        outs[name] = np.asarray(out, np.float32)
        print(f"# {name} done", flush=True)

    ref = outs["exact_ddim50"]
    for name, out in outs.items():
        d = np.abs(out - ref)
        mse = float((d**2).mean())
        psnr = 10 * np.log10(4.0 / mse) if mse > 0 else float("inf")
        print(json.dumps({
            "mode": name,
            "mae_vs_exact": round(float(d.mean()), 6),
            "max_abs_vs_exact": round(float(d.max()), 4),
            "psnr_vs_exact_db": round(psnr, 2),
        }))


if __name__ == "__main__":
    main()
