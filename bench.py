"""North-star benchmark: swaps/sec/chip at 512px DDIM-50 (BASELINE.json).

Protocol parity: scripts/inference_test_bench.py semantics — per swap:
conditioning (CLIP x2 + ArcFace + landmark proj), VAE encode of the masked
target, 50-step DDIM with CFG scale 3 (2 UNet fwds/step), VAE decode.
Here the whole swap is ONE jitted XLA program; throughput is measured over
batched swaps with device sync, reported per chip.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is value / 10.0 (the >=10 swaps/sec/chip target).
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

# Persistent XLA compilation cache: the fused 512px DDIM-50 program takes
# ~15 min to compile over the axon tunnel; caching cuts reruns to seconds.
import os as _os

jax.config.update(
    "jax_compilation_cache_dir",
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _cast_params(params, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="CPU smoke config")
    ap.add_argument("--batch", type=int, default=0, help="0 = auto")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--cfg-steps", type=int, default=0,
                    help="serving mode: CFG only on the first N steps "
                         "(0 = reference protocol)")
    ap.add_argument("--cfg-scale", type=float, default=3.0,
                    help="guidance scale; 1.0 = no CFG (single conditional "
                         "forward per step — the guidance-folded distilled-"
                         "student serving mode, cli/distill.py)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--sampler", default="ddim",
                    choices=["ddim", "plms", "dpm"],
                    help="sampler for the fused program (plms = reference "
                         "--plms protocol; dpm = DPM-Solver++(2M))")
    ap.add_argument("--discretize", default=None,
                    choices=["uniform", "quad", "lam_uniform"],
                    help="timestep grid (default: uniform, or lam_uniform "
                         "when --sampler dpm, matching cli/common.py)")
    ap.add_argument("--causal", type=int, default=0,
                    help="TRUSTWORTHY overlapped-dispatch mode: keep N "
                         "batches in flight, but fold a scalar of batch "
                         "i's output into batch i+1's input, so the device "
                         "cannot start a batch before the previous one "
                         "finished and the tunnel cannot reorder or cache "
                         "results (each input differs). Measures the "
                         "tunnel-RTT-free rate a production host would "
                         "see; readback forced per batch, in order.")
    ap.add_argument("--pipeline", type=int, default=0,
                    help="EXPERIMENTAL overlapped-dispatch mode. NOT trusted "
                         "over the axon tunnel: with batches in flight the "
                         "readback ordering is unreliable and measured rates "
                         "can exceed the chip's FLOP ceiling (observed 1.96 "
                         "swaps/s at DDIM-50 vs a ~1.5 physical max). The "
                         "recorded numbers use the default one-at-a-time "
                         "mode, whose per-batch readback RTT makes them "
                         "strictly conservative.")
    ap.add_argument("--weights-dtype", default="bfloat16")
    ap.add_argument("--attn", default="auto",
                    choices=["auto", "fast", "flash", "einsum"],
                    help="self-attention kernel (fast = serving mode)")
    ap.add_argument("--quant", default="none",
                    choices=["none", "int8", "int8conv"],
                    help="serving mode: int8 MXU matmuls for the "
                         "transformer blocks (QKV/out + GEGLU FF)")
    ap.add_argument("--quant-cond", action="store_true",
                    help="also int8 the CLIP conditioner tower matmuls "
                         "(fixed per-swap cost attack for short rungs)")
    args = ap.parse_args()
    if args.causal and args.pipeline:
        ap.error("--causal and --pipeline are mutually exclusive dispatch "
                 "modes; pick one")

    if args.tiny:
        # CPU smoke: the sitecustomize pins JAX_PLATFORMS=axon, so switch
        # programmatically BEFORE anything touches the backend (see
        # CLAUDE.md / cli/common.apply_backend).
        jax.config.update("jax_platforms", "cpu")

    from reface_tpu.nn.unet import UNetConfig
    from reface_tpu.nn.vae import VAEConfig
    from reface_tpu.pipelines.swap import FaceSwapper, SwapConfig, tiny_swap_config

    # grid default matches cli/common.py: DPM-Solver++ wants the
    # logSNR-uniform grid unless explicitly overridden
    discretize = args.discretize or (
        "lam_uniform" if args.sampler == "dpm" else "uniform"
    )
    if args.tiny:
        import dataclasses

        cfg = tiny_swap_config(image_size=64, ddim_steps=2)
        cfg = dataclasses.replace(
            cfg,
            sampler=args.sampler, ddim_discretize=discretize,
            unet=dataclasses.replace(cfg.unet, attn_impl=args.attn,
                                     quant=args.quant),
            vae=dataclasses.replace(cfg.vae, quant=args.quant),
        )
        if args.quant_cond:
            cfg = dataclasses.replace(cfg, conditioner=dataclasses.replace(
                cfg.conditioner, clip=dataclasses.replace(
                    cfg.conditioner.clip, quant="int8")))
        batch = args.batch or 2
    else:
        cfg = SwapConfig(
            ddim_steps=args.steps, cfg_steps=args.cfg_steps,
            cfg_scale=args.cfg_scale,
            sampler=args.sampler, ddim_discretize=discretize,
            unet=UNetConfig(attn_impl=args.attn, quant=args.quant),
            vae=VAEConfig(quant=args.quant),
        )
        if args.quant_cond:
            import dataclasses

            cfg = dataclasses.replace(cfg, conditioner=dataclasses.replace(
                cfg.conditioner, clip=dataclasses.replace(
                    cfg.conditioner.clip, quant="int8")))
        # batch 8 is the measured knee of the exact protocol (1.59 swaps/s vs
        # 1.49 at batch 4; batch 16 spills — BENCH_LOG.md round-3 A/B table).
        batch = args.batch or 8

    key = jax.random.key(0)
    params = FaceSwapper.init_params(cfg, key)
    wd = jnp.dtype(args.weights_dtype)
    if wd != jnp.float32:
        params = _cast_params(params, wd)
    swapper = FaceSwapper(cfg, params)

    s = cfg.image_size
    ks = jax.random.split(jax.random.key(1), 5)
    batch_data = dict(
        target_image=jax.random.uniform(ks[0], (batch, s, s, 3), minval=-1, maxval=1),
        inpaint_image=jax.random.uniform(ks[1], (batch, s, s, 3), minval=-1, maxval=1),
        inpaint_mask=(jax.random.uniform(ks[2], (batch, s, s, 1)) > 0.5).astype(
            jnp.float32
        ),
        ref_clip224=jax.random.normal(ks[3], (batch, 224, 224, 3)),
        landmarks=jax.random.uniform(ks[4], (batch, 136)) * s,
    )

    # warmup/compile. NOTE: the axon tunnel's block_until_ready can return
    # before remote execution completes, so every timed iteration ends with a
    # scalar host readback — that round trip is the only reliable sync here.
    out = swapper.swap(**batch_data, key=jax.random.key(2))
    _ = float(jnp.mean(out))

    checks = []
    if args.causal:
        # Causally-chained overlapped dispatch: batch i+1's input contains
        # a scalar of batch i's output, so (a) on-device execution strictly
        # serializes (the rate is chip time, not wishful overlap), (b) the
        # tunnel cannot reorder completions, and (c) no result cache can
        # hit (every input differs). Unlike --pipeline, a lying readback
        # would change the FINAL value, which is checked finite; the only
        # thing removed vs the default mode is the per-batch host round
        # trip a production (non-tunnel) host wouldn't pay.
        depth = args.causal
        n = max(args.iters * 6, depth + 6)
        feed = jnp.zeros((), jnp.float32)
        pending = []
        t0 = None
        timed = 0
        for i in range(n):
            bd = dict(batch_data)
            bd["target_image"] = batch_data["target_image"] + feed * 1e-6
            out = swapper.swap(**bd, key=jax.random.key(3 + i))
            feed = jnp.mean(out)  # device scalar, consumed by batch i+1
            pending.append(feed)
            if len(pending) > depth:
                checks.append(float(pending.pop(0)))  # ordered readback
                if t0 is None:
                    t0 = time.perf_counter()
                else:
                    timed += 1
        for m in pending:
            checks.append(float(m))
            timed += 1
        best = (time.perf_counter() - t0) / timed
        times = [best]
    elif args.pipeline:
        # serving mode: keep `pipeline` dispatches in flight so host->device
        # dispatch latency overlaps device execution; each result is still
        # forced to completion by a scalar readback (in order). The clock
        # starts at the FIRST completed batch so the power-ramp/cold chains
        # don't bias the steady-state rate (CLAUDE.md measurement rules).
        n = max(args.iters, args.pipeline + 2) * 2
        inflight = []
        t0 = None
        timed = 0
        for i in range(n):
            inflight.append(
                swapper.swap(**batch_data, key=jax.random.key(3 + i))
            )
            if len(inflight) > args.pipeline:
                checks.append(float(jnp.mean(inflight.pop(0))))
                if t0 is None:
                    t0 = time.perf_counter()
                else:
                    timed += 1
        for out in inflight:
            checks.append(float(jnp.mean(out)))
            timed += 1
        best = (time.perf_counter() - t0) / timed
        times = [best]
    else:
        times = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            out = swapper.swap(**batch_data, key=jax.random.key(3 + i))
            checks.append(float(jnp.mean(out)))  # forces completion
            times.append(time.perf_counter() - t0)
        best = min(times)
    assert all(abs(c) < 1e6 for c in checks)

    swaps_per_sec = batch / best
    variant = f"_cfg{args.cfg_steps}" if args.cfg_steps else ""
    if args.sampler != "ddim":
        variant += f"_{args.sampler}"
    if args.quant != "none":
        variant += f"_{args.quant}"
    if args.quant_cond:
        variant += "_qcond"
    if args.cfg_scale == 1.0:
        variant += "_nocfg"  # guidance-folded student schedule
    if args.causal:
        variant += f"_causal{args.causal}"
    if args.pipeline:
        variant += "_pipelined"
    result = {
        "metric": f"swaps_per_sec_per_chip_{s}px_ddim{cfg.ddim_steps}{variant}",
        "value": round(swaps_per_sec, 4),
        "unit": "swaps/s",
        "vs_baseline": round(swaps_per_sec / 10.0, 4),
    }
    print(json.dumps(result))
    print(
        f"# batch={batch} best={best:.3f}s times={[round(t,3) for t in times]} "
        f"backend={jax.default_backend()} devices={len(jax.devices())}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
