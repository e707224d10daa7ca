"""End-to-end single-swap latency: raw frame in -> composited frame out.

The BASELINE north star names two serving numbers: throughput
(swaps/sec/chip at 512px DDIM-50 — bench.py) and **p50 end-to-end
single-swap latency**. This measures the second on the full raw path
(`pipelines/raw.py::RawSwapPipeline.swap_images`): landmark detection,
1024^2 alignment, BiSeNet parsing, masked CLIP reference build, the DDIM
swap on the crop, and inverse-perspective paste-back — the reference's
one_inference.py protocol (scripts/one_inference.py:521-808; DDIM 50,
scale 3.5, batch 1, Demo.sh).

Measurement rules per CLAUDE.md: every iteration ends in a scalar host
readback (the axon tunnel's block_until_ready is unreliable); the first
measurements in a process read slow (power ramp), so p50 over >=7 iters
is the protocol number and the times list is printed for inspection.

Usage:
  python tools/bench_raw.py                  # real chip, full protocol
  python tools/bench_raw.py --tiny           # CPU smoke
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
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
    ap.add_argument("--tiny", action="store_true", help="CPU smoke config")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--frame", type=int, default=1024, help="raw frame H=W")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--cfg-scale", type=float, default=3.5,
                    help="one_inference.py single-swap protocol scale")
    ap.add_argument("--iters", type=int, default=7)
    ap.add_argument("--fused", action="store_true",
                    help="compile the WHOLE raw path as one XLA program "
                         "(RawSwapPipeline.swap_images_fused) instead of "
                         "eager stage dispatch")
    ap.add_argument("--stages", action="store_true",
                    help="also print a per-stage latency breakdown "
                         "(eager path, readback-synced per stage)")
    ap.add_argument("--quant", default="none",
                    choices=["none", "int8", "int8conv"],
                    help="serving quant mode for the swap core (same knob "
                         "as bench.py; the pre/post towers stay bf16)")
    ap.add_argument("--landmark-rert", default=None,
                    help="native .rert ERT model: measure the EXACT "
                         "dlib-parity landmark path (host C++ cascade) "
                         "instead of the on-device LandmarkNet; eager "
                         "path only (incompatible with --fused)")
    args = ap.parse_args()
    if args.landmark_rert and args.fused:
        raise SystemExit("--landmark-rert is host-side; --fused compiles "
                         "one XLA program and keeps the on-device CNN")

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    from reface_tpu.pipelines.swap import FaceSwapper, SwapConfig, tiny_swap_config
    from reface_tpu.pipelines.raw import (
        RawPipelineConfig,
        RawSwapPipeline,
        tiny_raw_config,
    )

    if args.tiny:
        swap_cfg = tiny_swap_config(image_size=64, ddim_steps=2)
        swap_cfg = dataclasses.replace(swap_cfg, cfg_scale=args.cfg_scale)
        if args.quant != "none":
            swap_cfg = dataclasses.replace(
                swap_cfg,
                unet=dataclasses.replace(swap_cfg.unet, quant=args.quant),
                vae=dataclasses.replace(swap_cfg.vae, quant=args.quant),
            )
        raw_cfg = tiny_raw_config()
        frame = 96
    else:
        from reface_tpu.nn.unet import UNetConfig
        from reface_tpu.nn.vae import VAEConfig

        swap_cfg = SwapConfig(
            ddim_steps=args.steps, cfg_scale=args.cfg_scale,
            unet=UNetConfig(quant=args.quant),
            vae=VAEConfig(quant=args.quant),
        )
        raw_cfg = RawPipelineConfig()
        frame = args.frame

    key = jax.random.key(0)
    sw = FaceSwapper(swap_cfg, FaceSwapper.init_params(swap_cfg, key))
    if not args.tiny:
        sw = FaceSwapper(
            swap_cfg,
            jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, sw.params,
            ),
        )
    lm_fn = None
    if args.landmark_rert:
        from reface_tpu.nn.landmarks import landmark68_fn_from_rert

        lm_fn = landmark68_fn_from_rert(args.landmark_rert)
    pipe = RawSwapPipeline(sw, raw_cfg, landmark_fn=lm_fn)
    # what actually produces the landmarks in THIS measurement — recorded
    # in the JSON so the log can never misattribute the landmark source
    landmark_source = (
        "native_ert_host" if args.landmark_rert else "landmark_net_on_device"
    )

    b = args.batch
    tgt = jax.random.uniform(jax.random.key(1), (b, frame, frame, 3))
    src = jax.random.uniform(jax.random.key(2), (b, frame, frame, 3))

    swap_fn = pipe.swap_images_fused if args.fused else pipe.swap_images

    # compile + warm
    out = swap_fn(tgt, src, key=jax.random.key(3))
    _ = float(jnp.mean(out))

    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        out = swap_fn(tgt, src, key=jax.random.key(4 + i))
        _ = float(jnp.mean(out))  # forces completion over the tunnel
        times.append(time.perf_counter() - t0)
    p50 = statistics.median(times)
    variant = "_tiny" if args.tiny else ""
    if args.fused:
        variant += "_fused"
    if args.quant != "none":
        variant += f"_{args.quant}"

    if args.stages:
        # per-stage attribution of the EAGER path (each stage ends in a
        # scalar readback, so stage sums exceed the pipelined total)
        from reface_tpu.preprocess.align import paste_back

        def timed(name, fn):
            t0 = time.perf_counter()
            r = fn()
            jax.tree.map(
                lambda x: float(jnp.ravel(x)[0])
                if hasattr(x, "dtype") else x, r)
            print(f"# stage {name}: {time.perf_counter() - t0:.3f}s")
            return r

        for rep in range(2):  # rep 0 warms any per-stage compiles
            print(f"# --- stage breakdown rep {rep} ---")
            t_lm = timed("detect_landmarks(target)",
                         lambda: pipe.detect_landmarks(tgt))
            t_crop, t_quads = timed("align(target)",
                                    lambda: pipe.align(tgt, t_lm))
            ref224 = timed("source_reference",
                           lambda: pipe._source_reference(src))
            out_big = timed("swap_aligned(parse+mask+ddim)",
                            lambda: pipe._swap_aligned(
                                t_crop, ref224, jax.random.key(9)))
            timed("paste_back", lambda: jax.vmap(paste_back)(
                tgt, out_big, t_quads))
    print(json.dumps({
        "metric": f"single_swap_p50_latency{variant}",
        "value": round(p50, 4),
        "unit": "s",
        "best": round(min(times), 4),
        "frame": frame, "batch": b, "ddim_steps": swap_cfg.ddim_steps,
        "cfg_scale": args.cfg_scale, "landmarks": landmark_source,
    }))
    print("# times:", [round(t, 3) for t in times])


if __name__ == "__main__":
    main()
