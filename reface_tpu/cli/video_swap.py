"""Video face-swap driver: frame-batched, host-pipelined.

Functional parity target: /root/reference/scripts/inference_swap_video.py +
inference_video_swap.sh — cv2 frame decode, per-frame align/parse with
last-good-frame fallback, single source reference, DDIM-30 scale 3 over
frame batches of 10, paste-back per frame, re-encode (audio muxed back via
ffmpeg when available; moviepy is not in this image).

TPU-native: frames are aligned/parsed/swapped in device batches; the
reader/writer run on the host thread so the chip never idles on IO.

Usage:
  python -m reface_tpu.cli.video_swap --video in.mp4 --source face.png \
      --outdir out [--tiny --frames 8]
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess

import numpy as np

from reface_tpu.cli.common import add_model_args, apply_backend, build_swapper


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    add_model_args(ap)
    ap.add_argument("--video", required=True)
    ap.add_argument("--source", required=True)
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--frame-batch", type=int, default=10)
    ap.add_argument("--frames", type=int, default=0, help="0 = all")
    ap.add_argument("--landmark-ckpt", default=None,
                    help="LandmarkNet params (batched on-device landmarks)")
    ap.add_argument("--landmark-rert", default=None,
                    help="native .rert ERT model: EXACT dlib-parity "
                         "landmarks on the host for align + conditioning")
    ap.add_argument("--bisenet-ckpt", default=None)
    ap.add_argument("--bench-json", action="store_true",
                    help="print a steady-state frames/s JSON line "
                         "(first batch excluded)")
    ap.add_argument("--eager-video", action="store_true",
                    help="stage-by-stage eager batch path instead of the "
                         "one-XLA-program video step (exact-parity ERT "
                         "conditioning when --landmark-rert is set, at "
                         "~20 tunnel round trips per batch)")
    ap.add_argument("--bench-ram", action="store_true",
                    help="host-stage bypass bench: pre-decode ALL frames "
                         "into RAM before the clock starts and skip the "
                         "writer/x264 entirely, isolating the pipeline "
                         "code's chip-side ceiling from this container's "
                         "decode/encode CPU cost (implies --bench-json; "
                         "writes no output video)")
    args = ap.parse_args(argv)
    apply_backend(args)
    if args.bench_ram:
        args.bench_json = True
    if args.ddim_steps is None and not args.config and not args.overrides:
        # video protocol default (inference_video_swap.sh); a config file
        # keeps precedence over this implicit default
        args.ddim_steps = 30

    import cv2
    import jax
    import jax.numpy as jnp

    from reface_tpu.cli.common import build_raw_pipeline
    from reface_tpu.pipelines.raw import RawPipelineConfig, tiny_raw_config

    swapper = build_swapper(args)
    raw_cfg = tiny_raw_config() if args.tiny else RawPipelineConfig()
    pipe = build_raw_pipeline(args, swapper, raw_cfg)

    cap = cv2.VideoCapture(args.video)
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    os.makedirs(args.outdir, exist_ok=True)
    tmp_path = os.path.join(args.outdir, "_noaudio.mp4")
    writer = None
    if not args.bench_ram:
        writer = cv2.VideoWriter(
            tmp_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
        )

    ram_frames = None
    if args.bench_ram:
        # decode everything up front (uint8 in RAM) so the timed loop pays
        # zero decode cost; bounded by --frames to keep memory sane
        ram_frames = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            ram_frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            if args.frames and len(ram_frames) >= args.frames:
                break
        print(f"[video] pre-decoded {len(ram_frames)} frames into RAM")

    src = cv2.cvtColor(cv2.imread(args.source), cv2.COLOR_BGR2RGB)
    src01 = jnp.asarray(src.astype(np.float32) / 255.0)[None]
    src_b = jnp.repeat(src01, args.frame_batch, axis=0)
    # the source is constant for the whole video: encode its CLIP
    # reference ONCE instead of re-running the towers every batch
    ref224 = pipe._source_reference(src_b)

    key = jax.random.key(args.seed)
    count = 0

    import queue
    import threading

    frame_q: "queue.Queue" = queue.Queue(maxsize=4)

    def reader():
        n = 0
        batch = []
        while True:
            if ram_frames is not None:
                frame = ram_frames[n] if n < len(ram_frames) else None
                if frame is None:
                    break
            else:
                ok, f = cap.read()
                if not ok:
                    break
                frame = cv2.cvtColor(f, cv2.COLOR_BGR2RGB)
            batch.append(frame)
            n += 1
            if len(batch) == args.frame_batch:
                frame_q.put(batch)
                batch = []
            if args.frames and n >= args.frames:
                break
        if batch:
            frame_q.put(batch)
        frame_q.put(None)

    threading.Thread(target=reader, daemon=True).start()

    # last-good-frame fallback state + per-frame inverse transforms
    # (inference_swap_video.py:468-500 parity)
    fallback_state = [None]
    inv_transforms: list = []

    def flush(batch_frames):
        nonlocal key
        if not batch_frames:
            return
        n = len(batch_frames)
        arr = np.stack(batch_frames).astype(np.float32) / 255.0
        if n < args.frame_batch:  # pad to the compiled batch shape
            arr = np.concatenate(
                [arr, np.repeat(arr[-1:], args.frame_batch - n, axis=0)]
            )
        key, sub = jax.random.split(key)
        out, fallback_state[0], quads = pipe.swap_images_robust(
            jnp.asarray(arr), src_b,
            key=sub, state=fallback_state[0],
            one_program=not args.eager_video, ref224=ref224,
        )
        inv_transforms.extend(np.asarray(quads)[:n])
        out = np.asarray(out)[:n]  # full host readback either way
        if writer is not None:
            for f in out:
                u8 = np.clip(f * 255.0, 0, 255).astype(np.uint8)
                writer.write(cv2.cvtColor(u8, cv2.COLOR_RGB2BGR))

    # the reader thread decodes/queues while the device swaps (host/device
    # pipelining — SURVEY.md hard-part #4)
    import time

    bench = {"t0": None, "frames": 0}
    while True:
        batch = frame_q.get()
        if batch is None:
            break
        count += len(batch)
        flush(batch)
        # steady-state throughput clock: starts AFTER the first batch
        # (compile + power ramp) completes; flush() fully materializes the
        # outputs so this point is readback-synced (CLAUDE.md timing rules)
        if bench["t0"] is None:
            bench["t0"] = time.perf_counter()
        else:
            bench["frames"] += len(batch)
        print(f"[video] {count} frames")
    if args.bench_json:
        import json

        # swapper.config is the RESOLVED step count (args.ddim_steps is
        # None when the protocol comes from --config/--overrides)
        metric = (f"video_frames_per_sec_ddim{swapper.config.ddim_steps}"
                  f"_batch{args.frame_batch}")
        if args.bench_ram:
            metric += "_ram"
        # encode the measured code path so ladder rows built from this
        # JSON line cannot misattribute eager/ERT variants to the
        # one-program CNN path (the round-4 landmark-attribution lesson)
        if args.eager_video:
            metric += "_eager"
        if getattr(args, "landmark_rert", None):
            metric += "_ert"
        elif getattr(args, "landmark_ckpt", None):
            metric += "_cnnckpt"
        if bench["frames"]:
            fs = bench["frames"] / (time.perf_counter() - bench["t0"])
            print(json.dumps({
                "metric": metric,
                "value": round(fs, 4), "unit": "frames/s",
                "note": (
                    "host-stage bypass: pre-decoded RAM frames in, no "
                    "writer/x264 — align+parse+swap+paste-back+readback "
                    "only, first batch (compile/ramp) excluded"
                    if args.bench_ram else
                    "end-to-end decode+align+parse+swap+paste-back+encode, "
                    "first batch (compile/ramp) excluded"
                ),
            }))
        else:
            # the first batch is always excluded as compile/ramp, so a
            # single-batch video measures nothing — say so instead of
            # silently printing no JSON line
            print(json.dumps({
                "metric": metric, "value": None, "unit": "frames/s",
                "note": "steady-state needs >1 frame batch (the first is "
                        "excluded as compile/ramp); give more frames or a "
                        "smaller --frame-batch",
            }))
    cap.release()
    # persist per-frame paste-back transforms (inv_transforms.npy parity)
    np.save(os.path.join(args.outdir, "inv_transforms.npy"),
            np.asarray(inv_transforms))
    if writer is None:  # --bench-ram writes no video
        print(f"[video] bench-ram done ({count} frames, no output video)")
        return
    writer.release()

    out_path = os.path.join(args.outdir, "swapped.mp4")
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg:  # mux the original audio back (libx264/aac parity)
        try:
            subprocess.run(
                [ffmpeg, "-y", "-i", tmp_path, "-i", args.video, "-map",
                 "0:v", "-map", "1:a?", "-c:v", "libx264", "-c:a", "aac",
                 out_path],
                check=True, capture_output=True,
            )
            os.remove(tmp_path)
        except subprocess.CalledProcessError:
            os.replace(tmp_path, out_path)
    else:
        os.replace(tmp_path, out_path)
    print(f"[video] wrote {out_path} ({count} frames @ {fps:.1f} fps)")


if __name__ == "__main__":
    main()
