"""Regenerate the /tmp assets the round-5 chip queues consume.

The container restart wiped /tmp (and the .jax_cache), losing the inputs
queues 3-8 were written against. Everything here is synthetic (the
environment ships no real data): the CelebA-style trees come from
reface_tpu.data.synthetic and the 720p clip is a rendered moving face
using the same landmark-template renderer the landmark campaign trains
against (data/synthetic.py::make_landmark_faces rendering).

Usage: python tools/r5_assets.py [--skip-existing]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def make_clip(path: str, frames: int = 110, w: int = 1280, h: int = 720,
              fps: float = 25.0, seed: int = 3) -> None:
    import cv2

    from reface_tpu.data.synthetic import make_landmark_faces

    rng = np.random.default_rng(seed)
    # render one face identity at 512 and composite it into the 720p frame
    # on a slow sinusoidal path (translation + slight scale wobble) so
    # detection/align sees realistic inter-frame motion
    face_sz = 480
    face, _ = make_landmark_faces(1, size=face_sz, seed=seed,
                                  max_rot_deg=0.0, scale_range=(0.95, 0.95),
                                  shift_frac=0.0)
    face = face[0]
    bg = rng.integers(30, 120, (h, w, 3), np.uint8)
    bg = cv2.GaussianBlur(bg, (0, 0), 9)
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    assert writer.isOpened(), path
    for i in range(frames):
        t = i / max(frames - 1, 1)
        cx = int(w * (0.35 + 0.30 * np.sin(2 * np.pi * t)))
        cy = int(h * (0.50 + 0.10 * np.cos(2 * np.pi * t * 0.7)))
        s = 1.0 + 0.08 * np.sin(2 * np.pi * t * 1.3)
        fs = int(face_sz * s)
        f = cv2.resize(face, (fs, fs), interpolation=cv2.INTER_LINEAR)
        frame = bg.copy()
        x0, y0 = cx - fs // 2, cy - fs // 2
        x1, y1 = x0 + fs, y0 + fs
        fx0, fy0 = max(0, -x0), max(0, -y0)
        x0, y0 = max(0, x0), max(0, y0)
        x1, y1 = min(w, x1), min(h, y1)
        frame[y0:y1, x0:x1] = f[fy0:fy0 + (y1 - y0), fx0:fx0 + (x1 - x0)]
        writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    writer.release()
    print(f"[assets] wrote {path} ({frames} frames {w}x{h} @ {fps})")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--skip-existing", action="store_true")
    args = ap.parse_args()

    from reface_tpu.data.synthetic import make_synthetic_celeba

    jobs = [
        # train runs (queue6 EMA): 32 images at 512px, ids 0..31
        ("/tmp/celeba512", lambda: make_synthetic_celeba(
            "/tmp/celeba512", 0, 32, size=512, seed=0)),
        # test-bench pairs + the video source image (r4_queue14 layout)
        ("/tmp/celeba_bench", lambda: (
            make_synthetic_celeba("/tmp/celeba_bench", 28000, 8,
                                  size=512, seed=10),
            make_synthetic_celeba("/tmp/celeba_bench", 29000, 8,
                                  size=512, seed=11))),
        ("/tmp/clip720.mp4", lambda: make_clip("/tmp/clip720.mp4")),
    ]
    for path, fn in jobs:
        if args.skip_existing and os.path.exists(path):
            print(f"[assets] {path} exists, skipping")
            continue
        fn()
    print("[assets] done")


if __name__ == "__main__":
    main()
