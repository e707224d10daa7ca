"""Web demo: upload source+target, get the swap back.

Functional parity target: /root/reference/scripts/one_inference.py:443-518 +
templates/index.html (Flask GUI). Flask is not in this image, so this is a
stdlib http.server implementation with the same POST /process_images flow.

Usage:
  python -m reface_tpu.cli.demo_server --port 7860 [--tiny --precropped]
"""

from __future__ import annotations

import argparse
import io
import json
import threading

from reface_tpu.cli.common import add_model_args, apply_backend, build_swapper

_PAGE = """<!doctype html>
<html><head><title>reface-tpu demo</title></head>
<body style="font-family:sans-serif;max-width:640px;margin:2em auto">
<h2>reface-tpu face swap</h2>
<form method="post" action="/process_images" enctype="multipart/form-data">
  <p>Source face: <input type="file" name="source"></p>
  <p>Target image: <input type="file" name="target"></p>
  <p>Inpaint mask (optional, white=keep): <input type="file" name="mask"></p>
  <p><button type="submit">Swap</button></p>
</form>
</body></html>"""


def _decode_multipart(body: bytes, boundary: bytes) -> dict[str, bytes]:
    parts = body.split(b"--" + boundary)
    out = {}
    for part in parts:
        if b"Content-Disposition" not in part:
            continue
        head, _, data = part.partition(b"\r\n\r\n")
        data = data.rsplit(b"\r\n", 1)[0]
        for token in head.split(b";"):
            token = token.strip()
            if token.startswith(b'name="'):
                out[token[6:-1].decode()] = data
    return out


def letterbox_frame(img, f: int):
    """Aspect-preserving resize + center pad into an (f, f, 3) bucket.

    Returns (padded, (y0, x0, nh, nw)) — the crop box undoes the pad.
    Used by --fused so every upload hits ONE compiled shape WITHOUT the
    anisotropic squashing that would distort face geometry for non-square
    frames (ADVICE round-4 finding)."""
    import cv2
    import numpy as np

    ih, iw = img.shape[:2]
    s = f / max(ih, iw)
    nh, nw = (max(1, int(round(ih * s))), max(1, int(round(iw * s))))
    r = cv2.resize(img, (nw, nh))
    pad = np.zeros((f, f, 3), np.float32)
    y0, x0 = (f - nh) // 2, (f - nw) // 2
    pad[y0:y0 + nh, x0:x0 + nw] = r
    return pad, (y0, x0, nh, nw)


def make_server(argv=None):
    """Build the configured ThreadingHTTPServer (not yet serving).

    Split from main() so tests can drive the real HTTP surface — bind to
    port 0, POST a genuine multipart upload, read the PNG response — without
    blocking on serve_forever."""
    ap = argparse.ArgumentParser(description=__doc__)
    add_model_args(ap)
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--precropped", action="store_true")
    ap.add_argument("--fused", action="store_true",
                    help="latency mode: serve each request through ONE XLA "
                         "program (RawSwapPipeline.swap_images_fused) with "
                         "uploads resized to --fused-frame so every request "
                         "hits the same compiled shape")
    ap.add_argument("--fused-frame", type=int, default=1024,
                    help="frame bucket (square) for --fused uploads")
    ap.add_argument("--safety-ckpt", default=None,
                    help="StableDiffusionSafetyChecker state dict: flag/blur "
                         "NSFW outputs before returning them")
    ap.add_argument("--landmark-ckpt", default=None,
                    help="LandmarkNet params (batched on-device landmarks)")
    ap.add_argument("--landmark-rert", default=None,
                    help="native .rert ERT model: EXACT dlib-parity "
                         "landmarks on the host (eager mode; incompatible "
                         "with --fused)")
    ap.add_argument("--bisenet-ckpt", default=None,
                    help="face-parser weights for the raw mode")
    args = ap.parse_args(argv)
    apply_backend(args)

    import cv2
    import numpy as np
    import jax
    import jax.numpy as jnp

    from reface_tpu.cli.common import (
        build_raw_pipeline,
        build_safety_checker,
        decode_keep_mask,
        default_inpaint_mask,
    )
    from reface_tpu.pipelines.raw import RawPipelineConfig, tiny_raw_config
    from reface_tpu.pipelines.swap import clip_normalize

    swapper = build_swapper(args)
    raw_cfg = tiny_raw_config() if args.tiny else RawPipelineConfig()
    pipe = None if args.precropped else build_raw_pipeline(args, swapper,
                                                           raw_cfg)
    safety = build_safety_checker(args.safety_ckpt)
    lock = threading.Lock()
    state = {"key": jax.random.key(args.seed)}

    def run_swap(source_png: bytes, target_png: bytes,
                 mask_png: bytes | None = None) -> bytes:
        def dec(b):
            arr = cv2.imdecode(np.frombuffer(b, np.uint8), cv2.IMREAD_COLOR)
            return cv2.cvtColor(arr, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0

        src, tgt = dec(source_png), dec(target_png)
        with lock:
            state["key"], sub = jax.random.split(state["key"])
            if pipe is not None:
                # raw mode derives the mask from the parser; an uploaded
                # mask applies only in --precropped mode
                if args.fused:
                    # bucket uploads to one square frame so every request
                    # reuses the single compiled program (one dispatch).
                    # Letterbox (aspect-preserving resize + pad), NOT a
                    # plain square resize: anisotropic squashing distorts
                    # face geometry for every non-square upload, degrading
                    # landmarks/align/paste-back in the latency mode.
                    f = args.fused_frame
                    h, w = tgt.shape[:2]
                    tgt_in, (y0, x0, nh, nw) = letterbox_frame(tgt, f)
                    src_in, _ = letterbox_frame(src, f)
                    out01 = np.asarray(
                        pipe.swap_images_fused(jnp.asarray(tgt_in)[None],
                                               jnp.asarray(src_in)[None],
                                               key=sub)[0]
                    )
                    out01 = cv2.resize(out01[y0:y0 + nh, x0:x0 + nw], (w, h))
                else:
                    out01 = np.asarray(
                        pipe.swap_images(jnp.asarray(tgt)[None],
                                         jnp.asarray(src)[None], key=sub)[0]
                    )
            else:
                # pre-cropped legacy mode (inference.py semantics): the user
                # supplies aligned crops and optionally an explicit keep-mask;
                # without one, inpaint a central face-shaped ellipse.
                size = swapper.config.image_size
                tgt_r = cv2.resize(tgt, (size, size))
                src_r = cv2.resize(src, (size, size))
                if mask_png:
                    keep = decode_keep_mask(mask_png, size)
                else:
                    keep = default_inpaint_mask(size)
                t = jnp.asarray(tgt_r)[None] * 2 - 1
                mask = jnp.asarray(keep)[None]
                ref = clip_normalize(jnp.asarray(src_r)[None])
                out = swapper.swap(target_image=t, inpaint_image=t * mask,
                                   inpaint_mask=mask, ref_clip224=ref, key=sub)
                out01 = (np.asarray(out[0]) + 1) / 2
            if safety is not None:
                filtered, flags = safety(jnp.asarray(out01)[None])
                out01 = np.asarray(filtered[0])
                if bool(np.asarray(flags)[0]):
                    print("[demo] safety checker flagged the output")
        u8 = np.clip(out01 * 255, 0, 255).astype(np.uint8)
        ok, buf = cv2.imencode(".png", cv2.cvtColor(u8, cv2.COLOR_RGB2BGR))
        return buf.tobytes()

    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(_PAGE.encode())

        def do_POST(self):
            if self.path != "/process_images":
                self.send_error(404)
                return
            ctype = self.headers.get("Content-Type", "")
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            try:
                boundary = ctype.split("boundary=")[1].encode()
                fields = _decode_multipart(body, boundary)
                png = run_swap(fields["source"], fields["target"],
                               fields.get("mask") or None)
            except Exception as e:  # surface errors to the client
                self.send_response(500)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps({"error": str(e)}).encode())
                return
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.end_headers()
            self.wfile.write(png)

        def log_message(self, *a):
            pass

    return ThreadingHTTPServer(("0.0.0.0", args.port), Handler)


def main(argv=None):
    server = make_server(argv)
    print(f"[demo] listening on :{server.server_address[1]}")
    server.serve_forever()


if __name__ == "__main__":
    main()
