"""Demo HTTP server: real multipart image upload round-trip.

Parity target: the reference's Flask GUI accepts uploaded images and
returns the swap (/root/reference/scripts/one_inference.py:443-518). This
drives the actual HTTP surface — a genuine multipart/form-data POST with
PNG bytes — against the tiny pre-cropped pipeline on CPU.
"""

import io
import threading
import urllib.request

import numpy as np


def _png(arr_u8):
    import cv2

    ok, buf = cv2.imencode(".png", cv2.cvtColor(arr_u8, cv2.COLOR_RGB2BGR))
    assert ok
    return buf.tobytes()


def _multipart(fields: dict[str, bytes]) -> tuple[bytes, str]:
    boundary = "testboundary7391"
    out = io.BytesIO()
    for name, data in fields.items():
        out.write(f"--{boundary}\r\n".encode())
        out.write(
            f'Content-Disposition: form-data; name="{name}"; '
            f'filename="{name}.png"\r\n'
            "Content-Type: image/png\r\n\r\n".encode()
        )
        out.write(data)
        out.write(b"\r\n")
    out.write(f"--{boundary}--\r\n".encode())
    return out.getvalue(), f"multipart/form-data; boundary={boundary}"


def test_demo_server_multipart_upload_roundtrip():
    from reface_tpu.cli.demo_server import make_server

    server = make_server(["--backend", "cpu", "--tiny", "--precropped",
                          "--port", "0"])
    port = server.server_address[1]
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    try:
        rng = np.random.default_rng(0)
        src = rng.integers(0, 255, (72, 72, 3), dtype=np.uint8)
        tgt = rng.integers(0, 255, (80, 80, 3), dtype=np.uint8)
        body, ctype = _multipart({"source": _png(src), "target": _png(tgt)})
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/process_images", data=body,
            headers={"Content-Type": ctype}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=300) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"] == "image/png"
            png = resp.read()
        import cv2

        out = cv2.imdecode(np.frombuffer(png, np.uint8), cv2.IMREAD_COLOR)
        assert out is not None
        size = 64  # tiny config image_size
        assert out.shape == (size, size, 3)

        # the GET landing page serves the upload form
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=60
        ) as resp:
            page = resp.read().decode()
        assert "multipart/form-data" in page and "process_images" in page

        # a malformed POST surfaces a JSON error, not a hung socket
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/process_images", data=b"notmultipart",
            headers={"Content-Type": "text/plain"}, method="POST",
        )
        try:
            urllib.request.urlopen(req, timeout=60)
            raise AssertionError("expected HTTP 500")
        except urllib.error.HTTPError as e:
            assert e.code == 500
    finally:
        server.shutdown()
        server.server_close()


def test_demo_server_fused_raw_mode():
    """--fused serves the raw path through ONE compiled XLA program with
    uploads bucketed to --fused-frame; the response comes back at the
    ORIGINAL upload resolution (the bucket resize is internal)."""
    from reface_tpu.cli.demo_server import make_server

    server = make_server(["--backend", "cpu", "--tiny", "--fused",
                          "--fused-frame", "96", "--port", "0"])
    port = server.server_address[1]
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    try:
        rng = np.random.default_rng(1)
        src = rng.integers(0, 255, (72, 72, 3), dtype=np.uint8)
        tgt = rng.integers(0, 255, (80, 88, 3), dtype=np.uint8)
        body, ctype = _multipart({"source": _png(src), "target": _png(tgt)})
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/process_images", data=body,
            headers={"Content-Type": ctype}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=600) as resp:
            assert resp.status == 200
            png = resp.read()
        import cv2

        out = cv2.imdecode(np.frombuffer(png, np.uint8), cv2.IMREAD_COLOR)
        assert out is not None
        assert out.shape == tgt.shape  # original resolution restored
    finally:
        server.shutdown()
        server.server_close()


def test_letterbox_frame_geometry():
    """Aspect-preserving: a 2:1 frame lands centered in the bucket at the
    same aspect ratio (no anisotropic squash — ADVICE round-4), and the
    returned box crops back to exactly the resized content."""
    import numpy as np

    from reface_tpu.cli.demo_server import letterbox_frame

    img = np.ones((50, 100, 3), np.float32)
    pad, (y0, x0, nh, nw) = letterbox_frame(img, 64)
    assert pad.shape == (64, 64, 3)
    assert (nh, nw) == (32, 64)  # 2:1 aspect preserved
    assert (y0, x0) == (16, 0)  # vertically centered
    content = pad[y0:y0 + nh, x0:x0 + nw]
    assert float(content.min()) == 1.0  # all content, no pad inside the box
    assert float(pad.sum()) == float(content.sum())  # pad is zeros outside
    # tall frame: mirrored geometry
    pad2, (y0b, x0b, nh2, nw2) = letterbox_frame(
        np.ones((100, 50, 3), np.float32), 64)
    assert (nh2, nw2) == (64, 32) and (y0b, x0b) == (0, 16)
