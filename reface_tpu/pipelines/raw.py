"""Raw-image swap pipeline: detect/align -> parse -> swap -> paste back.

Functional parity target: /root/reference/scripts/one_inference.py:521-808 —
dlib-align target & source to 1024^2, BiSeNet seg12 masks, masked CLIP
reference build, DDIM swap on the crop, inverse-perspective paste-back onto
the original frame. Landmark conditioning is computed on the cropped
512px target (one_inference.py:621,717-726 -> ddpm.py:1068-1099), NOT on
the original frame — the conditioning vector is in crop coordinates.

Multi-face: the reference's crop_faces iterates every dlib detection in the
frame and composites the swaps sequentially (src/utils/alignmengt.py:181-264,
one_inference.py:782-799). Here detection splits the parsing-mask face
region into connected components (host-side, like the reference's CPU dlib
loop), then all faces swap as ONE device batch and composite sequentially.

TPU-native: landmarks come from the batched LandmarkNet, parsing from the
flax BiSeNet, alignment/paste-back are the on-device warps in
reface_tpu.preprocess.align; the whole post-detection path is jittable.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from reface_tpu.nn.bisenet import BiSeNet, BiSeNetConfig, parse_faces
from reface_tpu.nn.landmarks import LandmarkNet, LandmarkNetConfig
from reface_tpu.pipelines.swap import FaceSwapper, clip_normalize
from reface_tpu.preprocess.align import compute_align_quad, paste_back, quad_crop
from reface_tpu.preprocess.masks import FACE_PARSING_TO_SEG12

__all__ = ["RawPipelineConfig", "RawSwapPipeline", "tiny_raw_config"]

# seg12 classes treated as "face" for target removal / source preservation
# (project.yaml:205-224 semantics: lip, eyebrows, eyes, nose, skin, ears, mouth)
DEFAULT_SEG12_FACE = (1, 2, 3, 5, 6, 7, 9)


@dataclasses.dataclass(frozen=True)
class RawPipelineConfig:
    align_size: int = 1024
    parse_size: int = 512
    seg12_face_classes: tuple = DEFAULT_SEG12_FACE
    landmark: LandmarkNetConfig = LandmarkNetConfig()
    bisenet: BiSeNetConfig = BiSeNetConfig()


def tiny_raw_config(
    seg12_face_classes: tuple = DEFAULT_SEG12_FACE,
) -> RawPipelineConfig:
    """Smoke-size raw config paired with ``tiny_swap_config`` (64px
    everything, fp32 on CPU) — what every driver's ``--tiny`` raw mode
    uses so CLI smokes compile in seconds instead of tracing the 1024px
    align / 512px parse towers at random init."""
    return RawPipelineConfig(
        align_size=64,
        parse_size=64,
        seg12_face_classes=seg12_face_classes,
        landmark=LandmarkNetConfig(widths=(8, 16, 32, 32), input_size=64,
                                   dtype=jnp.float32),
        bisenet=BiSeNetConfig(dtype=jnp.float32),
    )


class RawSwapPipeline:
    """Wraps a FaceSwapper with detection/alignment/parsing/paste-back."""

    def __init__(
        self,
        swapper: FaceSwapper,
        config: RawPipelineConfig = RawPipelineConfig(),
        landmark_params=None,
        bisenet_params=None,
        seed: int = 0,
        landmark_fn=None,
    ):
        """landmark_fn: optional HOST landmark source overriding the
        on-device LandmarkNet — (B,H,W,3) [0,1] images -> (B,68,2) pixel
        coords at input scale (np). Pass
        nn.landmarks.landmark68_fn_from_rert(path) for exact dlib-ERT
        parity on the eager path (every driver's --landmark-rert). The
        fused one-XLA-program path cannot call out to the host, so it
        keeps the LandmarkNet (swap_images_fused docstring)."""
        self.swapper = swapper
        self.config = config
        self.landmark_fn = landmark_fn
        self.landmark_net = LandmarkNet(config.landmark)
        self.bisenet = BiSeNet(config.bisenet)
        key = jax.random.key(seed)
        s = config.landmark.input_size
        self.landmark_params = landmark_params or self.landmark_net.init(
            key, jnp.zeros((1, s, s, 3))
        )
        self.bisenet_params = bisenet_params or self.bisenet.init(
            key, jnp.zeros((1, config.parse_size, config.parse_size, 3))
        )

    # ---- stages ----

    def detect_landmarks(self, image01: jnp.ndarray) -> jnp.ndarray:
        """(B,H,W,3) in [0,1] -> (B,68,2) pixel coords at input scale.

        Source: the host landmark_fn when configured (exact ERT parity)
        and not under a jit trace; otherwise the batched on-device
        LandmarkNet. Under tracing (swap_images_fused) the host fn cannot
        run, so the fused program always uses the CNN."""
        if self.landmark_fn is not None and not isinstance(
            image01, jax.core.Tracer
        ):
            return jnp.asarray(
                np.asarray(self.landmark_fn(image01), np.float32)
            )
        s = self.config.landmark.input_size
        b, h, w, _ = image01.shape
        x = jax.image.resize(image01, (b, s, s, 3), "bilinear") * 2 - 1
        lm = self.landmark_net.apply(self.landmark_params, x)
        sx = w / s
        sy = h / s
        return lm.reshape(b, 68, 2) * jnp.array([sx, sy])

    def align(self, image01: jnp.ndarray, lm68: jnp.ndarray):
        """Crop each image to align_size^2 via the FFHQ quad; returns
        (crops01, quads)."""
        quads = jax.vmap(compute_align_quad)(lm68)
        crops = jax.vmap(lambda im, q: quad_crop(im, q, self.config.align_size))(
            image01, quads
        )
        return crops, quads

    def parse(self, crops01: jnp.ndarray) -> jnp.ndarray:
        """(B,S,S,3) [0,1] -> (B,S,S) seg12 class map."""
        b = crops01.shape[0]
        p = self.config.parse_size
        small = jax.image.resize(crops01, (b, p, p, 3), "bilinear")
        seg = parse_faces(self.bisenet, self.bisenet_params, small,
                          remap_lut=FACE_PARSING_TO_SEG12)
        full = jax.image.resize(
            seg[..., None].astype(jnp.float32),
            (b, crops01.shape[1], crops01.shape[2], 1), "nearest",
        )
        return full[..., 0].astype(jnp.int32)

    def face_mask(self, seg12: jnp.ndarray) -> jnp.ndarray:
        lut = np.zeros(12, np.float32)
        for c in self.config.seg12_face_classes:
            lut[c] = 1.0
        return jnp.take(jnp.asarray(lut), seg12)[..., None]

    def detect_faces(self, frame01: np.ndarray, max_faces: int = 4,
                     min_area_frac: float = 2e-3):
        """Host-side multi-face detection on ONE frame.

        Role of dlib's HOG detector loop (alignmengt.py:181-264): parse the
        full frame, split the face-class mask into connected components,
        return up to max_faces [x0,y0,x1,y1] boxes, largest first.
        """
        import cv2

        frame = np.asarray(frame01)
        h, w = frame.shape[:2]
        seg = self.parse(jnp.asarray(frame, jnp.float32)[None])
        face = np.asarray(self.face_mask(seg)[0, ..., 0] > 0.5, np.uint8)
        num, _, stats, _ = cv2.connectedComponentsWithStats(face, 8)
        boxes = []
        for i in range(1, num):
            x, y, bw, bh, area = (int(v) for v in stats[i])
            if area >= min_area_frac * h * w:
                boxes.append((area, (x, y, x + bw, y + bh)))
        boxes.sort(key=lambda t: -t[0])
        return [b for _, b in boxes[:max_faces]]

    def landmarks_in_box(self, frame01: np.ndarray, box) -> np.ndarray:
        """68 landmarks of the face inside `box`, in FRAME pixel coords.

        The box is padded to a square crop (dlib's predictor also runs on
        the detector's box); the crop is host-resized to the LandmarkNet
        input so every face reuses one compiled program.
        """
        import cv2

        frame = np.asarray(frame01)
        h, w = frame.shape[:2]
        x0, y0, x1, y1 = box
        cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
        half = max(x1 - x0, y1 - y0) * 0.75
        sx0, sy0 = int(max(0, cx - half)), int(max(0, cy - half))
        sx1, sy1 = int(min(w, cx + half)), int(min(h, cy + half))
        crop = frame[sy0:sy1, sx0:sx1]
        s = self.config.landmark.input_size
        crop_s = cv2.resize(crop.astype(np.float32), (s, s),
                            interpolation=cv2.INTER_LINEAR)
        lm = np.asarray(self.detect_landmarks(jnp.asarray(crop_s)[None])[0])
        lm = lm * np.array([(sx1 - sx0) / s, (sy1 - sy0) / s], np.float32)
        return lm + np.array([sx0, sy0], np.float32)

    # ---- shared swap body ----

    def _swap_aligned(
        self,
        t_crop: jnp.ndarray,   # (B, A, A, 3) aligned target crops, [0,1]
        ref224: jnp.ndarray,   # (B, 224, 224, 3) CLIP-normalized references
        key: jax.Array,
    ) -> jnp.ndarray:
        """Parse + mask + swap the aligned crops; returns (B, A, A, 3) in
        [0,1] at align_size. Landmark conditioning is computed on the
        swap-resolution crop — crop coordinates, matching get_landmarks on
        the cropped 512px batch (ddpm.py:1068-1099)."""
        cfg = self.config
        t_seg = self.parse(t_crop)
        t_face = self.face_mask(t_seg)

        size = self.swapper.config.image_size
        b = t_crop.shape[0]
        t_small = jax.image.resize(t_crop, (b, size, size, 3), "bilinear")
        t_mask = 1.0 - jax.image.resize(t_face, (b, size, size, 1), "bilinear")
        target_pm1 = t_small * 2 - 1
        inpaint = target_pm1 * t_mask

        # re-detect on the crop: conditioning landmarks MUST be in crop
        # coordinates at swap resolution (one_inference.py:717-726)
        lm_crop = self.detect_landmarks(t_small)
        lm_for_cond = lm_crop.reshape(b, 136)

        out = self.swapper.swap(
            target_image=target_pm1,
            inpaint_image=inpaint,
            inpaint_mask=t_mask,
            ref_clip224=ref224,
            landmarks=lm_for_cond,
            key=key,
        )
        out01 = (out + 1.0) / 2.0
        return jax.image.resize(
            out01, (b, cfg.align_size, cfg.align_size, 3), "bilinear"
        )

    def _source_reference(self, source01: jnp.ndarray) -> jnp.ndarray:
        """Align+parse the source(s), return CLIP-normalized masked refs."""
        s_lm = self.detect_landmarks(source01)
        s_crop, _ = self.align(source01, s_lm)
        s_face = self.face_mask(self.parse(s_crop))
        return clip_normalize(s_crop * s_face)

    # ---- end-to-end ----

    def swap_images(
        self,
        target01: jnp.ndarray,  # (B,H,W,3) raw frames in [0,1]
        source01: jnp.ndarray,  # (B,h,w,3) raw source(s) in [0,1]
        key: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """Full raw swap (one face per frame); returns composited frames."""
        key = key if key is not None else jax.random.key(0)

        t_lm = self.detect_landmarks(target01)
        t_crop, t_quads = self.align(target01, t_lm)
        ref224 = self._source_reference(source01)
        out_big = self._swap_aligned(t_crop, ref224, key)
        return jax.vmap(
            lambda orig, crop, quad: paste_back(orig, crop, quad)
        )(target01, out_big, t_quads)

    def swap_images_fused(
        self,
        target01: jnp.ndarray,
        source01: jnp.ndarray,
        key: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """`swap_images` compiled as ONE XLA program (latency mode).

        The eager path dispatches every pre/post stage (landmarks, align,
        parse, paste-back) primitive-by-primitive — over the axon tunnel
        each dispatch is a host round trip, which dominates batch-1 p50
        latency. Here the entire raw path (one_inference.py:521-808
        protocol) is a single jitted program: one dispatch, XLA fuses the
        resize/warp glue into neighbours. Same ops in the same order as
        `swap_images`; outputs agree to float-fusion tolerance (measured
        max |delta| ~1e-3 on [0,1] images — fusion boundaries move, and
        ~1e-4 landmark drift reseats the align quad; see
        tests/test_raw_pipeline.py::test_fused_raw_path_matches_eager).

        All param trees are jit ARGUMENTS, not closure captures: jitting
        the bound method bakes the 860M-param swapper tree into the MLIR
        as 2.67G of dense constants, which broke the axon remote-compile
        upload (queue5 p50_fused: Broken pipe) and would bloat any AOT
        cache. tests/test_raw_pipeline.py::test_fused_raw_captures_no_
        large_constants guards the regression."""
        key = key if key is not None else jax.random.key(0)
        if not hasattr(self, "_jit_raw"):
            import copy

            def run(swap_params, lm_params, bn_params, tgt, src, k):
                sub = copy.copy(self)
                sub.swapper = copy.copy(self.swapper)
                sub.swapper.params = swap_params
                sub.landmark_params = lm_params
                sub.bisenet_params = bn_params
                return RawSwapPipeline.swap_images(sub, tgt, src, k)

            self._jit_raw = jax.jit(run)
        return self._jit_raw(self.swapper.params, self.landmark_params,
                             self.bisenet_params, target01, source01, key)

    def face_presence(self, target01: jnp.ndarray,
                      min_area_frac: float = 2e-3) -> jnp.ndarray:
        """(B,H,W,3) -> (B,) bool: does the frame contain a face region of
        at least min_area_frac of its area?

        Stands in for dlib's "no detection" signal: the reference treats an
        align/parse exception as detect failure and falls back
        (inference_swap_video.py:468-496); our LandmarkNet is a regressor
        that always answers, so the gate is the parsing-mask area instead.
        """
        b = target01.shape[0]
        p = self.config.parse_size
        small = jax.image.resize(target01, (b, p, p, 3), "bilinear")
        seg = parse_faces(self.bisenet, self.bisenet_params, small,
                          remap_lut=FACE_PARSING_TO_SEG12)
        face = self.face_mask(seg)[..., 0]
        return jnp.mean(face, axis=(1, 2)) >= min_area_frac

    def _video_batch_program(self):
        """The whole per-batch video step as ONE jitted program.

        The eager robust path dispatches every stage (presence parse,
        landmarks, align, swap, paste-back) primitive-by-primitive — over
        the axon tunnel each dispatch is a host round trip, ~20+ RTTs per
        frame batch, which is most of what kept `--bench-ram` at 0.58 fps
        while the chip ladder does 2.13. Here presence + the last-good-
        frame fallback (a lax.scan carry over the batch) + align + swap +
        paste-back compile into one program: one dispatch per batch.

        Param trees are jit ARGUMENTS, not closure captures (same reason
        as swap_images_fused: captured trees bake multi-GB constants into
        the MLIR and break the axon remote-compile upload)."""
        if not hasattr(self, "_jit_video"):
            import copy

            def run(swap_params, lm_params, bn_params, frames, lm_in,
                    ref224, src, state, k, thresh):
                sub = copy.copy(self)
                sub.swapper = copy.copy(self.swapper)
                sub.swapper.params = swap_params
                sub.landmark_params = lm_params
                sub.bisenet_params = bn_params
                present = sub.face_presence(frames, thresh)
                lm = (lm_in if lm_in is not None
                      else sub.detect_landmarks(frames))
                ref = (ref224 if ref224 is not None
                       else sub._source_reference(src))

                def step(carry, x):
                    lf, llm, v = carry
                    f, l, p = x
                    # last-good-frame substitution (video fallback parity):
                    # present -> this frame becomes the new "last good";
                    # absent -> reuse the last good frame+landmarks if any
                    lf2 = jnp.where(p, f, jnp.where(v, lf, f))
                    llm2 = jnp.where(p, l, jnp.where(v, llm, l))
                    v2 = jnp.logical_or(v, p)
                    return (lf2, llm2, v2), (lf2, llm2, v2)

                new_state, (f_eff, lm_eff, v_eff) = jax.lax.scan(
                    step, state, (frames, lm, present)
                )
                t_crop, t_quads = sub.align(f_eff, lm_eff)
                out_big = sub._swap_aligned(t_crop, ref, k)
                out = jax.vmap(
                    lambda orig, crop, quad: paste_back(orig, crop, quad)
                )(f_eff, out_big, t_quads)
                # frames before any successful detection pass through
                out = jnp.where(v_eff[:, None, None, None], out, frames)
                return out, new_state, t_quads

            self._jit_video = jax.jit(run)
        return self._jit_video

    def swap_images_robust(
        self,
        target01: jnp.ndarray,  # (B,H,W,3) raw frames in [0,1]
        source01: jnp.ndarray,  # (B,h,w,3) raw source(s) in [0,1]
        key: Optional[jax.Array] = None,
        state: Optional[tuple] = None,
        min_area_frac: float = 2e-3,
        one_program: bool = True,
        ref224: Optional[jnp.ndarray] = None,
    ):
        """swap_images with the reference's last-good-frame fallback.

        Parity: inference_swap_video.py:468-500 — when detection fails on a
        frame, the previous frame's crop/mask/transform are reused (the
        output frame repeats the last good swap); per-frame inverse
        transforms are returned for persistence (inv_transforms.npy role).
        Frames before any successful detection pass through unswapped.

        one_program=True (default) runs the batch as a single XLA program
        (`_video_batch_program`): one device dispatch instead of ~20 eager
        tunnel round trips. With a host `landmark_fn` (--landmark-rert),
        the exact ERT provides the ALIGNMENT landmarks (computed on the
        host, fed in) AND the source-reference alignment (computed eagerly
        before the program when ref224 is not supplied); only the
        512px-crop re-detect for the conditioning vector uses the
        on-device LandmarkNet inside the program (measured CNN-vs-ERT
        tolerance 1.74 px @256, BENCH_LOG "Landmark fidelity").
        one_program=False keeps the stage-by-stage eager path, where the
        conditioning re-detect also uses the host ERT.

        ref224: optional precomputed `_source_reference(source)` — pass it
        when the source is constant across batches (a video) so the CLIP
        tower doesn't re-encode the same source every batch.

        Returns (frames_out, new_state, quads); thread `state` through
        successive batches of one video (opaque; None until a face has
        been seen).
        """
        key = key if key is not None else jax.random.key(0)
        if one_program:
            if state is None:
                state = (jnp.zeros_like(target01[0]),
                         jnp.zeros((68, 2), jnp.float32),
                         jnp.zeros((), bool))
            lm_in = None
            if self.landmark_fn is not None:
                lm_in = jnp.asarray(
                    np.asarray(self.landmark_fn(target01), np.float32)
                )
                if ref224 is None:
                    # Compute the source reference EAGERLY so its alignment
                    # also uses the exact host ERT; traced inside the
                    # program, detect_landmarks would silently fall back to
                    # the CNN for the source crop (eager-path divergence).
                    ref224 = self._source_reference(source01)
            out, new_state, quads = self._video_batch_program()(
                self.swapper.params, self.landmark_params,
                self.bisenet_params, target01, lm_in, ref224,
                None if ref224 is not None else source01,
                state, key, min_area_frac,
            )
            # old-API None-until-detected semantics; the scalar readback
            # doubles as the reliable device sync (CLAUDE.md timing rule)
            if not bool(new_state[2]):
                new_state = None
            return out, new_state, np.asarray(quads)
        b = target01.shape[0]
        present = np.asarray(self.face_presence(target01, min_area_frac))
        frames = np.asarray(target01, np.float32).copy()
        lm = np.array(self.detect_landmarks(target01), np.float32)

        last_frame, last_lm = state if state is not None else (None, None)
        passthrough = []
        for i in range(b):
            if present[i]:
                last_frame, last_lm = frames[i], lm[i]
            elif last_frame is not None:
                frames[i] = last_frame
                lm[i] = last_lm
            else:
                passthrough.append(i)

        frames_j = jnp.asarray(frames)
        t_crop, t_quads = self.align(frames_j, jnp.asarray(lm))
        if ref224 is None:
            ref224 = self._source_reference(source01)
        out_big = self._swap_aligned(t_crop, ref224, key)
        out = jax.vmap(
            lambda orig, crop, quad: paste_back(orig, crop, quad)
        )(frames_j, out_big, t_quads)
        if passthrough:
            out = np.array(out)  # writable host copy
            for i in passthrough:
                out[i] = np.asarray(target01[i])
            out = jnp.asarray(out)
        new_state = (last_frame, last_lm) if last_frame is not None else None
        return out, new_state, np.asarray(t_quads)

    def swap_frame_multiface(
        self,
        frame01: np.ndarray,    # (H,W,3) one raw frame in [0,1]
        source01: jnp.ndarray,  # (1,h,w,3) raw source in [0,1]
        key: Optional[jax.Array] = None,
        max_faces: int = 4,
    ) -> jnp.ndarray:
        """Swap EVERY detected face in the frame with the same source.

        Parity: crop_faces iterates all detections and the results are
        composited sequentially (alignmengt.py:181-264,
        one_inference.py:782-799). All faces run as one device batch.
        """
        key = key if key is not None else jax.random.key(0)
        frame = np.asarray(frame01, np.float32)
        boxes = self.detect_faces(frame, max_faces=max_faces)
        if not boxes:
            return jnp.asarray(frame)

        lm68 = jnp.asarray(
            np.stack([self.landmarks_in_box(frame, b) for b in boxes])
        )  # (F, 68, 2) frame coords
        f = len(boxes)
        frames = jnp.broadcast_to(jnp.asarray(frame), (f,) + frame.shape)
        t_crop, t_quads = self.align(frames, lm68)

        ref224 = self._source_reference(jnp.asarray(source01))
        ref224 = jnp.broadcast_to(ref224[:1], (f,) + ref224.shape[1:])

        out_big = self._swap_aligned(t_crop, ref224, key)
        out = jnp.asarray(frame)
        for i in range(f):
            out = paste_back(out, out_big[i], t_quads[i])
        return out
