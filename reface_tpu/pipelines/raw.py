"""Raw-image swap pipeline: detect/align -> parse -> swap -> paste back.

Functional parity target: /root/reference/scripts/one_inference.py:521-808 —
dlib-align target & source to 1024^2, BiSeNet seg12 masks, masked CLIP
reference build, DDIM swap on the crop, inverse-perspective paste-back onto
the original frame.

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

__all__ = ["RawPipelineConfig", "RawSwapPipeline"]

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


class RawSwapPipeline:
    """Wraps a FaceSwapper with detection/alignment/parsing/paste-back."""

    def __init__(
        self,
        swapper: FaceSwapper,
        config: RawPipelineConfig = RawPipelineConfig(),
        landmark_params=None,
        bisenet_params=None,
        seed: int = 0,
    ):
        self.swapper = swapper
        self.config = config
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
        """(B,H,W,3) in [0,1] -> (B,136) pixel coords at input scale."""
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

    # ---- end-to-end ----

    def swap_images(
        self,
        target01: jnp.ndarray,  # (B,H,W,3) raw frames in [0,1]
        source01: jnp.ndarray,  # (B,h,w,3) raw source(s) in [0,1]
        key: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """Full raw swap; returns composited frames in [0,1]."""
        cfg = self.config
        key = key if key is not None else jax.random.key(0)

        t_lm = self.detect_landmarks(target01)
        s_lm = self.detect_landmarks(source01)
        t_crop, t_quads = self.align(target01, t_lm)
        s_crop, _ = self.align(source01, s_lm)

        t_seg = self.parse(t_crop)
        s_seg = self.parse(s_crop)
        t_face = self.face_mask(t_seg)
        s_face = self.face_mask(s_seg)

        size = self.swapper.config.image_size
        b = t_crop.shape[0]
        t_small = jax.image.resize(t_crop, (b, size, size, 3), "bilinear")
        t_mask = 1.0 - jax.image.resize(t_face, (b, size, size, 1), "bilinear")
        target_pm1 = t_small * 2 - 1
        inpaint = target_pm1 * t_mask

        ref01 = s_crop * s_face
        ref224 = clip_normalize(ref01)

        lm_for_cond = (
            t_lm * (size / target01.shape[1])
        ).reshape(b, 136)

        out = self.swapper.swap(
            target_image=target_pm1,
            inpaint_image=inpaint,
            inpaint_mask=t_mask,
            ref_clip224=ref224,
            landmarks=lm_for_cond,
            key=key,
        )
        out01 = (out + 1.0) / 2.0
        out_big = jax.image.resize(
            out01, (b, cfg.align_size, cfg.align_size, 3), "bilinear"
        )
        composited = jax.vmap(
            lambda orig, crop, quad: paste_back(orig, crop, quad)
        )(target01, out_big, t_quads)
        return composited
