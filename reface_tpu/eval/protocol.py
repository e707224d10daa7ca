"""Exact reference-protocol preprocessing for the evaluation harness.

Each helper reproduces one loader in /root/reference/eval_tool (semantics,
not code) so metric numbers are comparable with the reference protocol:

  clip_fid_load       fid/fid_score.py:66-80 — CLIP ViT-B/32 preprocess:
                      shorter-edge bicubic resize to 224 (PIL), center crop
                      224, [0,1] floats (CLIP normalization happens inside
                      clip_features).
  id_masked_112_load  ID_retrieval/ID_retrieval.py:171-250 — cv2 RGB read,
                      bilinear resize to 112 (albumentations default), CLIP
                      normalization, multiplied by the dataset-rule preserve
                      mask (19-class mask binarized, resized 112 bilinear
                      no-antialias — torchvision tensor-mode Resize).
  id_embed_protocol   ID_retrieval.py:104-140 (IDLoss) — AdaptiveAvgPool2d
                      to 256, crop [35:223, 32:220], pool to 112, backbone.
  hopenet_load        Pose/pose_compare.py:82-99 — ToTensor, tensor-mode
                      Resize (224,224) bilinear no-antialias, ImageNet
                      normalization is applied inside pose_angles.
  expression_load     Expression/expression_compare_face_recon.py:105-128 —
                      PIL bicubic resize to (512,512), /255.

Eval-time preserve lists (ID_retrieval.py:204-212) differ from the training
mask recipes — notably CelebA drops hair (17):
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "ID_EVAL_PRESERVE",
    "clip_fid_load",
    "id_masked_112_load",
    "id_embed_protocol",
    "hopenet_load",
    "expression_load",
    "parse_file_number",
]

# ID_retrieval.py:204-212
ID_EVAL_PRESERVE = {
    "celeba": (1, 2, 4, 5, 8, 9, 6, 7, 10, 11, 12),
    "ffhq": (1, 2, 3, 5, 6, 7, 9),
    "ff++": (1, 2, 4, 5, 8, 9),
    "none": tuple(range(21)),
}

# CLIP image normalization (get_tensor(), ID_retrieval.py:95-103)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _pil_open_rgb(path):
    from PIL import Image

    return Image.open(path).convert("RGB")


def clip_fid_load(paths, size: int = 224) -> np.ndarray:
    """CLIP preprocess (bicubic shorter-edge resize + center crop) -> [0,1].

    Returns (N, size, size, 3) float32 in [0,1]; CLIP normalization is done
    by the feature extractor (clip_features -> clip_normalize).
    """
    from PIL import Image

    out = np.zeros((len(paths), size, size, 3), np.float32)
    for i, p in enumerate(paths):
        img = _pil_open_rgb(p)
        w, h = img.size
        scale = size / min(w, h)
        nw, nh = round(w * scale), round(h * scale)
        img = img.resize((nw, nh), Image.BICUBIC)
        left = (nw - size) // 2
        top = (nh - size) // 2
        img = img.crop((left, top, left + size, top + size))
        out[i] = np.asarray(img, np.float32) / 255.0
    return out


def id_masked_112_load(image_paths, mask_paths, dataset: str = "celeba"
                       ) -> np.ndarray:
    """Masked CLIP-normalized 112px crops for the ID metric.

    (N,112,112,3) float32: cv2-bilinear resize to 112, CLIP normalization,
    multiplied by the preserve-class mask (binarized 19-class annotation,
    resized to 112 with bilinear no-antialias).
    """
    import cv2

    import jax.numpy as jnp

    from reface_tpu.ops.resize import resize_bilinear_no_aa

    preserve = ID_EVAL_PRESERVE[dataset]
    out = np.zeros((len(image_paths), 112, 112, 3), np.float32)
    for i, (ip, mp) in enumerate(zip(image_paths, mask_paths)):
        img = cv2.cvtColor(cv2.imread(str(ip)), cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (112, 112), interpolation=cv2.INTER_LINEAR)
        x = (img.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD

        from PIL import Image

        m = np.asarray(Image.open(mp).convert("L"))
        m01 = np.isin(m, preserve).astype(np.float32)  # 255/255 after binarize
        m112 = np.asarray(
            resize_bilinear_no_aa(
                jnp.asarray(m01)[None, :, :, None], 112, 112
            )
        )[0, :, :, 0]
        out[i] = x * m112[..., None]
    return out


def id_embed_protocol(params, images112: np.ndarray, batch_size: int = 64,
                      config=None) -> np.ndarray:
    """IDLoss.extract_feats protocol on already-normalized 112px inputs:
    AdaptiveAvgPool2d(256) -> crop [35:223, 32:220] -> AdaptiveAvgPool2d(112)
    -> IR-SE-50; returns (N, 512) l2-normed features."""
    import jax
    import jax.numpy as jnp

    from reface_tpu.nn.arcface import ARC_FACE_CROP, ArcFaceConfig, IRSE50
    from reface_tpu.ops.pooling import adaptive_avg_pool2d

    model = IRSE50(config or ArcFaceConfig())

    @jax.jit
    def fwd(p, x):
        x = adaptive_avg_pool2d(x, 256, 256)
        t, b, l, r = ARC_FACE_CROP
        x = x[:, t:b, l:r, :]
        x = adaptive_avg_pool2d(x, 112, 112)
        return model.apply(p, x)

    out = []
    for i in range(0, images112.shape[0], batch_size):
        out.append(np.asarray(fwd(params, jnp.asarray(images112[i:i + batch_size]))))
    return np.concatenate(out, axis=0)


def hopenet_load(paths, size: int = 224) -> np.ndarray:
    """(N,224,224,3) [0,1]: tensor-mode Resize semantics (bilinear, no AA)."""
    import cv2

    import jax.numpy as jnp

    from reface_tpu.ops.resize import resize_bilinear_no_aa

    out = np.zeros((len(paths), size, size, 3), np.float32)
    for i, p in enumerate(paths):
        img = np.asarray(_pil_open_rgb(p), np.float32) / 255.0
        if img.shape[:2] != (size, size):
            img = np.asarray(
                resize_bilinear_no_aa(jnp.asarray(img)[None], size, size)
            )[0]
        out[i] = img
    return out


def expression_load(paths, size: int = 512) -> np.ndarray:
    """(N,512,512,3) [0,1]: PIL bicubic resize to (512,512), /255."""
    from PIL import Image

    out = np.zeros((len(paths), size, size, 3), np.float32)
    for i, p in enumerate(paths):
        img = _pil_open_rgb(p).resize((size, size), Image.BICUBIC)
        out[i] = np.asarray(img, np.float32) / 255.0
    return out


def parse_file_number(name: str) -> int | None:
    """First integer among [_/.-]-separated filename parts
    (ID_retrieval.py:325-340 pairing rule)."""
    import re

    for part in re.split(r"[_\/.\-]", name):
        if part.isdigit():
            return int(part)
    return None
