"""CLIP ViT-L/14 vision tower + trainable mapper head, TPU-native (flax).

Behavioral parity target (semantics, not code):
  /root/reference/ldm/modules/encoders/modules.py:211-264 — the conditioner is
  an *image* embedder despite its name: HF CLIPModel ViT-L/14 vision tower ->
  pooler_output -> visual_projection (1024->768) -> trainable 5-layer width-768
  1-head transformer ("mapper2", xf.py:104) -> final LayerNorm ("final_ln2").
  Only mapper2/final_ln2 receive gradients; the tower is frozen.

ViT-L/14 vision config (openai/clip-vit-large-patch14): hidden 1024, 24
layers, 16 heads, patch 14, image 224 -> 257 tokens (cls + 16x16), quick-gelu
MLP (x * sigmoid(1.702x)), pre-LN blocks, pre_layernorm after embeddings,
pooler = post_layernorm(cls token).

TPU notes: patch embedding is a 14x14/14 conv = one big gemm; whole tower runs
bf16 with fp32 LayerNorms; 257-token attention maps straight onto the MXU.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["CLIPVisionConfig", "CLIPVisionTower", "MapperTransformer", "CLIPConditioner"]


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden: int = 1024
    layers: int = 24
    heads: int = 16
    patch: int = 14
    image_size: int = 224
    projection_dim: int = 768
    dtype: jnp.dtype = jnp.bfloat16
    # "int8": serving-mode MXU int8 for the tower's transformer matmuls
    # (q/k/v/out + MLP) — an attack on the fixed per-swap conditioning
    # cost that dominates the short distilled serving rungs (--quant-cond;
    # param tree unchanged, QDense mirrors nn.Dense)
    quant: str = "none"

    @property
    def num_tokens(self) -> int:
        return (self.image_size // self.patch) ** 2 + 1


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    hidden: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x):
        from reface_tpu.nn.layers import QDense

        d = self.hidden // self.heads
        b, n, _ = x.shape
        dense = lambda name: QDense(self.hidden, dtype=self.dtype,
                                    quant=self.quant, name=name)
        q = dense("q_proj")(x).reshape(b, n, self.heads, d).transpose(0, 2, 1, 3)
        k = dense("k_proj")(x).reshape(b, n, self.heads, d).transpose(0, 2, 1, 3)
        v = dense("v_proj")(x).reshape(b, n, self.heads, d).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                            preferred_element_type=jnp.float32) * (d**-0.5)
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhnm,bhmd->bhnd", w, v).transpose(0, 2, 1, 3).reshape(b, n, -1)
        return dense("out_proj")(o)


class CLIPLayer(nn.Module):
    hidden: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x):
        from reface_tpu.nn.layers import QDense

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln1")(x)
        x = x + CLIPAttention(self.hidden, self.heads, dtype=self.dtype,
                              quant=self.quant, name="attn")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln2")(x)
        h = QDense(self.hidden * 4, dtype=self.dtype, quant=self.quant,
                   name="fc1")(h)
        h = quick_gelu(h)
        return x + QDense(self.hidden, dtype=self.dtype, quant=self.quant,
                          name="fc2")(h)


class CLIPVisionTower(nn.Module):
    """(B, 224, 224, 3) CLIP-normalized NHWC -> (B, projection_dim) embedding."""

    config: CLIPVisionConfig = CLIPVisionConfig()

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dt = cfg.dtype
        b = x.shape[0]
        patches = nn.Conv(
            cfg.hidden,
            (cfg.patch, cfg.patch),
            strides=cfg.patch,
            use_bias=False,
            padding="VALID",
            dtype=dt,
            name="patch_embed",
        )(x.astype(dt))
        patches = patches.reshape(b, -1, cfg.hidden)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (cfg.hidden,))
        cls = jnp.broadcast_to(cls.astype(dt), (b, 1, cfg.hidden))
        h = jnp.concatenate([cls, patches], axis=1)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (cfg.num_tokens, cfg.hidden),
        )
        h = h + pos.astype(dt)[None]
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="pre_layernorm")(h)
        for i in range(cfg.layers):
            h = CLIPLayer(cfg.hidden, cfg.heads, dtype=dt, quant=cfg.quant,
                          name=f"layer_{i}")(h)
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="post_layernorm")(h[:, 0])
        return nn.Dense(
            cfg.projection_dim, use_bias=False, dtype=jnp.float32,
            name="visual_projection",
        )(pooled)


class MapperBlock(nn.Module):
    """Pre-LN residual block with fused-qkv attention (xf.py:31-101 parity)."""

    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, _ = x.shape
        d = self.width // self.heads
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln1")(x)
        qkv = nn.Dense(self.width * 3, dtype=self.dtype, name="c_qkv")(h)
        qkv = qkv.reshape(b, n, self.heads, 3 * d)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                            preferred_element_type=jnp.float32) * (d**-0.5)
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        att = jnp.einsum("bhnm,bmhd->bnhd", w, v).reshape(b, n, self.width)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="c_proj")(att)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln2")(x)
        h = nn.Dense(self.width * 4, dtype=self.dtype, name="mlp_fc")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(self.width, dtype=self.dtype, name="mlp_proj")(h)


class MapperTransformer(nn.Module):
    """The trainable 5-layer/width-768/1-head mapper over a single token."""

    width: int = 768
    layers: int = 5
    heads: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers):
            x = MapperBlock(self.width, self.heads, dtype=self.dtype, name=f"block_{i}")(x)
        return x


class CLIPConditioner(nn.Module):
    """Frozen CLIP tower + trainable mapper2/final_ln2 head.

    (B,224,224,3) CLIP-normalized -> (B, 1, 768). Gradients should be stopped
    on the tower params by the optimizer partition (parallel/train), matching
    the reference's requires_grad split (modules.py:248-251).
    """

    vision: CLIPVisionConfig = CLIPVisionConfig()

    @nn.compact
    def __call__(self, x):
        z = CLIPVisionTower(self.vision, name="tower")(x)
        z = z[:, None, :]  # (B, 1, 768)
        z = MapperTransformer(dtype=self.vision.dtype, name="mapper2")(z)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="final_ln2")(z)
