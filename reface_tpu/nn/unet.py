"""9-channel Stable-Diffusion-v1 UNet, TPU-native (flax.linen, NHWC).

Behavioral parity target (semantics, not code):
  /root/reference/ldm/modules/diffusionmodules/openaimodel.py:528-907 with the
  shipped config (configs/train.yaml:31-47): in_channels=9, out_channels=4,
  model_channels=320, channel_mult=(1,2,4,4), num_res_blocks=2, attention at
  downsample rates {1,2,4}, num_heads=8, transformer_depth=1, context_dim=768,
  use_scale_shift_norm=False, conv resample.

Module names are chosen so that a torch state_dict key maps 1:1 onto a flax
param path (see reface_tpu/ckpt/convert.py), e.g. torch
`input_blocks.1.0.in_layers.2.weight` -> flax `input_blocks_1_0/in_conv/kernel`.

TPU notes:
  - NHWC; convs hit the MXU via XLA's conv-to-gemm lowering.
  - GroupNorm reduces in fp32, everything else can run bf16.
  - `remat=True` wraps each ResBlock/Transformer in jax.checkpoint for
    training (ref uses use_checkpoint=True, configs/train.yaml:45).
  - `return_features=True` also returns all decoder block activations
    (ref openaimodel.py:897-905), used by the landmark aux head.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from reface_tpu.core.schedules import timestep_embedding
from reface_tpu.nn.layers import CrossAttention, FeedForwardGEGLU, GroupNorm32

__all__ = ["UNetConfig", "UNetModel"]


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 9
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_heads: int = 8
    transformer_depth: int = 1
    context_dim: int = 768
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    # fuse GroupNorm+SiLU into one Pallas kernel (ops/groupnorm.py) where it
    # fits VMEM; identical param tree, A/B-able per config
    fused_groupnorm: bool = False
    # self-attention kernel: "auto" (exact smalld routing), "fast" (bf16
    # probs, no row-max — serving mode), "flash" (has a VJP; training uses
    # this), "einsum"
    attn_impl: str = "auto"
    # "int8": serving-mode MXU int8 for the transformer matmuls (self-attn
    # QKV/out + GEGLU FF) AND the ResBlock convs (ops/quant.py);
    # cross-attention (M=1 exact shortcut), stem/head and up/downsample
    # convs stay bf16. "int8conv": ResBlock convs only — the transformer
    # matmuls keep exact bf16 math (the round-4 ablation measured int8
    # a net LOSS on the transformer side, a win on the conv side).
    # Quantify deltas via compare_modes.
    quant: str = "none"


class ResBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32
    fused_gn: bool = False
    quant: str = "none"  # "int8": serving-mode MXU int8 convs (ops/quant)

    @nn.compact
    def __call__(self, x, emb):
        from reface_tpu.nn.layers import QConv

        def conv(feats, size, pad, name, kernel_init=None):
            if self.quant != "none":
                kw = {"kernel_init": kernel_init} if kernel_init else {}
                return QConv(feats, kernel_size=size, padding=pad,
                             dtype=self.dtype, quant=self.quant, name=name,
                             **kw)
            kw = {"kernel_init": kernel_init} if kernel_init else {}
            return nn.Conv(feats, size, padding=pad, dtype=self.dtype,
                           name=name, **kw)

        ch = x.shape[-1]
        h = GroupNorm32(name="in_norm", fuse_silu=self.fused_gn)(x)
        if not self.fused_gn:
            h = nn.silu(h)
        h = conv(self.out_channels, (3, 3), 1, "in_conv")(h)
        e = nn.Dense(self.out_channels, dtype=self.dtype, name="emb_proj")(
            nn.silu(emb)
        )
        h = h + e[:, None, None, :]
        h = GroupNorm32(name="out_norm", fuse_silu=self.fused_gn)(h)
        if not self.fused_gn:
            h = nn.silu(h)
        h = conv(self.out_channels, (3, 3), 1, "out_conv",
                 kernel_init=nn.initializers.zeros)(h)
        if ch != self.out_channels:
            x = conv(self.out_channels, (1, 1), 0, "skip")(x)
        return x + h


class TransformerBlock(nn.Module):
    channels: int
    num_heads: int
    context_dim: int
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    quant: str = "none"

    @nn.compact
    def __call__(self, x, context, expand_cfg: bool = False):
        """expand_cfg: x is the shared CFG half-batch (B); context is 2B.
        The self-attention runs once on B and the batch doubles just before
        the cross-attention — the first context-dependent op (exact CFG
        prefix dedup; both halves of cfg_eps's duplicated input are
        identical until here, ddim.py:338-346)."""
        d = self.channels // self.num_heads
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(x)
        x = x + CrossAttention(
            self.channels, heads=self.num_heads, dim_head=d, dtype=self.dtype,
            attn_impl=self.attn_impl, quant=self.quant, name="attn1",
        )(h)
        if expand_cfg:
            x = jnp.concatenate([x, x], axis=0)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(x)
        x = x + CrossAttention(
            self.channels,
            context_dim=self.context_dim,
            heads=self.num_heads,
            dim_head=d,
            dtype=self.dtype,
            name="attn2",
        )(h, context)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm3")(x)
        return x + FeedForwardGEGLU(self.channels, dtype=self.dtype,
                                    quant=self.quant, name="ff")(h)


class SpatialTransformer(nn.Module):
    channels: int
    num_heads: int
    context_dim: int
    depth: int = 1
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    quant: str = "none"

    @nn.compact
    def __call__(self, x, context, expand_cfg: bool = False):
        b, hh, ww, c = x.shape
        h = GroupNorm32(epsilon=1e-6, name="norm")(x)
        h = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(b, hh * ww, self.channels)
        for i in range(self.depth):
            h = TransformerBlock(
                self.channels,
                self.num_heads,
                self.context_dim,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                quant=self.quant,
                name=f"block_{i}",
            )(h, context, expand_cfg=expand_cfg and i == 0)
        h = h.reshape(-1, hh, ww, self.channels)
        h = nn.Conv(
            self.channels,
            (1, 1),
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="proj_out",
        )(h)
        if expand_cfg:
            x = jnp.concatenate([x, x], axis=0)
        return x + h


class Downsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.channels, (3, 3), strides=2, padding=1, dtype=self.dtype,
            name="conv",
        )(x)


class Upsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest 2x
        return nn.Conv(
            self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv"
        )(x)


class UNetModel(nn.Module):
    config: UNetConfig = UNetConfig()

    @nn.compact
    def __call__(self, x, timesteps, context, return_features: bool = False,
                 cfg_expand: bool = False):
        """x: (B, H, W, 9) latent stack; timesteps: (B,); context: (B, T, 768).

        cfg_expand: exact CFG prefix dedup — x/timesteps are ONE half-batch
        (B) while context is the CFG pair (2B, uncond first). cfg_eps
        duplicates an identical x9 for both halves (ddim.py:338-346), so
        every op before the first cross-attention computes the same values
        twice; here the stem, the first ResBlock and the first
        self-attention run once at B and the batch doubles at the first
        context read. Returns eps at 2B. Same params, same math.
        """
        cfg = self.config
        dt = cfg.dtype
        res_block_cls = nn.remat(ResBlock) if cfg.remat else ResBlock
        from functools import partial as _partial

        res_block = _partial(res_block_cls, fused_gn=cfg.fused_groupnorm,
                             quant=cfg.quant)
        transformer = nn.remat(SpatialTransformer) if cfg.remat else SpatialTransformer

        t_emb = timestep_embedding(timesteps, cfg.model_channels)
        emb = nn.Dense(cfg.model_channels * 4, dtype=dt, name="time_embed_0")(
            t_emb.astype(dt)
        )
        emb = nn.Dense(cfg.model_channels * 4, dtype=dt, name="time_embed_2")(
            nn.silu(emb)
        )

        x = x.astype(dt)
        context = context.astype(dt)

        def attn_layer(ch, name):
            return transformer(
                ch,
                cfg.num_heads,
                cfg.context_dim,
                depth=cfg.transformer_depth,
                dtype=dt,
                attn_impl=cfg.attn_impl,
                quant=cfg.quant,
                name=name,
            )

        expanded = not cfg_expand  # False = still running the shared half

        # ---- encoder ----
        h = nn.Conv(
            cfg.model_channels, (3, 3), padding=1, dtype=dt, name="input_blocks_0_0"
        )(x)
        hs = [h]
        ch = cfg.model_channels
        ds = 1
        block_idx = 1
        for level, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                ch = mult * cfg.model_channels
                h = res_block(ch, dtype=dt, name=f"input_blocks_{block_idx}_0")(h, emb)
                if ds in cfg.attention_resolutions:
                    layer = attn_layer(ch, f"input_blocks_{block_idx}_1")
                    if not expanded:
                        h = layer(h, context, expand_cfg=True)
                        expanded = True
                        emb = jnp.concatenate([emb, emb], axis=0)
                    else:
                        h = layer(h, context)
                hs.append(h)
                block_idx += 1
            if level != len(cfg.channel_mult) - 1:
                h = Downsample(ch, dtype=dt, name=f"input_blocks_{block_idx}_0")(h)
                hs.append(h)
                block_idx += 1
                ds *= 2
        if not expanded:  # no attention layer reached (degenerate config)
            h = jnp.concatenate([h, h], axis=0)
            emb = jnp.concatenate([emb, emb], axis=0)
            expanded = True

        # ---- middle ----
        h = res_block(ch, dtype=dt, name="middle_block_0")(h, emb)
        h = attn_layer(ch, "middle_block_1")(h, context)
        h = res_block(ch, dtype=dt, name="middle_block_2")(h, emb)

        # ---- decoder ----
        features = []
        block_idx = 0
        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            for i in range(cfg.num_res_blocks + 1):
                skip = hs.pop()
                if skip.shape[0] != h.shape[0]:
                    # skip saved before the CFG expansion point (shared half)
                    skip = jnp.concatenate([skip, skip], axis=0)
                h = jnp.concatenate([h, skip], axis=-1)
                ch = mult * cfg.model_channels
                h = res_block(ch, dtype=dt, name=f"output_blocks_{block_idx}_0")(
                    h, emb
                )
                sub = 1
                if ds in cfg.attention_resolutions:
                    h = attn_layer(ch, f"output_blocks_{block_idx}_{sub}")(h, context)
                    sub += 1
                if level and i == cfg.num_res_blocks:
                    h = Upsample(
                        ch, dtype=dt, name=f"output_blocks_{block_idx}_{sub}"
                    )(h)
                    ds //= 2
                features.append(h)
                block_idx += 1

        h = GroupNorm32(name="out_norm", fuse_silu=cfg.fused_groupnorm)(h)
        if not cfg.fused_groupnorm:
            h = nn.silu(h)
        out = nn.Conv(
            cfg.out_channels,
            (3, 3),
            padding=1,
            kernel_init=nn.initializers.zeros,
            dtype=dt,
            name="out_conv",
        )(h)
        out = out.astype(jnp.float32)
        if return_features:
            return out, features
        return out
