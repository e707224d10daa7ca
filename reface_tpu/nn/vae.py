"""AutoencoderKL — the frozen SD-v1 VAE, TPU-native (flax.linen, NHWC).

Behavioral parity target (semantics, not code):
  /root/reference/ldm/models/autoencoder.py:285-424 and
  /root/reference/ldm/modules/diffusionmodules/model.py:368-556 with the
  shipped config (configs/train.yaml:49-70): embed_dim=4, ch=128,
  ch_mult=(1,2,4,4), num_res_blocks=2, no down-path attention, double_z,
  mid-block single-head attention, scale factor 0.18215 applied by the caller
  (ldm/models/diffusion/ddpm.py:850-857).

TPU notes: all convs NHWC; GroupNorm reduced in fp32; the mid AttnBlock is a
single-head attention over (H/8*W/8)=4096 tokens — expressed as plain einsum
so XLA maps it onto the MXU. Encoder downsampling uses the SD asymmetric
(0,1) padding to stay checkpoint-compatible.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from reface_tpu.core.distributions import DiagonalGaussian
from reface_tpu.nn.layers import GroupNorm32

__all__ = ["VAEConfig", "Encoder", "Decoder", "AutoencoderKL", "SD_SCALE_FACTOR"]

SD_SCALE_FACTOR = 0.18215


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    embed_dim: int = 4
    out_ch: int = 3
    double_z: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    # Rematerialize decoder blocks in the backward pass. Without it the
    # 512px decoder backward stores every activation incl. fp32 GroupNorm
    # islands — measured 14.5 GB of XLA temps for a 3-stacked decode
    # (tools/probe_split_mem.py), which alone OOMs a 16G v5e. Training
    # enables this; inference (no backward) is unaffected by the flag.
    remat: bool = False
    # "int8"/"int8conv": serving-mode MXU int8 for the ResnetBlock convs
    # (ops/quant); mid attention, stem/head and up/downsample convs stay
    # bf16 (both modes are identical here — the VAE has no QDense sites)
    quant: str = "none"


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x):
        from reface_tpu.nn.layers import QConv

        def conv(feats, size, pad, name):
            if self.quant != "none":
                return QConv(feats, kernel_size=size, padding=pad,
                             dtype=self.dtype, quant=self.quant, name=name)
            return nn.Conv(feats, size, padding=pad, dtype=self.dtype,
                           name=name)

        ch = x.shape[-1]
        h = GroupNorm32(epsilon=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = conv(self.out_channels, (3, 3), 1, "conv1")(h)
        h = GroupNorm32(epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = conv(self.out_channels, (3, 3), 1, "conv2")(h)
        if ch != self.out_channels:
            x = conv(self.out_channels, (1, 1), 0, "nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention with 1x1-conv projections."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = GroupNorm32(epsilon=1e-6, name="norm")(x)
        from reface_tpu.ops.attention import multi_head_attention

        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(h).reshape(b, hh * ww, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(h).reshape(b, hh * ww, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(h).reshape(b, hh * ww, c)
        h = multi_head_attention(q, k, v, num_heads=1).reshape(b, hh, ww, c)
        h = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return x + h


class Downsample(nn.Module):
    """Stride-2 conv with SD's asymmetric (0,1)x(0,1) padding."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            self.channels, (3, 3), strides=2, padding="VALID", dtype=self.dtype,
            name="conv",
        )(x)


class Upsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    config: VAEConfig = VAEConfig()

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dt = cfg.dtype
        x = x.astype(dt)
        h = nn.Conv(cfg.ch, (3, 3), padding=1, dtype=dt, name="conv_in")(x)
        for i, mult in enumerate(cfg.ch_mult):
            ch = cfg.ch * mult
            for j in range(cfg.num_res_blocks):
                h = ResnetBlock(ch, dtype=dt, quant=cfg.quant,
                                name=f"down_{i}_block_{j}")(h)
            if i != len(cfg.ch_mult) - 1:
                h = Downsample(ch, dtype=dt, name=f"down_{i}_downsample")(h)
        h = ResnetBlock(h.shape[-1], dtype=dt, quant=cfg.quant,
                        name="mid_block_1")(h)
        h = AttnBlock(dtype=dt, name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], dtype=dt, quant=cfg.quant,
                        name="mid_block_2")(h)
        h = GroupNorm32(epsilon=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return nn.Conv(out_ch, (3, 3), padding=1, dtype=dt, name="conv_out")(h)


class Decoder(nn.Module):
    config: VAEConfig = VAEConfig()

    @nn.compact
    def __call__(self, z, features: bool = False):
        """features=True also returns the penultimate activations (the
        conv_out input) — the VAE training loss differentiates its NLL/GAN
        terms w.r.t. the LAST decoder layer only (contperceptual.py:32-42
        `get_last_layer` semantics), which needs this tap."""
        cfg = self.config
        dt = cfg.dtype
        # per-block remat (same param tree — lifted transform keeps scopes)
        Res = nn.remat(ResnetBlock) if cfg.remat else ResnetBlock
        Up = nn.remat(Upsample) if cfg.remat else Upsample
        z = z.astype(dt)
        block_in = cfg.ch * cfg.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding=1, dtype=dt, name="conv_in")(z)
        h = Res(block_in, dtype=dt, quant=cfg.quant, name="mid_block_1")(h)
        h = AttnBlock(dtype=dt, name="mid_attn_1")(h)
        h = Res(block_in, dtype=dt, quant=cfg.quant, name="mid_block_2")(h)
        for i in reversed(range(len(cfg.ch_mult))):
            ch = cfg.ch * cfg.ch_mult[i]
            for j in range(cfg.num_res_blocks + 1):
                h = Res(ch, dtype=dt, quant=cfg.quant,
                        name=f"up_{i}_block_{j}")(h)
            if i != 0:
                h = Up(ch, dtype=dt, name=f"up_{i}_upsample")(h)
        h = GroupNorm32(epsilon=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        out = nn.Conv(cfg.out_ch, (3, 3), padding=1, dtype=dt, name="conv_out")(h).astype(
            jnp.float32
        )
        return (out, h) if features else out


class AutoencoderKL(nn.Module):
    """encode(x) -> DiagonalGaussian over 4-ch latents; decode(z) -> image.

    The 0.18215 latent scale is NOT applied here (matches the reference where
    LatentDiffusion applies scale_factor outside the VAE).
    """

    config: VAEConfig = VAEConfig()

    def setup(self):
        self.encoder = Encoder(self.config, name="encoder")
        self.decoder = Decoder(self.config, name="decoder")
        self.quant_conv = nn.Conv(
            2 * self.config.embed_dim if self.config.double_z else self.config.embed_dim,
            (1, 1),
            dtype=self.config.dtype,
            name="quant_conv",
        )
        self.post_quant_conv = nn.Conv(
            self.config.z_channels, (1, 1), dtype=self.config.dtype, name="post_quant_conv"
        )

    def encode(self, x) -> DiagonalGaussian:
        moments = self.quant_conv(self.encoder(x)).astype(jnp.float32)
        return DiagonalGaussian.from_moments(moments, axis=-1)

    def decode(self, z, features: bool = False):
        return self.decoder(
            self.post_quant_conv(z.astype(self.config.dtype)), features=features
        )

    def __call__(self, x, key=None, sample: bool = False):
        posterior = self.encode(x)
        z = posterior.sample(key) if sample else posterior.mode()
        return self.decode(z), posterior
