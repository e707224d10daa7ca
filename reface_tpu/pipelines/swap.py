"""End-to-end face-swap pipeline: one jitted XLA program per batch.

Functional parity target (semantics, not code):
  /root/reference/scripts/inference_test_bench.py:406-495 — per batch:
  build uncond token, landmarks + conditioning fusion, VAE-encode the masked
  target, downsample the mask to latent resolution, 50-step DDIM with CFG
  scale 3, VAE-decode, clamp. The reference runs these as ~7 separate GPU
  dispatch phases with CPU sync in between; here the *entire* swap —
  conditioning towers, VAE encode, the 50-step scan, VAE decode — is one
  compiled program that never leaves the chip.

Inputs are pre-cropped tensors (the preprocess package produces them from
raw images); everything is NHWC float32 in [-1, 1] except ref images which
are CLIP-normalized 224x224 (matching ldm/data conventions).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from reface_tpu.core.schedules import DDIMTables, DiffusionSchedule
from reface_tpu.diffusion.ddim import ddim_sample
from reface_tpu.diffusion.dpm_solver import dpm_solver_sample
from reface_tpu.diffusion.plms import plms_sample
from reface_tpu.nn.arcface import CLIP_MEAN, CLIP_STD
from reface_tpu.nn.conditioner import ConditionerConfig, REFaceConditioner
from reface_tpu.nn.unet import UNetConfig, UNetModel
from reface_tpu.nn.vae import SD_SCALE_FACTOR, AutoencoderKL, VAEConfig

__all__ = ["SwapConfig", "FaceSwapper", "clip_normalize", "un_norm"]


def un_norm(x):
    """[-1,1] -> [0,1]."""
    return (x + 1.0) / 2.0


def clip_normalize(x01, size: int = 224):
    """[0,1] NHWC image -> CLIP-normalized at size x size (bilinear)."""
    b, h, w, c = x01.shape
    if (h, w) != (size, size):
        x01 = jax.image.resize(x01, (b, size, size, c), "bilinear")
    return (x01 - CLIP_MEAN) / CLIP_STD


@dataclasses.dataclass(frozen=True)
class SwapConfig:
    unet: UNetConfig = UNetConfig()
    vae: VAEConfig = VAEConfig()
    conditioner: ConditionerConfig = ConditionerConfig()
    ddim_steps: int = 50
    cfg_scale: float = 3.0
    # serving mode: CFG only on the first cfg_steps high-noise steps
    # (0 = reference protocol, CFG on every step)
    cfg_steps: int = 0
    eta: float = 0.0
    sampler: str = "ddim"  # "ddim" | "plms" | "dpm" (DPM-Solver++(2M))
    # timestep-subset spacing: "uniform"/"quad" (reference parity) or
    # "lam_uniform" (logSNR-uniform — the grid DPM-Solver++ wants; the
    # t-uniform grid's terminal lam-jump costs it its 2nd-order advantage)
    ddim_discretize: str = "uniform"
    image_size: int = 512
    latent_size: int = 64
    sample_posterior: bool = True  # reference samples the VAE posterior
    start_noise_t: int = 999  # target_start_noise_t for prior starts
    # Overlapping spatial fold/unfold tiling for the VAE (split_input_params
    # parity, ddpm.py:1286-1434): 0 = off; vae_tile is in LATENT pixels for
    # decode and is multiplied by the VAE downsample factor for encode.
    vae_tile: int = 0
    vae_tile_stride: int = 0  # 0 = vae_tile // 2
    # Overlapping tiling for the UNet apply itself (the other half of
    # split_input_params, ddpm.py:1530-1608: per-patch eps with the SAME
    # crossattn cond, weighted fold). 0 = off; latent pixels. TPU-native:
    # all tiles run as ONE batched UNet call, not a per-patch loop.
    unet_tile: int = 0
    unet_tile_stride: int = 0  # 0 = unet_tile // 2
    # exact CFG prefix dedup: compute the context-independent UNet prefix
    # once per CFG pair (UNetModel cfg_expand). Identical math to the
    # batch-doubled cfg_eps; ~10% less UNet compute.
    cfg_dedup: bool = True


class SwapModules:
    """Stateless module container shared by inference and training: the
    three flax towers + per-stage helpers, all taking params explicitly."""

    def __init__(self, config: SwapConfig):
        self.config = config
        self.unet = UNetModel(config.unet)
        self.vae = AutoencoderKL(config.vae)
        self.conditioner = REFaceConditioner(config.conditioner)

    @property
    def _vae_factor(self) -> int:
        return self.config.image_size // self.config.latent_size

    def encode_latent(self, params, image, key=None):
        cfg = self.config

        def enc(img):
            post = self.vae.apply(
                params["vae"], img, method=AutoencoderKL.encode
            )
            z = post.sample(key) if key is not None else post.mode()
            return z * SD_SCALE_FACTOR

        f = self._vae_factor
        if cfg.vae_tile and image.shape[1] > cfg.vae_tile * f:
            from reface_tpu.parallel.tiling import tiled_apply

            tile = cfg.vae_tile * f
            stride = (cfg.vae_tile_stride or cfg.vae_tile // 2) * f
            return tiled_apply(enc, image, tile, stride,
                               out_channels=4, scale=1.0 / f)
        return enc(image)

    def decode_latent(self, params, z):
        cfg = self.config

        def dec(zz):
            img = self.vae.apply(
                params["vae"], zz / SD_SCALE_FACTOR,
                method=AutoencoderKL.decode,
            )
            return jnp.clip(img, -1.0, 1.0)

        if cfg.vae_tile and z.shape[1] > cfg.vae_tile:
            from reface_tpu.parallel.tiling import tiled_apply

            stride = cfg.vae_tile_stride or cfg.vae_tile // 2
            return tiled_apply(dec, z, cfg.vae_tile, stride,
                               out_channels=3, scale=self._vae_factor)
        return dec(z)

    def build_context(self, params, ref_clip224, target_image, landmarks):
        """Fused conditioning: CLIP(src)+CLIP(tar)+ID(src)+landmarks(tar)."""
        tar224 = clip_normalize(un_norm(target_image))
        c = self.conditioner.apply(
            params["conditioner"], ref_clip224, tar224, landmarks
        )
        uc = self.conditioner.apply(
            params["conditioner"],
            c.shape[0],
            method=REFaceConditioner.null_conditioning,
        )
        return c, uc

    def unet_eps(self, params, x9, t, context):
        cfg = self.config
        if cfg.unet_tile and x9.shape[1] > cfg.unet_tile:
            # split_input_params UNet apply (ddpm.py:1530-1608): overlapping
            # patches, same cond per patch, border-weighted fold of eps.
            # unfold groups tile-major ([tile0 x B, tile1 x B, ...]), so
            # t/context broadcast by whole-batch repetition.
            from reface_tpu.parallel.tiling import tiled_apply

            stride = cfg.unet_tile_stride or cfg.unet_tile // 2
            b = x9.shape[0]

            def fn(tiles):
                n = tiles.shape[0] // b
                tt = jnp.tile(t, (n,))
                cc = jnp.tile(context, (n, 1, 1))
                return self.unet.apply(params["unet"], tiles, tt, cc)

            return tiled_apply(fn, x9, cfg.unet_tile, stride, out_channels=4)
        return self.unet.apply(params["unet"], x9, t, context)

    def unet_eps_cfg_dedup(self, params, x9, t, context_pair):
        """x9/t at B, context_pair at 2B (uncond first) -> eps at 2B."""
        return self.unet.apply(
            params["unet"], x9, t, context_pair, cfg_expand=True
        )


class FaceSwapper(SwapModules):
    """SwapModules + params + sampler tables, exposing one jitted `swap`.

    params: {"unet": ..., "vae": ..., "conditioner": ...} flax param trees.
    """

    def __init__(self, config: SwapConfig, params: dict[str, Any]):
        super().__init__(config)
        if config.sampler in ("plms", "dpm") and config.eta != 0.0:
            # Both solvers discretize the deterministic probability-flow
            # ODE; silently ignoring a stochastic eta would run a different
            # process than the config asks for (reference's eta lives only
            # in the DDIM update, ddim.py:352-374).
            raise ValueError(
                f"sampler={config.sampler!r} is deterministic (eta=0 only); "
                f"got eta={config.eta}. Use sampler='ddim' for eta>0."
            )
        self.params = params
        self.schedule = DiffusionSchedule.create()
        self.tables = DDIMTables.create(
            self.schedule, config.ddim_steps, eta=config.eta,
            method=config.ddim_discretize,
        )
        self._jit_swap = jax.jit(self._swap_impl)

    # ---- the fused program ----

    def _swap_impl(
        self,
        params,
        target_image,  # (B,512,512,3) in [-1,1]
        inpaint_image,  # (B,512,512,3) masked target, [-1,1]
        inpaint_mask,  # (B,512,512,1) 1=keep, 0=inpaint region
        ref_clip224,  # (B,224,224,3) CLIP-normalized source crop
        landmarks,  # (B,136) target 68-landmark pixel coords, or None
        key,  # PRNG key
        x_T=None,  # optional fixed initial noise (B,h,w,4)
        prior_image=None,  # optional (B,S,S,3) prior in [-1,1] to start from
    ):
        cfg = self.config
        k_noise, k_enc, k_prior = jax.random.split(key, 3)
        c, uc = self.build_context(params, ref_clip224, target_image, landmarks)
        z_inpaint = self.encode_latent(
            params, inpaint_image, k_enc if cfg.sample_posterior else None
        )
        b = target_image.shape[0]
        hw = cfg.latent_size
        # torch Resize semantics (no antialias) for the latent mask
        from reface_tpu.ops.resize import resize_bilinear_no_aa

        mask_latent = resize_bilinear_no_aa(inpaint_mask, hw, hw)
        if x_T is None and prior_image is not None:
            # Start_from_target/prior: q_sample the prior's latent at
            # start_noise_t (inference_test_bench.py:414-436 semantics)
            z_p = self.encode_latent(params, prior_image, k_prior)
            t0 = jnp.full((b,), cfg.start_noise_t, jnp.int32)
            noise = jax.random.normal(k_noise, z_p.shape, z_p.dtype)
            x_T = self.schedule.q_sample(z_p, t0, noise)
        elif x_T is None:
            x_T = jax.random.normal(k_noise, (b, hw, hw, 4), jnp.float32)
        model_fn = partial(self.unet_eps, params)
        if cfg.sampler == "plms":
            z = plms_sample(
                model_fn, x_T, c, uc, z_inpaint, mask_latent, self.tables,
                cfg.cfg_scale,
            )
        elif cfg.sampler == "dpm":
            z = dpm_solver_sample(
                model_fn, x_T, c, uc, z_inpaint, mask_latent, self.tables,
                cfg.cfg_scale,
                cfg_steps=cfg.cfg_steps or None,
                dedup_model_fn=(
                    partial(self.unet_eps_cfg_dedup, params)
                    # dedup's cfg_expand path bypasses unet_eps, so the
                    # tiled apply wins over the prefix dedup when both are on
                    if cfg.cfg_dedup and not cfg.unet_tile else None
                ),
            )
        else:
            z = ddim_sample(
                model_fn, x_T, c, uc, z_inpaint, mask_latent, self.tables,
                cfg.cfg_scale, eta=cfg.eta,
                key=k_noise if cfg.eta != 0 else None,
                cfg_steps=cfg.cfg_steps or None,
                dedup_model_fn=(
                    partial(self.unet_eps_cfg_dedup, params)
                    # dedup's cfg_expand path bypasses unet_eps, so the
                    # tiled apply wins over the prefix dedup when both are on
                    if cfg.cfg_dedup and not cfg.unet_tile else None
                ),
            )
        return self.decode_latent(params, z)

    def swap(
        self,
        target_image,
        inpaint_image,
        inpaint_mask,
        ref_clip224,
        landmarks=None,
        key=None,
        x_T=None,
        prior_image=None,
    ):
        """Run one fully-fused swap; returns (B,512,512,3) images in [-1,1]."""
        if key is None:
            key = jax.random.key(0)
        return self._jit_swap(
            self.params, target_image, inpaint_image, inpaint_mask,
            ref_clip224, landmarks, key, x_T, prior_image,
        )

    def swap_guided(
        self,
        target_image,
        inpaint_image,
        inpaint_mask,
        ref_clip224,
        landmarks=None,
        key=None,
        guidance: tuple = ("id",),
        guidance_scale: float = 1.0,
        id_weight: float = 1.0,
        seg_weight: float = 10.0,
        exp_weight: float = 100.0,
        seg_logits_fn=None,
        exp_coeff_fn=None,
    ):
        """Gradient-guided swap (ddim_guided.py:380-609 semantics).

        guidance: subset of ("id", "seg", "exp"). "seg"/"exp" require
        seg_logits_fn ([-1,1] image -> (B,H,W,19) BiSeNet logits) resp.
        exp_coeff_fn ([0,1] image -> (B,64) D3DFR exp coeffs) — the driver
        wires these from its towers. "id" uses the swapper's own ArcFace
        via the IDLoss pool/crop protocol (ddpm.py:112-124).
        """
        from reface_tpu.diffusion.ddim_guided import guided_ddim_sample
        from reface_tpu.diffusion.guidance import (
            combine_guidance,
            make_expression_guidance,
            make_id_guidance,
            make_seg_guidance,
        )
        from reface_tpu.nn.arcface import CLIP_MEAN, CLIP_STD
        from reface_tpu.ops.pooling import adaptive_avg_pool2d
        from reface_tpu.ops.resize import resize_bilinear_no_aa

        if key is None:
            key = jax.random.key(0)
        cfg = self.config
        params = self.params

        def impl(params, target_image, inpaint_image, inpaint_mask,
                 ref_clip224, landmarks, key):
            k_noise, k_enc = jax.random.split(key)
            c, uc = self.build_context(
                params, ref_clip224, target_image, landmarks
            )
            z_inpaint = self.encode_latent(
                params, inpaint_image, k_enc if cfg.sample_posterior else None
            )
            b = target_image.shape[0]
            hw = cfg.latent_size
            mask_latent = resize_bilinear_no_aa(inpaint_mask, hw, hw)
            x_T = jax.random.normal(k_noise, (b, hw, hw, 4), jnp.float32)

            decode_fn = lambda z: self.decode_latent(params, z)
            inpaint_region = 1.0 - inpaint_mask  # 1 = generated region

            def embed_id_fn(img_pm1):
                from reface_tpu.nn.arcface import ARC_FACE_CROP

                x = adaptive_avg_pool2d(img_pm1, 256, 256)
                tc, bc, lc, rc = ARC_FACE_CROP
                x = adaptive_avg_pool2d(x[:, tc:bc, lc:rc, :], 112, 112)
                return self.conditioner.apply(
                    params["conditioner"], method=lambda m, xx: m.face_id(xx),
                    xx=x,
                )

            fns = []
            if "id" in guidance:
                src_pm1 = (ref_clip224 * CLIP_STD + CLIP_MEAN) * 2.0 - 1.0
                fns.append(make_id_guidance(
                    decode_fn, embed_id_fn, src_pm1,
                    inpaint_region=inpaint_region, weight=id_weight,
                ))
            if "seg" in guidance:
                fns.append(make_seg_guidance(
                    decode_fn, seg_logits_fn, target_image, weight=seg_weight,
                ))
            if "exp" in guidance:
                fns.append(make_expression_guidance(
                    decode_fn, exp_coeff_fn, target_image,
                    inpaint_region=inpaint_region, weight=exp_weight,
                ))

            z = guided_ddim_sample(
                partial(self.unet_eps, params),
                combine_guidance(*fns),
                x_T, c, uc, z_inpaint, mask_latent, self.tables,
                cfg_scale=cfg.cfg_scale, guidance_scale=guidance_scale,
            )
            return self.decode_latent(params, z)

        cache_key = (tuple(sorted(guidance)), guidance_scale, id_weight,
                     seg_weight, exp_weight, id(seg_logits_fn),
                     id(exp_coeff_fn))
        cache = getattr(self, "_guided_cache", None)
        if cache is None:
            cache = self._guided_cache = {}
        if cache_key not in cache:
            cache[cache_key] = jax.jit(impl)
        return cache[cache_key](
            params, target_image, inpaint_image, inpaint_mask, ref_clip224,
            landmarks, key,
        )

    # ---- init helpers ----

    @staticmethod
    def init_params(config: SwapConfig, key: jax.Array, batch: int = 1):
        """Random-init all towers (for tests/bench without checkpoints).

        Inits are jitted: un-jitted flax init dispatches hundreds of ops
        one-by-one, which is very slow over the axon tunnel."""
        k1, k2, k3 = jax.random.split(key, 3)
        unet = UNetModel(config.unet)
        vae = AutoencoderKL(config.vae)
        cond = REFaceConditioner(config.conditioner)
        hw = config.latent_size
        params = {
            "unet": jax.jit(unet.init)(
                k1,
                jnp.zeros((batch, hw, hw, 9)),
                jnp.zeros((batch,), jnp.int32),
                jnp.zeros((batch, 1, config.conditioner.context_dim)),
            ),
            "vae": jax.jit(vae.init)(
                k2, jnp.zeros((batch, config.image_size, config.image_size, 3))
            ),
            "conditioner": jax.jit(cond.init)(
                k3,
                jnp.zeros((batch, 224, 224, 3)),
                jnp.zeros((batch, 224, 224, 3)),
                jnp.zeros((batch, config.conditioner.landmark_dim)),
            ),
        }
        return params


def tiny_swap_config(image_size: int = 64, ddim_steps: int = 4) -> SwapConfig:
    """A miniature config for tests and CPU smoke runs."""
    f32 = jnp.float32
    from reface_tpu.nn.arcface import ArcFaceConfig
    from reface_tpu.nn.clip import CLIPVisionConfig

    latent = image_size // 8
    return SwapConfig(
        unet=UNetConfig(
            model_channels=32,
            num_heads=4,
            channel_mult=(1, 2),
            attention_resolutions=(1, 2),
            dtype=f32,
        ),
        vae=VAEConfig(ch=16, ch_mult=(1, 2, 2, 2), num_res_blocks=1, dtype=f32),
        conditioner=ConditionerConfig(
            clip=CLIPVisionConfig(
                hidden=64, layers=1, heads=4, patch=56, image_size=224, dtype=f32
            ),
            arcface=ArcFaceConfig(depths=(8, 16, 16, 16), units=(1, 1, 1, 1), dtype=f32),
        ),
        ddim_steps=ddim_steps,
        image_size=image_size,
        latent_size=latent,
    )
