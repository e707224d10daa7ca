"""Full REFace training loss: eps-MSE + k-step DDIM reconstruction ID/LPIPS.

Behavioral parity target (semantics, not code):
  /root/reference/ldm/models/diffusion/ddpm.py:1679-1837 (p_losses_face) and
  ldm/models/diffusion/ddim.py:378-569 (sample_train):

  1. loss_simple: eps-MSE at random t, q_sample on the 4 live channels, the
     9-ch stack re-assembled before the UNet.
  2. reconstruction: q_sample the SAME noise at t_new = T-1 (999); run a
     k=4-step differentiable DDIM whose model timesteps follow the
     per-sample sequence flip(range(1, t_new-1, (t_new-1)//k)[:k]) (for
     t_new=999, k=4: [748, 499, 250, 1]) while the alpha/sigma scalars come
     from the standard k-step DDIM tables; NO CFG (the reference passes
     uncond=None so the scale is ignored, ddim.py:527-529).
  3. conditioning for the reconstruction uses the *flipped* batch's
     reference (different source identity), recomputed through the fusion
     (ddpm.py:1712-1729, Same_image_reconstruct=False).
  4. collected pred_x0 set = [initial noisy latent, first-step pred_x0,
     last-step pred_x0] (the log_every_t=100 schedule over 4 steps), each
     differentiably decoded.
  5. ID loss: ArcFace cosine (1 - cos) between each decode masked to the
     inpaint region and the flipped reference ([-1,1] normalized), averaged
     over decodes (Multiple_ID_losses), weight 0.3.
  6. LPIPS loss: sum over decodes x scales (512/256/128 adaptive-avg-pooled)
     vs the ground-truth target, weight 0.1.

TPU-first: the k-step recon is a lax.scan with static per-step index tables;
decodes/towers run under the same jit; use UNetConfig.remat for memory.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from reface_tpu.core.schedules import DDIMTables, DiffusionSchedule
from reface_tpu.diffusion.ddim import ddim_step

__all__ = ["ReconLossConfig", "recon_timestep_seq", "ddim_reconstruct",
           "avg_pool_to", "id_cosine_loss", "reface_losses",
           "recon_collect", "recon_tower_losses"]


@dataclasses.dataclass(frozen=True)
class ReconLossConfig:
    ddim_steps: int = 4  # Reconstruct_DDIM_steps (configs/train.yaml)
    id_weight: float = 0.3
    lpips_weight: float = 0.1
    landmark_weight: float = 0.0
    lpips_scales: tuple = (1, 2, 4)  # full, /2, /4
    flip_reference: bool = True  # Same_image_reconstruct=False


def recon_timestep_seq(t_new: int, k: int) -> list[int]:
    """flip(range(1, t_new-1, max(1,(t_new-1)//k))[:k]) — ddim.py:462-478."""
    skip = max(1, (t_new - 1) // k)
    seq = list(range(1, t_new - 1, skip))[:k]
    return seq[::-1]


def avg_pool_to(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Adaptive average pool NHWC to (size, size) for exact-divisor inputs."""
    b, h, w, c = x.shape
    if h == size:
        return x
    f = h // size
    return x.reshape(b, size, f, size, f, c).mean(axis=(2, 4))


def id_cosine_loss(embed_fn: Callable, pred_img: jnp.ndarray,
                   ref_img: jnp.ndarray) -> jnp.ndarray:
    """mean(1 - cos(f(pred), stop_grad(f(ref)))) with l2-normed embeddings."""
    f_pred = embed_fn(pred_img)
    f_ref = jax.lax.stop_gradient(embed_fn(ref_img))
    return jnp.mean(1.0 - jnp.sum(f_pred * f_ref, axis=-1))


def ddim_reconstruct(
    unet_fn: Callable,  # (x9, t(B,), cond) -> eps
    x_noisy4: jnp.ndarray,  # (B,h,w,4) q_sampled at t_new
    rest: jnp.ndarray,  # (B,h,w,5) inpaint latent + mask channels
    cond: jnp.ndarray,
    schedule: DiffusionSchedule,
    k: int = 4,
    t_new: int | None = None,
):
    """k-step differentiable DDIM from t_new. Returns [pred_x0 first, last]
    latents plus the final sample, matching sample_train's collection."""
    if t_new is None:
        t_new = schedule.num_timesteps - 1
    seq_list = recon_timestep_seq(t_new, k)
    k = len(seq_list)  # short t_new yields fewer steps (reference truncation)
    seq = jnp.asarray(seq_list, jnp.int32)
    tables = DDIMTables.create(schedule, k, eta=0.0)
    # scalars indexed by "index" = k-1-i (descending), from the k-step tables
    rev = lambda a: a[::-1]
    xs = (
        seq,
        rev(tables.alphas),
        rev(tables.alphas_prev),
        rev(tables.sqrt_one_minus_alphas),
        jnp.arange(k),
    )
    b = x_noisy4.shape[0]

    def body(carry, scan_in):
        x, first_pred = carry
        t, a_t, a_prev, s1m, i = scan_in
        x9 = jnp.concatenate([x, rest], axis=-1)
        eps = unet_fn(x9, jnp.full((b,), t, jnp.int32), cond)
        x_prev, pred_x0 = ddim_step(x, eps, a_t, a_prev, s1m, 0.0)
        first_pred = jnp.where(i == 0, pred_x0, first_pred)
        return (x_prev, first_pred), pred_x0

    (x_final, first_pred), preds = jax.lax.scan(
        body, (x_noisy4, jnp.zeros_like(x_noisy4)), xs
    )
    last_pred = preds[-1]
    return [x_noisy4, first_pred, last_pred], x_final


def reface_losses(
    *,
    unet_fn: Callable,
    decode_fn: Callable,  # latent (B,h,w,4) -> image (B,S,S,3), differentiable
    embed_id_fn: Callable,  # [-1,1] image -> (B,512) l2-normed ArcFace
    lpips_fn: Callable | None,  # (x, y) -> (B,) distances
    conditioning_fn: Callable,  # (ref_clip224, landmarks) -> (B,1,768)
    # optional landmark aux loss (ddpm.py:1692-1693,1799-1803): the eps-MSE
    # forward also returns decoder features; the aux head predicts 136-d
    # landmarks from cat(features[9:11]) and is trained with MSE
    unet_features_fn: Callable | None = None,  # (x9,t,c) -> (eps, features)
    landmark_head_fn: Callable | None = None,  # (B,h,w,C) -> (B,136)
    schedule: DiffusionSchedule,
    cfg: ReconLossConfig,
    # data
    z_start9: jnp.ndarray,  # (B,h,w,9) latent stack [z, z_inpaint, mask]
    cond: jnp.ndarray,  # conditioning used for the eps-MSE forward
    ref_clip224: jnp.ndarray,  # (B,224,224,3) CLIP-normalized reference
    gt_image: jnp.ndarray,  # (B,S,S,3) in [-1,1]
    landmarks: jnp.ndarray | None,
    t: jnp.ndarray,  # (B,) int
    key: jax.Array,
    portion: str = "both",  # "both" | "eps" | "recon" (split-grad programs)
):
    """Returns (total_loss, metrics dict). All stages share one jit.

    portion selects which additive term of the loss is built — the
    split-grad train step (pipelines/train.py) compiles "eps" and "recon"
    as separate TPU programs and sums their gradients, which is exact
    because the total is a sum of the two portions over identical inputs
    (same key -> same noise/t/dropout in both programs).
    """
    from reface_tpu.data.augment import CLIP_MEAN_NP, CLIP_STD_NP

    z4 = z_start9[..., :4]
    rest = z_start9[..., 4:]
    noise = jax.random.normal(key, z4.shape, z4.dtype)
    metrics = {}
    total = 0.0

    # ---- 1. eps-MSE (+ optional landmark aux head on the same forward)
    if portion in ("both", "eps"):
        z_t = schedule.q_sample(z4, t, noise)
        x9 = jnp.concatenate([z_t, rest], axis=-1)
        use_lm_head = (
            cfg.landmark_weight > 0
            and unet_features_fn is not None
            and landmark_head_fn is not None
            and landmarks is not None
        )
        if use_lm_head:
            eps_pred, features = unet_features_fn(x9, t, cond)
            # ref: cat(features[9:11]) — the two 64x64 320-ch decoder taps of
            # the full UNet (ddpm.py:1691); clamp for reduced test configs
            i0 = min(9, len(features) - 2)
            feat_cat = jnp.concatenate(
                [features[i0], features[i0 + 1]], axis=-1
            )
            lm_pred = landmark_head_fn(feat_cat)
            loss_landmark = jnp.mean((lm_pred - landmarks) ** 2)
        else:
            eps_pred = unet_fn(x9, t, cond)
        loss_simple = jnp.mean((noise - eps_pred) ** 2)
        metrics["loss_simple"] = loss_simple
        total = total + loss_simple
        if use_lm_head:
            metrics["loss_landmark"] = loss_landmark
            total = total + cfg.landmark_weight * loss_landmark

    if portion == "eps" or (cfg.id_weight <= 0 and cfg.lpips_weight <= 0):
        return total, metrics

    pred_latents, ref_flip = recon_collect(
        unet_fn=unet_fn, conditioning_fn=conditioning_fn, schedule=schedule,
        cfg=cfg, z_start9=z_start9, cond=cond, ref_clip224=ref_clip224,
        landmarks=landmarks, t=t, key=key,
    )
    recon_total, recon_metrics = recon_tower_losses(
        decode_fn=decode_fn, embed_id_fn=embed_id_fn, lpips_fn=lpips_fn,
        cfg=cfg, pred_latents=pred_latents, ref_flip=ref_flip, rest=rest,
        gt_image=gt_image,
    )
    metrics.update(recon_metrics)
    total = total + recon_total
    metrics["loss"] = total
    return total, metrics


def recon_collect(
    *,
    unet_fn: Callable,
    conditioning_fn: Callable,
    schedule: DiffusionSchedule,
    cfg: ReconLossConfig,
    z_start9: jnp.ndarray,
    cond: jnp.ndarray,
    ref_clip224: jnp.ndarray,
    landmarks: jnp.ndarray | None,
    t: jnp.ndarray,
    key: jax.Array,
):
    """Stage 2 of p_losses_face: the k-step DDIM reconstruction chain from
    t_new = T-1 with the SAME noise the eps-MSE used (identical `key`).
    Returns (pred_latents tuple, ref_flip). Factored out so the split-grad
    train step can compile it (and its cotangent pullback) as standalone
    programs."""
    z4 = z_start9[..., :4]
    rest = z_start9[..., 4:]
    noise = jax.random.normal(key, z4.shape, z4.dtype)
    t_new = schedule.num_timesteps - 1
    z_noisy = schedule.q_sample(z4, jnp.full_like(t, t_new), noise)
    if cfg.flip_reference:
        ref_flip = ref_clip224[::-1]
        recon_cond = conditioning_fn(ref_flip, landmarks)
    else:
        ref_flip = ref_clip224
        recon_cond = cond
    pred_latents, _ = ddim_reconstruct(
        unet_fn, z_noisy, rest, recon_cond, schedule, k=cfg.ddim_steps,
        t_new=t_new,
    )
    return tuple(pred_latents), ref_flip


def recon_tower_losses(
    *,
    decode_fn: Callable,
    embed_id_fn: Callable,
    lpips_fn: Callable | None,
    cfg: ReconLossConfig,
    pred_latents,
    ref_flip: jnp.ndarray,
    rest: jnp.ndarray,
    gt_image: jnp.ndarray,
):
    """Stages 3-4 of p_losses_face: decode the collected latents and apply
    the ID/LPIPS towers. Returns (weighted recon total, metrics). All tower
    params are frozen, so in the split-grad step this differentiates only
    w.r.t. pred_latents (the cotangents the scan pullback consumes)."""
    from reface_tpu.data.augment import CLIP_MEAN_NP, CLIP_STD_NP

    metrics = {}
    total = 0.0
    # The collected latents run the decoder/ID/LPIPS towers SEQUENTIALLY
    # under a rematerialized lax.scan: mathematically identical to the
    # reference's per-decode losses (all towers are per-sample:
    # GroupNorm/LayerNorm/eval-mode BatchNorm; mean over n_dec*B == mean
    # over decodes of per-decode means), HLO holds ONE tower instance (the
    # three-separate-instance program crashed the TPU compile helper at
    # 512px) and the checkpointed body bounds HBM to a single decode's
    # backward (the 3-stacked variant's backward measured 14.5G of XLA
    # temps — tools/probe_split_mem.py — and OOM'd a 16G v5e).
    n_dec = len(pred_latents)
    preds = jnp.stack(pred_latents)  # (n_dec, B, h, w, 4)
    s = gt_image.shape[1]
    keep_mask = rest[..., -1:]  # latent-res keep mask (1=keep)
    mask_img = 1.0 - jax.image.resize(keep_mask, (keep_mask.shape[0], s, s, 1),
                                      "bilinear")
    # reference back to [-1,1] pixel space (un-CLIP-norm then x2-1)
    mean = jnp.asarray(CLIP_MEAN_NP)
    std = jnp.asarray(CLIP_STD_NP)
    ref_pm1 = (ref_flip * std + mean) * 2.0 - 1.0
    f_ref = jax.lax.stop_gradient(embed_id_fn(ref_pm1))  # embed ref ONCE

    # scales where AlexNet's stride-4 conv + maxpools don't collapse to
    # zero-size maps (NaN); the 512px protocol scales (512/256/128) all pass
    use_lpips = lpips_fn is not None and cfg.lpips_weight > 0
    scales = [f for f in cfg.lpips_scales if s // f >= 32] if use_lpips else []
    gt_scaled = [avg_pool_to(gt_image, s // f) for f in scales]

    def tower_body(carry, pred):
        dec = decode_fn(pred)  # (B, s, s, 3)
        f_pred = embed_id_fn(dec * mask_img)
        idc = jnp.mean(1.0 - jnp.sum(f_pred * f_ref, axis=-1))
        lps = [jnp.mean(lpips_fn(avg_pool_to(dec, s // f), g))
               for f, g in zip(scales, gt_scaled)]
        return carry + jnp.stack([idc] + lps), None

    sums, _ = jax.lax.scan(
        jax.checkpoint(tower_body),
        jnp.zeros((1 + len(scales),), preds.dtype), preds,
    )
    id_loss = sums[0] / n_dec  # mean over decodes of per-decode means
    metrics["id_loss"] = id_loss
    total = total + cfg.id_weight * id_loss
    if use_lpips:
        lp = jnp.sum(sums[1:])  # sum over decodes x scales of means
        metrics["lpips_loss"] = lp
        total = total + cfg.lpips_weight * lp

    return total, metrics
