"""Data-parallel training step (pjit over a `data` mesh axis).

Behavioral parity targets (semantics, not code):
  - loss core:    ldm/models/diffusion/ddpm.py:1679-1837 (p_losses_face):
                  eps-MSE on q_sampled 4-ch latent re-concatenated to 9ch
                  (+ DDIM-reconstruction ID/LPIPS losses, staged separately in
                  reface_tpu/diffusion/losses.py as they land).
  - CFG dropout:  ddpm.py:1489-1502 — u_cond_percent=0.2 of samples get the
                  learnable null token instead of the fused conditioning.
  - trainables:   ddpm.py:2175-2219 + modules.py:248-251 — UNet, mapper2,
                  final_ln2, proj_out_source/target, ID_proj_out,
                  landmark_proj_out, learnable_vector. VAE / CLIP tower /
                  ArcFace are frozen.
  - optimizer:    AdamW, base lr 1e-5, LambdaLinear 10k-step warmup
                  (configs/train.yaml:22-29, main.py:719-727).

TPU-native: one jitted step; batch sharded over `data`, params replicated;
XLA inserts the gradient psum over ICI (the DDP equivalent). bf16 compute,
fp32 params/optimizer state; UNet blocks rematerialized via UNetConfig.remat.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from reface_tpu.core.schedules import DiffusionSchedule
from reface_tpu.pipelines.swap import (
    FaceSwapper,
    SwapConfig,
    SwapModules,
    clip_normalize,
    un_norm,
)
from reface_tpu.nn.conditioner import REFaceConditioner

__all__ = ["TrainConfig", "TrainState", "make_optimizer", "trainable_labels",
           "make_train_step"]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-5
    warmup_steps: int = 10_000
    weight_decay: float = 1e-2
    u_cond_percent: float = 0.2
    num_timesteps: int = 1000
    grad_clip: Optional[float] = None
    ema_decay: Optional[float] = None  # shipped config: use_ema False
    # EMA shadow dtype. None = param dtype (fp32, LitEma parity). bfloat16
    # halves the shadow's HBM (-1.7G at 860M trainable) — required to run
    # EMA at real size on a single 16G v5e (core/ema.py docstring).
    ema_dtype: Optional[str] = None
    accumulate: int = 1  # Lightning accumulate_grad_batches equivalent
    # Compile the full loss as multiple programs instead of one monolith —
    # numerically exact (gradients of sums are sums of gradients over
    # identical inputs; the tower/scan boundary chains exact cotangents) —
    # needed on the real chip where the single-program full-loss backward
    # exceeds the TPU compiler's program-size limit (BENCH_LOG.md round 3).
    #   0/False: monolith.  1/True: two programs (recon-grad, then
    #   eps-grad + grad-sum + update).  2: four programs (recon forward ->
    #   tower grad w.r.t. the collected latents -> scan cotangent pullback
    #   -> eps-grad + sum + update), each smaller than the 2-way halves.
    split_grad: int = 0
    # dtype of the inter-program gradient accumulator. float32 is exact;
    # bfloat16 halves its HBM residency (the accumulator is what pushes a
    # single 16G v5e over the edge at 512px: params 4.5G + AdamW moments
    # ~7G + trainable grads 3.5G) at the cost of rounding the RECON grad
    # contribution to bf16 before the sum — not bit-exact, but the noise is
    # ~1e-3 relative, far below SGD noise. Multi-chip TP shards all three
    # trees and needs no compromise.
    split_acc_dtype: str = "float32"
    # AdamW first-moment dtype (optax mu_dtype). bfloat16 halves the
    # moment's persistent HBM (−1.8 GB at 860M trainable params) — the
    # standard large-model practice when a chip is memory-bound; float32
    # is the reference-parity default.
    mu_dtype: Optional[str] = None
    # UNet block rematerialization for the training step. The inference
    # SwapConfig ships unet.remat=False; training at 512px needs it (the
    # k-step recon scan's pullback otherwise SAVES every per-step UNet
    # activation — fp32 GroupNorm-reshape residuals padded up to 6.4x —
    # measured 11.53G of XLA temps, OOM on a 16G v5e, vs 3.7G with remat).
    # True: force remat on (default). False: honor swap_cfg.unet.remat
    # as given (the compile-bisection escape hatch, bench_train_step
    # --no-remat).
    force_unet_remat: bool = True


def trainable_labels(params: dict[str, Any]):
    """'train' / 'freeze' label tree matching the reference's grad partition."""
    frozen_conditioner_prefixes = ("face_id",)
    frozen_clip_prefixes = ("tower",)

    def label_path(path) -> str:
        keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        if keys[0] == "unet":
            return "train"
        if keys[0] in ("vae", "lpips"):
            return "freeze"
        # conditioner subtree
        if "face_id" in keys or "tower" in keys:
            return "freeze"
        return "train"

    return jax.tree_util.tree_map_with_path(lambda p, _: label_path(p), params)


def stop_gradient_frozen(params):
    """stop_gradient on every 'freeze'-labeled leaf — the reference's
    requires_grad=False. Without this, value_and_grad over the full tree
    builds gradients AND the backward weight-grad computations for the
    frozen VAE/CLIP/ArcFace/LPIPS towers, only for the optimizer mask to
    zero them; at 512px full losses that wasted backward graph alone
    overflows v5e HBM (RESOURCE_EXHAUSTED, BENCH_LOG.md round 3)."""
    labels = trainable_labels(params)
    return jax.tree.map(
        lambda p, l: jax.lax.stop_gradient(p) if l == "freeze" else p,
        params, labels,
    )


def make_optimizer(cfg: TrainConfig, params):
    sched = optax.linear_schedule(
        init_value=cfg.learning_rate * 1e-6,
        end_value=cfg.learning_rate,
        transition_steps=cfg.warmup_steps,
    )
    tx = optax.adamw(sched, weight_decay=cfg.weight_decay,
                     mu_dtype=cfg.mu_dtype and jnp.dtype(cfg.mu_dtype))
    if cfg.grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    tx = optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, trainable_labels(params)
    )
    if cfg.accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulate)
    return tx


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    ema: Any = None  # EmaState of the trainable subtree, or None

    @staticmethod
    def create(params, tx, ema_decay=None, ema_dtype=None):
        ema = None
        if ema_decay is not None:
            from reface_tpu.core.ema import EmaState

            ema = EmaState.create(params["unet"], decay=ema_decay,
                                  dtype=ema_dtype)
        return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32),
                          ema)


def resolve_train_swap_cfg(swap_cfg: SwapConfig, train_cfg: TrainConfig,
                           recon) -> SwapConfig:
    """Training-mode overrides of an (inference-defaulted) SwapConfig.

    - smalld inference attention kernels define no VJP; self-attention
      routes through the differentiable flash path
    - the recon loss differentiates through the VAE decoder; without block
      remat its 512px backward alone allocates ~14.5G of XLA temps
      (tools/probe_split_mem.py) — more than a whole v5e
    - UNet block remat (TrainConfig.force_unet_remat): the inference
      default remat=False makes the k-step recon scan's pullback save
      every per-step UNet activation (fp32 GroupNorm-reshape residuals,
      (k,B,64,64,32,C/32) tiles padded up to 6.4x) — measured 11.53G of
      XLA temps, OOM on a 16G v5e, vs 3.7G with remat
    """
    if swap_cfg.unet.attn_impl in ("auto", "fast"):
        swap_cfg = dataclasses.replace(
            swap_cfg,
            unet=dataclasses.replace(swap_cfg.unet, attn_impl="flash"),
        )
    if recon is not None and not swap_cfg.vae.remat:
        swap_cfg = dataclasses.replace(
            swap_cfg, vae=dataclasses.replace(swap_cfg.vae, remat=True)
        )
    if train_cfg.force_unet_remat and not swap_cfg.unet.remat:
        swap_cfg = dataclasses.replace(
            swap_cfg, unet=dataclasses.replace(swap_cfg.unet, remat=True)
        )
    return swap_cfg


def make_train_step(swap_cfg: SwapConfig, train_cfg: TrainConfig,
                    recon: "ReconLossConfig | None" = None):
    """Returns (train_step, loss_fn, init_state). Batch keys:
    target_image, inpaint_image, inpaint_mask, ref_clip224, landmarks.

    recon: optional ReconLossConfig enabling the full p_losses_face parity
    (k-step DDIM reconstruction + ID/LPIPS). When set, params must also
    contain a "lpips" tree if recon.lpips_weight > 0.
    """
    from reface_tpu.diffusion.losses import ReconLossConfig, reface_losses
    from reface_tpu.nn.arcface import ARC_FACE_CROP
    from reface_tpu.nn.lpips import LPIPS

    swap_cfg = resolve_train_swap_cfg(swap_cfg, train_cfg, recon)
    swapper_model = SwapModules(swap_cfg)
    lpips_model = LPIPS()
    schedule = DiffusionSchedule.create(timesteps=train_cfg.num_timesteps)
    tx_holder = {}

    def prep(params, batch, key):
        """Shared preprocessing + tower closures for every loss portion.
        Deterministic in (params, batch, key), so the split-grad programs
        each rebuild identical values (same dropout/noise/t)."""
        params = stop_gradient_frozen(params)
        kt, kn, ke1, ke2, kd = jax.random.split(key, 5)
        b = batch["target_image"].shape[0]

        # --- conditioning (frozen towers stop_gradient'd above; the
        # optimizer mask additionally zeroes any residual updates)
        c, uc = swapper_model.build_context(
            params, batch["ref_clip224"], batch["target_image"],
            batch.get("landmarks"),
        )
        # CFG dropout: per-sample swap to the null token
        drop = jax.random.uniform(kd, (b, 1, 1)) < train_cfg.u_cond_percent
        c = jnp.where(drop, uc, c)

        # --- latent assembly (z, z_inpaint, mask) : get_input parity
        z = swapper_model.encode_latent(params, batch["target_image"], ke1)
        z = jax.lax.stop_gradient(z)
        z_inpaint = swapper_model.encode_latent(
            params, batch["inpaint_image"], ke2
        )
        z_inpaint = jax.lax.stop_gradient(z_inpaint)
        hw = z.shape[1]
        from reface_tpu.ops.resize import resize_bilinear_no_aa

        mask_l = resize_bilinear_no_aa(batch["inpaint_mask"], hw, hw)
        z9 = jnp.concatenate([z, z_inpaint, mask_l], axis=-1)

        t = jax.random.randint(kt, (b,), 0, train_cfg.num_timesteps)

        unet_fn = lambda x9, tt, cc: swapper_model.unet.apply(
            params["unet"], x9, tt, cc
        )

        def decode_fn(latent):
            return swapper_model.decode_latent(params, latent)

        def embed_id_fn(img_pm1):
            # IDLoss.extract_feats with clip_img=False (ddpm.py:112-124),
            # exact AdaptiveAvgPool2d semantics
            from reface_tpu.ops.pooling import adaptive_avg_pool2d

            x = adaptive_avg_pool2d(img_pm1, 256, 256)
            tcrop, bcrop, lcrop, rcrop = ARC_FACE_CROP
            x = x[:, tcrop:bcrop, lcrop:rcrop, :]
            x = adaptive_avg_pool2d(x, 112, 112)
            return swapper_model.conditioner.apply(
                params["conditioner"],
                method=lambda m, xx: m.face_id(xx),
                xx=x,
            )

        lpips_fn = None
        if recon is not None and recon.lpips_weight > 0:
            lpips_fn = lambda a, bb: lpips_model.apply(params["lpips"], a, bb)

        def conditioning_fn(ref, lm):
            tar224 = clip_normalize(un_norm(batch["target_image"]))
            return swapper_model.conditioner.apply(
                params["conditioner"], ref, tar224, lm
            )

        unet_features_fn = landmark_head_fn = None
        if (recon is not None and recon.landmark_weight > 0
                and "landmark_head" in params):
            from reface_tpu.nn.landmarks import LandmarkAuxHead

            unet_features_fn = lambda x9, tt, cc: swapper_model.unet.apply(
                params["unet"], x9, tt, cc, return_features=True
            )
            landmark_head_fn = lambda feats: LandmarkAuxHead().apply(
                params["landmark_head"], feats
            )

        return dict(
            unet_fn=unet_fn,
            decode_fn=decode_fn,
            embed_id_fn=embed_id_fn,
            lpips_fn=lpips_fn,
            conditioning_fn=conditioning_fn,
            unet_features_fn=unet_features_fn,
            landmark_head_fn=landmark_head_fn,
            z_start9=z9,
            cond=c,
            t=t,
            key=kn,
        )

    def loss_fn(params, batch, key, portion="both"):
        p = prep(params, batch, key)
        if recon is None:
            # eps-MSE only (fast path / dryrun)
            z9, c, t, kn = p["z_start9"], p["cond"], p["t"], p["key"]
            z4 = z9[..., :4]
            noise = jax.random.normal(kn, z4.shape, z4.dtype)
            z_t = schedule.q_sample(z4, t, noise)
            eps_pred = p["unet_fn"](
                jnp.concatenate([z_t, z9[..., 4:]], axis=-1), t, c
            )
            loss_simple = jnp.mean((noise - eps_pred) ** 2)
            return loss_simple, {"loss_simple": loss_simple}
        return reface_losses(
            unet_fn=p["unet_fn"],
            decode_fn=p["decode_fn"],
            embed_id_fn=p["embed_id_fn"],
            lpips_fn=p["lpips_fn"],
            conditioning_fn=p["conditioning_fn"],
            unet_features_fn=p["unet_features_fn"],
            landmark_head_fn=p["landmark_head_fn"],
            schedule=schedule,
            cfg=recon,
            z_start9=p["z_start9"],
            cond=p["cond"],
            ref_clip224=batch["ref_clip224"],
            gt_image=batch["target_image"],
            landmarks=batch.get("landmarks"),
            t=p["t"],
            key=p["key"],
            portion=portion,
        )

    def apply_grads(state: TrainState, grads, loss, metrics):
        updates, new_opt = tx_holder["tx"].update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema
        if state.ema is not None:
            from reface_tpu.core.ema import ema_update

            new_ema = ema_update(state.ema, new_params["unet"])
        return (
            TrainState(new_params, new_opt, state.step + 1, new_ema),
            {**metrics, "loss": loss},
        )

    def train_step(state: TrainState, batch, key):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key
        )
        return apply_grads(state, grads, loss, metrics)

    split = (train_cfg.split_grad and recon is not None
             and (recon.id_weight > 0 or recon.lpips_weight > 0))
    if split:
        # Two-program split: the monolithic full-loss backward (eps UNet
        # bwd + k-step recon scan bwd + decode/ID/LPIPS tower bwds) exceeds
        # the TPU compiler's program-size limit at 512px. Each half stays
        # within it. Exact: loss = L_eps + L_recon over identical inputs
        # (same key -> same t/noise/dropout), so grads sum leaf-wise.
        acc_dtype = jnp.dtype(train_cfg.split_acc_dtype)

        def _filter_frozen(grads):
            # frozen-leaf grads are identically zero (stop_gradient) and the
            # optimizer masks their updates to zero anyway — shrink them to
            # scalars so the inter-program accumulator is trainable-only
            # (~1 GB of zero VAE/CLIP/ArcFace/LPIPS buffers saved on HBM)
            labels = trainable_labels(grads)
            return jax.tree.map(
                lambda g, l: (g.astype(acc_dtype) if l == "train"
                              else jnp.zeros((), g.dtype)),
                grads, labels,
            )

        def _recon_grad(params, batch, key):
            (loss_r, metrics_r), grads_r = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, batch, key, portion="recon")
            return (loss_r, metrics_r), _filter_frozen(grads_r)

        recon_grad = jax.jit(_recon_grad)

        def _eps_and_update(state, batch, key, loss_r, metrics_r, grads_r):
            (loss_e, metrics_e), grads_e = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, batch, key, portion="eps")
            # grads_r frozen leaves are scalar zeros — broadcast add; the
            # accumulator upcasts back so the optimizer math stays fp32
            grads = jax.tree.map(
                lambda ge, gr: ge + gr.astype(ge.dtype), grads_e, grads_r
            )
            return apply_grads(
                state, grads, loss_e + loss_r, {**metrics_r, **metrics_e}
            )

        # donate the old state (params/opt buffers reused in-place) and the
        # recon-grad accumulator — on a 16G v5e the full step doesn't fit
        # without both
        eps_update = jax.jit(_eps_and_update, donate_argnums=(0, 5))

        def train_step(state: TrainState, batch, key):
            (loss_r, metrics_r), grads_r = recon_grad(state.params, batch, key)
            return eps_update(state, batch, key, loss_r, metrics_r, grads_r)

        # callers must NOT wrap this in jax.jit — tracing through would
        # re-fuse both programs into the monolith the split exists to avoid
        train_step.precompiled = True

    if split and int(train_cfg.split_grad) >= 2:
        # Four-program split: even the recon-grad half alone can exceed the
        # compiler limit (scan-of-remat-UNet bwd + three tower bwds). Cut it
        # at the pred_latents boundary, which fully mediates every trainable
        # parameter's influence on the recon loss (the towers themselves —
        # VAE decoder, ArcFace, LPIPS — are frozen/stop_gradient'd):
        #   P1 collect:  recon_cond + k-step scan forward -> pred_latents
        #   P2 towers:   d(loss_r)/d(pred_latents) (cotangents) + loss value
        #   P3 pullback: d(<collect(params), cotangents>)/d(params) — the
        #                chain rule's exact remaining factor; recomputes the
        #                scan forward (the usual remat trade)
        #   P4 eps-grad + grad-sum + optimizer update (as in the 2-way split)
        from reface_tpu.diffusion.losses import recon_collect, recon_tower_losses

        def _collect(params, batch, key):
            p = prep(params, batch, key)
            pred_latents, ref_flip = recon_collect(
                unet_fn=p["unet_fn"], conditioning_fn=p["conditioning_fn"],
                schedule=schedule, cfg=recon, z_start9=p["z_start9"],
                cond=p["cond"], ref_clip224=batch["ref_clip224"],
                landmarks=batch.get("landmarks"), t=p["t"], key=p["key"],
            )
            # rest (inpaint latent + mask channels) rides along so the tower
            # program doesn't re-run the VAE encodes just for the ID mask
            return pred_latents, ref_flip, p["z_start9"][..., 4:]

        def _tower_loss(pred_latents, params, batch, ref_flip, rest):
            p = prep(params, batch, jax.random.key(0))  # key unused by towers
            return recon_tower_losses(
                decode_fn=p["decode_fn"], embed_id_fn=p["embed_id_fn"],
                lpips_fn=p["lpips_fn"], cfg=recon,
                pred_latents=pred_latents, ref_flip=ref_flip,
                rest=rest, gt_image=batch["target_image"],
            )

        collect_jit = jax.jit(_collect)
        tower_grad = jax.jit(jax.value_and_grad(_tower_loss, has_aux=True))

        def _pullback(params, batch, key, cots):
            # d loss_r/d params = cots . d pred_latents/d params, exactly
            pred_latents, _, _ = _collect(params, batch, key)
            return sum(jnp.vdot(pl, ct)
                       for pl, ct in zip(pred_latents, cots))

        if acc_dtype == jnp.float32:
            pull_grad = jax.jit(
                lambda params, batch, key, cots: _filter_frozen(
                    jax.grad(_pullback)(params, batch, key, cots)
                )
            )
        else:
            # bf16 accumulator: differentiate w.r.t. a PRE-CAST bf16
            # trainable tree so the scan backward's gradient carry — the
            # 3.5 GB fp32 tree that OOMs a 16G chip on top of params +
            # AdamW moments — is bf16 end to end, not just cast at the
            # exit. The forward is unchanged for bf16-compute modules
            # (fp32->bf16 cast is idempotent); fp32 islands (GroupNorm
            # scale/bias) see bf16-rounded params, consistent with this
            # mode's documented tolerance.
            def _pull_bf16(params, batch, key, cots):
                labels = trainable_labels(params)
                params_train = jax.tree.map(
                    lambda p, l: (p.astype(acc_dtype) if l == "train"
                                  else jnp.zeros((), p.dtype)),
                    params, labels,
                )

                def proxy(pt):
                    full = jax.tree.map(
                        lambda p, l, ptl: ptl if l == "train" else p,
                        params, labels, pt,
                    )
                    return _pullback(full, batch, key, cots)

                return jax.grad(proxy)(params_train)

            pull_grad = jax.jit(_pull_bf16)

        def train_step(state: TrainState, batch, key):
            pred_latents, ref_flip, rest = collect_jit(
                state.params, batch, key
            )
            (loss_r, metrics_r), cots = tower_grad(
                pred_latents, state.params, batch, ref_flip, rest
            )
            grads_r = pull_grad(state.params, batch, key, cots)
            return eps_update(state, batch, key, loss_r, metrics_r, grads_r)

        train_step.precompiled = True
        # exposed for AOT memory analysis / debugging (tools/probe_split_mem)
        train_step.programs = {
            "collect": collect_jit, "towers": tower_grad,
            "pull": pull_grad, "update": eps_update,
        }

    def init_state(params):
        tx = make_optimizer(train_cfg, params)
        tx_holder["tx"] = tx
        return TrainState.create(params, tx, ema_decay=train_cfg.ema_decay,
                                 ema_dtype=train_cfg.ema_dtype)

    return train_step, loss_fn, init_state


def params_with_ema(params, state: TrainState):
    """ema_scope parity (ddpm.py:309-320): swap the UNet weights for their
    EMA shadow at inference time; no-op when EMA is disabled."""
    if state.ema is None:
        return params
    return {**params, "unet": state.ema.shadow}
