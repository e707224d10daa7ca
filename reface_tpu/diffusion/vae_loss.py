"""VAE first-stage training loss: LPIPS + KL + PatchGAN (TPU-native).

Behavioral parity target (semantics, not code):
`ldm/modules/losses/contperceptual.py:7-111` (`LPIPSWithDiscriminator`) and
the two-optimizer alternation of `ldm/models/autoencoder.py:351-372,407-418`
(AutoencoderKL.training_step / configure_optimizers). REFace's *shipped*
config replaces this loss with `torch.nn.Identity` (configs/train.yaml:69-70)
— the UNet trains against a frozen VAE — so this module is the
beyond-shipped-config capability: fine-tuning the first stage itself.

Reference semantics reproduced exactly (each deliberate):
- rec = |x - xrec| + perceptual_weight * LPIPS, where the (B,)-shaped LPIPS
  distance broadcasts over every pixel BEFORE the sum-over-elements/B
  reduction — i.e. LPIPS is effectively scaled by H*W*C relative to a naive
  mean (contperceptual.py:49-59 broadcasts a (B,1,1,1) over (B,3,H,W)).
- nll = rec / exp(logvar) + logvar with a scalar logvar that the reference
  never actually trains: `configure_optimizers` (autoencoder.py:407-415)
  puts encoder/decoder/quant convs in opt_ae and only the discriminator in
  opt_disc, leaving `loss.logvar` in neither — so here logvar is a config
  constant (`logvar_init`).
- adaptive d_weight = ||d nll/d w_last|| / (||d g/d w_last|| + 1e-4),
  clipped to [0, 1e4] and detached, where w_last is the decoder's conv_out
  KERNEL (get_last_layer, autoencoder.py:417-418). Computed TPU-natively:
  the decoder returns its penultimate tap (nn/vae.py Decoder features=True),
  the tap is stop-gradded, and each scalar is re-expressed through that one
  3x3 conv so jax.grad touches exactly the last layer — no full-tree
  backward, and the probe nests cleanly inside the outer training grad.
- the discriminator only engages after `disc_start` steps (adopt_weight),
  and the discriminator pass sees stop-gradded reconstructions.

The whole gen+disc double update compiles as ONE XLA program
(`make_vae_train_step`): both Adam(b1=0.5, b2=0.9) updates, the BatchNorm
discriminator (stateless batch-stat math, nn/discriminator.py), LPIPS, and
the last-layer probe fuse together; state is donated.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from reface_tpu.nn.discriminator import NLayerDiscriminator
from reface_tpu.nn.lpips import LPIPS

__all__ = [
    "VAELossConfig",
    "hinge_d_loss",
    "vanilla_d_loss",
    "adopt_weight",
    "generator_loss",
    "discriminator_loss",
    "VAETrainState",
    "make_vae_train_step",
]


@dataclasses.dataclass(frozen=True)
class VAELossConfig:
    """Knobs of contperceptual.py:8-11, defaults matching the reference."""

    disc_start: int = 50001
    logvar_init: float = 0.0
    kl_weight: float = 1.0
    pixelloss_weight: float = 1.0
    disc_num_layers: int = 3
    disc_in_channels: int = 3
    disc_factor: float = 1.0
    disc_weight: float = 1.0
    perceptual_weight: float = 1.0
    disc_loss: str = "hinge"  # "hinge" | "vanilla"

    def __post_init__(self):
        if self.disc_loss not in ("hinge", "vanilla"):
            raise ValueError(f"disc_loss must be hinge|vanilla, got {self.disc_loss}")


def hinge_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray):
    return 0.5 * (
        jnp.mean(jax.nn.relu(1.0 - logits_real))
        + jnp.mean(jax.nn.relu(1.0 + logits_fake))
    )


def vanilla_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray):
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real))
        + jnp.mean(jax.nn.softplus(logits_fake))
    )


def adopt_weight(weight, global_step, threshold: int, value: float = 0.0):
    return jnp.where(global_step < threshold, value, weight)


def _last_conv_apply(feats, kernel, bias, out_dtype=jnp.float32):
    """The decoder's conv_out as an explicit function of its kernel.

    feats: (B,H,W,Cin) penultimate tap; kernel (3,3,Cin,Cout) HWIO flax
    layout; SAME-1 padding — identical math to nn/vae.py's conv_out, run in
    fp32 (the probe only feeds gradient NORMS, nn/vae docstring)."""
    y = jax.lax.conv_general_dilated(
        feats.astype(jnp.float32), kernel.astype(jnp.float32),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return (y + bias.astype(jnp.float32)).astype(out_dtype)


def _rec_nll(x, xrec, p_dist, cfg: VAELossConfig):
    """sum-over-elements/B NLL with the reference's LPIPS broadcast.

    Parity note: the reference STORES pixelloss_weight but never applies it
    (contperceptual.py:16,48 — rec_loss is a bare torch.abs); here it
    multiplies the L1 term, so any value != 1.0 is a beyond-parity knob
    (the default 1.0 is bit-identical behavior)."""
    rec = cfg.pixelloss_weight * jnp.abs(x - xrec)
    if cfg.perceptual_weight > 0 and p_dist is not None:
        rec = rec + cfg.perceptual_weight * p_dist[:, None, None, None]
    nll = rec / jnp.exp(cfg.logvar_init) + cfg.logvar_init
    return jnp.sum(nll) / x.shape[0]


def generator_loss(
    vae, vae_params, disc, disc_params, lpips, lpips_params,
    x: jnp.ndarray, key: jax.Array, global_step, cfg: VAELossConfig,
):
    """optimizer_idx=0 branch of contperceptual.py:63-93.

    Returns (loss, aux-dict). Differentiable w.r.t. vae_params; disc and
    lpips are frozen inside (their grads are cut like the reference, whose
    opt_ae holds only autoencoder params)."""
    posterior = vae.apply(vae_params, x, method="encode")
    z = posterior.sample(key)
    xrec, feats = vae.apply(vae_params, z, True, method="decode")

    p_dist = None
    if cfg.perceptual_weight > 0:
        p_dist = lpips.apply(jax.lax.stop_gradient(lpips_params), x, xrec)
    nll = _rec_nll(x, xrec, p_dist, cfg)
    kl = jnp.sum(posterior.kl()) / x.shape[0]

    logits_fake = disc.apply(jax.lax.stop_gradient(disc_params), xrec)
    g_loss = -jnp.mean(logits_fake)

    # adaptive weight: grads of each scalar w.r.t. the LAST decoder kernel
    # only — re-express both losses through the final conv on a stop-gradded
    # penultimate tap, so jax.grad's backward is one conv + one tower.
    feats_sg = jax.lax.stop_gradient(feats)
    conv_out = vae_params["params"]["decoder"]["conv_out"]
    x_sg = jax.lax.stop_gradient(x)

    def nll_of_w(w):
        xr = _last_conv_apply(feats_sg, w, conv_out["bias"])
        p = (lpips.apply(jax.lax.stop_gradient(lpips_params), x_sg, xr)
             if cfg.perceptual_weight > 0 else None)
        return _rec_nll(x_sg, xr, p, cfg)

    def g_of_w(w):
        xr = _last_conv_apply(feats_sg, w, conv_out["bias"])
        return -jnp.mean(disc.apply(jax.lax.stop_gradient(disc_params), xr))

    if cfg.disc_factor > 0.0:
        def probe(kernel):
            nll_g = jax.grad(nll_of_w)(kernel)
            gan_g = jax.grad(g_of_w)(kernel)
            dw = jnp.linalg.norm(nll_g.ravel()) / (
                jnp.linalg.norm(gan_g.ravel()) + 1e-4
            )
            return jnp.clip(dw, 0.0, 1e4) * cfg.disc_weight

        # The reference runs the probe during the disc_start warmup too,
        # only to multiply by disc_factor=0; here the two extra
        # LPIPS/disc backwards are skipped until the gate opens
        # (numerics unchanged — the term is zeroed either way).
        d_weight = jax.lax.cond(
            global_step >= cfg.disc_start, probe,
            lambda k: jnp.zeros(()),
            # stop-grad the operand: the inner jax.grad differentiates its
            # formal arg, and the outer training grad must not transpose
            # through the cond (d_weight is detached anyway)
            jax.lax.stop_gradient(conv_out["kernel"]),
        )
    else:
        d_weight = jnp.zeros(())

    disc_factor = adopt_weight(cfg.disc_factor, global_step, cfg.disc_start)
    loss = nll + cfg.kl_weight * kl + d_weight * disc_factor * g_loss
    return loss, {
        "nll_loss": nll, "kl_loss": kl, "g_loss": g_loss,
        "d_weight": d_weight, "disc_factor": disc_factor,
    }


def discriminator_loss(
    vae, vae_params, disc, disc_params,
    x: jnp.ndarray, key: jax.Array, global_step, cfg: VAELossConfig,
):
    """optimizer_idx=1 branch of contperceptual.py:95-111; differentiable
    w.r.t. disc_params (reconstructions are stop-gradded, like .detach())."""
    posterior = vae.apply(jax.lax.stop_gradient(vae_params), x, method="encode")
    z = posterior.sample(key)
    xrec = vae.apply(jax.lax.stop_gradient(vae_params), z, method="decode")
    logits_real = disc.apply(disc_params, jax.lax.stop_gradient(x))
    logits_fake = disc.apply(disc_params, jax.lax.stop_gradient(xrec))
    fn = hinge_d_loss if cfg.disc_loss == "hinge" else vanilla_d_loss
    disc_factor = adopt_weight(cfg.disc_factor, global_step, cfg.disc_start)
    d_loss = disc_factor * fn(logits_real, logits_fake)
    return d_loss, {
        "disc_loss": d_loss,
        "logits_real": jnp.mean(logits_real),
        "logits_fake": jnp.mean(logits_fake),
    }


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VAETrainState:
    step: jnp.ndarray
    vae_params: Any
    disc_params: Any
    opt_ae: Any
    opt_disc: Any


def make_vae_train_step(
    vae, cfg: VAELossConfig, lr: float = 4.5e-6,
    disc: Optional[NLayerDiscriminator] = None,
    lpips: Optional[LPIPS] = None, jit: bool = True,
):
    """Build (init_state, step_fn) for the two-optimizer VAE fine-tune.

    One call = the reference's full per-batch schedule: generator update
    (opt_ae) then discriminator update (opt_disc), both Adam(0.5, 0.9)
    (autoencoder.py:407-415), compiled as one donated XLA program.

    LPIPS params are a step_fn ARGUMENT, never a closure capture — a
    captured tree would bake its weights into the MLIR as constants
    (CLAUDE.md chip-run reliability rule)."""
    disc = disc or NLayerDiscriminator(
        input_nc=cfg.disc_in_channels, n_layers=cfg.disc_num_layers
    )
    lpips = lpips or LPIPS()
    tx = optax.adam(lr, b1=0.5, b2=0.9)

    def init_state(vae_params, key, image_size: int = 256) -> VAETrainState:
        disc_params = disc.init(
            jax.random.fold_in(key, 0),
            jnp.zeros((1, image_size, image_size, cfg.disc_in_channels)),
        )
        return VAETrainState(
            step=jnp.zeros((), jnp.int32),
            vae_params=vae_params,
            disc_params=disc_params,
            opt_ae=tx.init(vae_params),
            opt_disc=tx.init(disc_params),
        )

    def step_fn(state: VAETrainState, x, key, lpips_params=None):
        lpp = lpips_params
        if lpp is None and cfg.perceptual_weight > 0:
            raise ValueError(
                "lpips_params required when perceptual_weight > 0; pass "
                "converted LPIPS weights (random features make the "
                "perceptual term meaningless) or set perceptual_weight=0"
            )
        kg, kd = jax.random.split(key)

        (gl, gaux), g_grads = jax.value_and_grad(
            lambda p: generator_loss(vae, p, disc, state.disc_params,
                                     lpips, lpp, x, kg, state.step, cfg),
            has_aux=True,
        )(state.vae_params)
        up, opt_ae = tx.update(g_grads, state.opt_ae, state.vae_params)
        vae_params = optax.apply_updates(state.vae_params, up)

        (dl, daux), d_grads = jax.value_and_grad(
            lambda p: discriminator_loss(vae, vae_params, disc, p,
                                         x, kd, state.step, cfg),
            has_aux=True,
        )(state.disc_params)
        ud, opt_disc = tx.update(d_grads, state.opt_disc, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, ud)

        new_state = VAETrainState(
            step=state.step + 1, vae_params=vae_params,
            disc_params=disc_params, opt_ae=opt_ae, opt_disc=opt_disc,
        )
        return new_state, {"aeloss": gl, "discloss": dl, **gaux, **daux}

    if jit:
        step_fn = jax.jit(step_fn, donate_argnums=(0,))
    return init_state, step_fn, disc, lpips
