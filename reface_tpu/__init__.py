"""reface_tpu — a TPU-native (JAX/XLA/Pallas/pjit) diffusion face-swapping framework.

Re-designed from scratch with the capabilities of Sanoojan/REFace (WACV 2025):
face swapping as self-supervised inpainting on a 9-channel Stable Diffusion v1-4
UNet, conditioned on fused CLIP (source+target) + ArcFace ID + 68-landmark
features, sampled with a jitted lax.scan DDIM/PLMS sampler, wrapped in an
end-to-end on-device pipeline (alignment, parsing masks, TPS augmentation,
paste-back compositing), mesh-sharded training, and a quantitative eval suite.

Layout:
  core/       schedules, PRNG, config, distributions, dtype policy
  nn/         flax modules: unet, vae, clip, arcface, bisenet, conditioner
  ops/        pallas kernels + XLA-fused ops (attention, groupnorm+silu, resize)
  diffusion/  ddim/plms scan samplers, q/p math, losses
  parallel/   mesh + sharding setup (DP/TP/spatial tiling)
  preprocess/ tps, alignment, masks, landmarks, paste-back (on-device)
  pipelines/  swap / test-bench / video / train drivers
  data/       host-side dataset pipelines (CelebA-HQ, FFHQ, test bench, video)
  ckpt/       torch state_dict -> JAX pytree converters, orbax io
  eval/       clip-fid, id-retrieval, pose, expression, lpips
  cli/        command-line entrypoints
"""

__version__ = "0.1.0"
