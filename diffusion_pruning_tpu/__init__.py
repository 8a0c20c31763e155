"""diffusion_pruning_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
APTP-style prompt-adaptive structural pruning of text-to-image diffusion models.

Re-implements the capabilities of rezashkv/diffusion_pruning (ICLR'25 APTP,
arXiv 2406.12042) from scratch, designed for TPU:

* gates are functional masks sliced from a single flat ``(B, D)`` architecture
  vector inside one jitted forward (no module-tree mutation),
* the differentiable resource model is an analytic, config-time MAC table
  (no forward hooks),
* data parallelism / the Sinkhorn router / the contrastive global batch are
  XLA collectives (``lax.pmean`` / ``psum`` / ``all_gather``) over a
  ``jax.sharding.Mesh``,
* hot attention paths have Pallas TPU kernels.

Layout:
  core/        structure spec, gate estimators, Sinkhorn, analytic MACs
  models/      gated U-Net (flax), hypernet, quantizer, VAE, text encoders
  ops/         Pallas kernels + functional gate ops
  parallel/    mesh + sharding helpers
  losses/      resource / contrastive / diffusion losses
  schedulers/  DDPM schedule math, DDIM, PNDM
  pipelines/   routed inference pipeline
  training/    Pruner (stage 1), FineTuner (stage 2), baselines
  data/        COCO / CC3M dataset plumbing
  utils/       config, logging, checkpointing
"""

__version__ = "0.1.0"
