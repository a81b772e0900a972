"""diffusion_model_project_tpu — a TPU-native JAX/XLA/Pallas framework.

Rebuilds the capabilities of the reference latent-diffusion resin-flow pipeline
(dual-branch 3D VAE + conditional latent UNet + DDPM/DDIM samplers) idiomatically
for TPU: channels-last layouts, fully jitted forward/sampling paths with the
T-step reverse process fused into a single ``lax.scan``, and data parallelism via
``jax.sharding.Mesh`` instead of ``torch.nn.DataParallel``.

Layer map (mirrors SURVEY.md §1):
  ops/        core numerical primitives (norms, resizes, attention, EDT, ...)
  models/     UNet denoiser and dual-branch VAE (flax.linen)
  diffusion/  DDPM/DDIM scheduler tables + fused samplers + predictor
  losses/     noise-space loss zoo, VAE losses, physics losses
  data/       .pt dataset loaders, splits, statistics, zenodo download
  parallel/   device-mesh construction and sharding rules
  training/   stage-1 / stage-2 VAE and diffusion training loops
  utils/      config parsing, checkpointing, PyTorch-checkpoint importer
"""

__version__ = "0.1.0"
