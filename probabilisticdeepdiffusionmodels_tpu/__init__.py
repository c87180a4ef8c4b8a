"""probabilisticdeepdiffusionmodels_tpu — a TPU-native (JAX/XLA/Pallas/pjit)
diffusion-model framework with the capabilities of
ArturPrzybysz/ProbabilisticDeepDiffusionModels, redesigned TPU-first.

Layer map (bottom-up):
  core/      noise schedules + pure diffusion math (stateless, jit-friendly)
  models/    Flax UNet / Dense model zoo + factory
  ops/       Pallas TPU kernels with XLA fallbacks
  parallel/  device mesh + sharding policy
  train/     training loop, timestep samplers, EMA, checkpointing
  sample/    lax.scan ancestral / DDIM samplers
  evals/     NLL (VLB bits/dim), FID (on-device InceptionV3 stats)
  data/      dataset readers + transforms (MNIST/CIFAR-10/CelebA/CelebA-HQ)
  viz/       sample grids, interpolations, reconstructions
  logging/   metric sinks + local artifact store
  cli/       config-driven entry points (train/sample/eval/fid)
"""

__version__ = "0.1.0"
