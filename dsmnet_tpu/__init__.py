"""dsmnet_tpu — a TPU-native deep stereo matching framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
reference DSMnet codebase (sunshinnnn/DSMnet): the full model zoo
(DispNet, DispNetC, iResNet, GCNet, PSMNet), supervised and
self-supervised (SSIM + view-synthesis warp) training, the
SceneFlow/KITTI data pipeline, and TPU-first parallelism via
``jax.sharding`` device meshes.

Layout conventions (TPU-first, unlike the reference's NCHW):
  * images:       (N, H, W, 3)   float32/bfloat16, NHWC
  * disparities:  (N, H, W, 1)
  * cost volumes: (N, D, H, W, C)

Package map:
  ops/       pure-function kernels: correlation, cost volume, soft-argmin,
             warping, SSIM, gradient/smoothness primitives, resizing
  models/    flax.linen model zoo honoring the reference's
             ``(scales, disps)`` multi-resolution pyramid contract
  losses/    supervised pyramid loss + photometric self-supervised family
  data/      dataset path providers, validation cache, augmentations, I/O
  train/     train state, jitted train/eval steps, metrics, checkpoints
  parallel/  mesh construction and sharding strategies (DP + spatial)
"""

__version__ = "0.1.0"
