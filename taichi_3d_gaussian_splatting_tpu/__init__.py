"""TPU-native 3D Gaussian Splatting framework (JAX / XLA / Pallas).

A from-scratch reimplementation of the capabilities of
Wenri/taichi_3d_gaussian_splatting, designed for TPU hardware:

- differentiable tile-based rasterizer with fused Pallas forward/backward
  kernels under ``jax.custom_vjp`` (reference: GaussianPointCloudRasterisation.py)
- fixed-capacity Gaussian scene with adaptive densification running under jit
  (reference: GaussianPointCloudScene.py, GaussianPointAdaptiveController.py)
- YAML-configured trainer with optax, progressive resolution / SH bands
  (reference: GaussianPointTrainer.py)
- multi-device data-parallel training via jax.sharding / shard_map
  (no equivalent in the single-GPU reference)
"""

__version__ = "0.1.0"

from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (  # noqa: F401
    RasterizerConfig,
    rasterize,
)
from taichi_3d_gaussian_splatting_tpu.models.scene import GaussianScene  # noqa: F401
