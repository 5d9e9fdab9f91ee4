"""TPU-native dense SLAM engine (VoxelHashing on JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of nilspin/VoxelHashing_demo
for TPU: depth preprocessing, point-to-plane ICP tracking, voxel-hashed TSDF
fusion, and sphere-traced raycasting, with multi-chip scaling via
jax.sharding.  See SURVEY.md for the reference analysis.
"""

from . import config
from .config import PipelineConfig, tiny_config

__version__ = "0.1.0"
