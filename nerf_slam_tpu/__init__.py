"""nerf_slam_tpu: a TPU-native (JAX/XLA/Pallas) real-time dense monocular
SLAM framework with the capabilities of NeRF-SLAM (Rosinol et al.,
arXiv:2210.13641): a DROID-style dense visual frontend with uncertainty
(marginal covariance) estimation, plus online volumetric mapping via a
hash-grid NeRF or uncertainty-weighted TSDF fusion.

Built from scratch for TPU: jit-compiled static-shape tracking steps,
MXU-friendly dense bundle adjustment, Pallas kernels for the hot ops, and
`jax.sharding` device meshes for multi-chip scaling.
"""

__version__ = "0.1.0"
