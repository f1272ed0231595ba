"""gslivm_tpu — TPU-native LiDAR-Inertial-Visual Gaussian-Splatting mapping framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of GS-LIVM
(weixiaopassking/GS-LIVM): real-time photo-realistic LiDAR-inertial-visual
mapping with 3D Gaussian Splatting.

Layer map (TPU-first redesign of reference SURVEY.md §1):

  ops/       — device compute: Pallas tile rasterizer (fwd+bwd custom VJP),
               naive differentiable oracle, SH eval, EWA covariance projection,
               photometric/structural losses, batched voxel-GP regression.
  models/    — Gaussian map model (pytree params, bucketed capacity growth),
               cameras, the jitted train step.
  parallel/  — multi-chip scaling: jax.sharding Mesh + shard_map pixel/tile
               sharding and FSDP-style primitive sharding with psum grad sync.
  frontend/  — sensor-side CPU pipeline (decoupled from ROS): ESKF IMU
               propagation, LiDAR plane-ICP odometry, voxel maps, dataset IO.
  utils/     — timers (log_time.txt-format parity), PLY export, metrics.

The CUDA/C++/torch reference is used as a behavioral specification only; the
implementation here is designed for XLA's compilation model: static shapes,
masked capacity buckets, sort-based tile binning instead of dynamic radix
sort, and segment-sum gradient scatter instead of atomics.
"""

__version__ = "0.1.0"
