"""lidar_slam_tpu — a TPU-native LiDAR SLAM engine (JAX/XLA/Pallas/pjit).

A from-scratch re-design of the capabilities of FISH1129/Lidar-SLAM
(a ROS/C++ NDT-SLAM + A-LOAM system) as a library-first, functional,
statically-shaped JAX framework:

- ``geom``     : SO(3)/SE(3) utilities, geodetic→ENU conversion.
- ``io``       : KITTI raw/odometry readers, trajectory formats, keyframe store.
- ``ops``      : masked point-cloud primitives (voxel downsample, crop, hash-grid
                 nearest-neighbour search, batched 3x3 eigensolver) + Pallas kernels.
- ``models``   : registration (NDT manual / ICP manual / point-to-plane),
                 cloud filters, scan distortion adjust, Scan Context,
                 pose-graph optimizer, ground segmentation, clustering.
- ``pipeline`` : data pretreatment, front end (scan-to-map odometry with
                 static-point weighting), back end, loop closing, viewer/map
                 export, map-matching localization, A-LOAM pipeline.
- ``parallel`` : device-mesh sharding of registration reductions and the
                 distributed pose-graph solve (psum/all_gather over ICI).

Points are carried as padded ``[N, 3]`` float32 arrays with boolean validity
masks (XLA static shapes); per-point attributes (static weight, ring, time)
are parallel ``[N]`` arrays rather than being stuffed into an intensity
channel as the reference does.
"""

import jax as _jax

# SLAM registration math is precision-bound, not FLOP-bound: the matmuls are
# tiny (3x3 poses, 6x6 Hessians, Nx3 point transforms) and bfloat16 MXU
# accumulation (the TPU default) visibly corrupts pose estimates. Pin float32
# matmul precision globally; kernels that want bf16 opt in locally via
# `jax.default_matmul_precision` / `preferred_element_type`.
_jax.config.update("jax_default_matmul_precision", "float32")

__version__ = "0.1.0"
