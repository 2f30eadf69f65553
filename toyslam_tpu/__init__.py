"""toyslam_tpu — a TPU-native scan-matching & state-estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
weisongwen/ToySLAM (NDT/GICP/ICP registration, LOAM feature odometry,
UWB/IMU/GNSS fusion, GNSS SPP/RAIM, sensor simulators, evaluation tooling),
built TPU-first:

- point clouds are fixed-shape padded ``[N, 4]`` homogeneous tensors with
  validity masks,
- the NDT voxel-Gaussian map is a sorted spatial hash built with segment
  reductions + a closed-form batched 3x3 eigensolver,
- registration Newton loops (incl. More-Thuente line search) run entirely
  inside ``jax.lax.while_loop`` — one compiled program per align,
- pipelines are ``lax.scan`` over pre-decoded scan stacks,
- batch/multi-chip scaling is ``vmap`` + ``shard_map`` over a device mesh.
"""

__version__ = "0.1.0"

from toyslam_tpu.core import se3  # noqa: F401
