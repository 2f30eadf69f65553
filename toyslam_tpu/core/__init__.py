from toyslam_tpu.core import se3, pcd_io, pointcloud  # noqa: F401
