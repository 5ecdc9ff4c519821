"""ov2slam_tpu — a TPU-native visual SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of OV²SLAM
(reference: /root/reference, ONERA RA-L 2021): frame-rate stereo/monocular
camera tracking, keyframe-rate sparse mapping, anchored-inverse-depth local
bundle adjustment, online-BoW loop closing with pose-graph optimization, and
the same preset/trajectory-output harness — designed TPU-first:

* all per-keypoint / per-hypothesis / per-residual math is batched, padded,
  statically-shaped device code (vmap + lax control flow + Pallas kernels);
* identity management (keypoint ids, keyframe ids, covisibility bookkeeping)
  lives on the host;
* the Ceres solver is replaced by a device-side Schur-complement
  Levenberg-Marquardt engine (ov2slam_tpu.opt);
* OpenGV/OpenCV geometry is replaced by vmapped minimal solvers + batched
  RANSAC (ov2slam_tpu.ops.mvg).
"""

__version__ = "0.1.0"

from ov2slam_tpu.config import SlamParams  # noqa: F401
