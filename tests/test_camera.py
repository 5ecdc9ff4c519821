"""Camera model tests against the OpenCV oracle (host-only; mirrors the
reference's reliance on cv::undistortPoints / initUndistortRectifyMap,
reference: src/camera_calibration.cpp:80-131)."""

import numpy as np
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from ov2slam_tpu.core import camera as cam_mod
from ov2slam_tpu.core import lie

# EuRoC cam0 calibration (parameters_files preset values)
FX, FY, CX, CY = 458.654, 457.296, 367.215, 248.375
DIST = np.array([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05], np.float32)
W, H = 752, 480


def euroc_cam():
    return cam_mod.Camera.make("pinhole", FX, FY, CX, CY, DIST, W, H)


def grid_px(n=25, border=40):
    us = np.linspace(border, W - border, n)
    vs = np.linspace(border, H - border, n)
    uu, vv = np.meshgrid(us, vs)
    return np.stack([uu.ravel(), vv.ravel()], axis=-1).astype(np.float32)


def test_undistort_px_vs_opencv():
    cam = euroc_cam()
    px = grid_px()
    K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float64)
    # run the OpenCV oracle to convergence (its default is only 5 fixed-point
    # iterations, which is ~0.5 px off at the borders of EuRoC images)
    crit = (cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS, 100, 1e-9)
    ref = cv2.undistortPoints(
        px.reshape(-1, 1, 2).astype(np.float64), K, DIST.astype(np.float64),
        R=None, P=K, criteria=crit)
    ref = ref.reshape(-1, 2)
    out = np.asarray(cam_mod.undistort_px(cam, jnp.asarray(px)))
    np.testing.assert_allclose(out, ref, atol=5e-3)


def test_project_undistort_roundtrip():
    cam = euroc_cam()
    px = grid_px()
    unpx = cam_mod.undistort_px(cam, jnp.asarray(px))
    b = cam_mod.bearing_from_undist_px(cam, unpx)
    # project bearing back through distortion -> original pixel
    px2 = np.asarray(cam_mod.project_cam_to_image_dist(cam, b))
    np.testing.assert_allclose(px2, px, atol=2e-2)


def test_fisheye_roundtrip():
    dist = np.array([-0.03, 0.008, -0.01, 0.003], np.float32)
    cam = cam_mod.Camera.make("fisheye", 380.0, 380.0, 376.0, 240.0, dist, W, H)
    px = grid_px()
    unpx = cam_mod.undistort_px(cam, jnp.asarray(px))
    b = cam_mod.bearing_from_undist_px(cam, unpx)
    px2 = np.asarray(cam_mod.project_cam_to_image_dist(cam, b))
    np.testing.assert_allclose(px2, px, atol=2e-2)


def test_fisheye_vs_opencv():
    dist = np.array([-0.03, 0.008, -0.01, 0.003], np.float64)
    cam = cam_mod.Camera.make("fisheye", 380.0, 380.0, 376.0, 240.0, dist.astype(np.float32), W, H)
    K = np.array([[380.0, 0, 376.0], [0, 380.0, 240.0], [0, 0, 1]], np.float64)
    px = grid_px()
    ref = cv2.fisheye.undistortPoints(
        px.reshape(-1, 1, 2).astype(np.float64), K, dist.reshape(4, 1), P=K
    ).reshape(-1, 2)
    out = np.asarray(cam_mod.undistort_px(cam, jnp.asarray(px)))
    np.testing.assert_allclose(out, ref, atol=5e-2)


def test_undist_map_vs_opencv():
    cam = euroc_cam()
    K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float64)
    m1, m2 = cv2.initUndistortRectifyMap(
        K, DIST.astype(np.float64), None, K, (W, H), cv2.CV_32FC1
    )
    grid = np.asarray(cam_mod.compute_undist_rect_map(cam))
    np.testing.assert_allclose(grid[..., 0], m1, atol=1e-2)
    np.testing.assert_allclose(grid[..., 1], m2, atol=1e-2)


def test_stereo_rectify_properties():
    """After rectification both cameras' epipolar lines are horizontal: the
    rectified baseline is along +x and rotations are orthonormal."""
    cam_l = euroc_cam()
    cam_r = cam_mod.Camera.make(
        "pinhole", 457.587, 456.134, 379.999, 255.238,
        np.array([-0.28368365, 0.07451284, -0.00010473, -3.555907e-05], np.float32), W, H)
    # EuRoC-like T_left_right (mostly x-translation ~11 cm)
    w = np.array([0.01, -0.006, 0.002], np.float32)
    R_lr = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t_lr = np.array([0.11, 0.0004, -0.0007], np.float32)
    T_lr = lie.SE3(jnp.asarray(R_lr), jnp.asarray(t_lr))
    T_rl = lie.se3_inverse(T_lr)

    R1, R2, K_new, fb = cam_mod.stereo_rectify(cam_l, cam_r, T_rl)
    for Rr in (R1, R2):
        np.testing.assert_allclose(Rr @ Rr.T, np.eye(3), atol=1e-10)
    # rectified relative rotation should be identity: R2 * R_rl * R1^T = I
    R_rl = np.asarray(T_rl.R, np.float64)
    Rrel = R2 @ R_rl @ R1.T
    np.testing.assert_allclose(Rrel, np.eye(3), atol=1e-6)
    # baseline in rectified frame is along x
    t_rl = np.asarray(T_rl.t, np.float64)
    t_rect = R2 @ t_rl
    assert abs(t_rect[1]) < 1e-6 and abs(t_rect[2]) < 1e-6
    assert fb > 0


def test_in_image():
    cam = euroc_cam()
    px = jnp.asarray(np.array([[10.0, 10.0], [-1.0, 5.0], [752.5, 100.0], [400.0, 479.0]], np.float32))
    m = np.asarray(cam_mod.in_image(cam, px))
    assert list(m) == [True, False, False, True]
