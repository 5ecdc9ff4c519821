"""Camera models: pinhole (radtan) and fisheye (Kalibr pinhole-equi).

Covers the reference's CameraCalibration (reference: src/camera_calibration.cpp
:30-384, include/camera_calibration.hpp:44-125): projection/unprojection,
per-point undistortion, undistortion/rectification map precompute, stereo
rectification, extrinsics, and image ROI.

TPU-first design: per-point math is pure batched jnp (vmappable, used inside
jitted tracking steps); map precompute runs once at setup on host via the same
jnp code; full-image remap is a bilinear gather executed on device
(:func:`ov2slam_tpu.ops.image.remap_bilinear`).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ov2slam_tpu.core import lie

PINHOLE = 0
FISHEYE = 1


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Camera:
    """Static per-camera calibration (a pytree of device scalars/arrays).

    ``K``/``iK`` describe the *working* intrinsics (after optional
    rectification); ``dist`` the distortion of the raw image. When
    ``rect_R`` is not identity, keypoint bearings are expressed in the
    rectified frame.
    """

    model: int = dataclasses.field(metadata=dict(static=True))  # PINHOLE | FISHEYE
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    fx: jnp.ndarray = 0.0
    fy: jnp.ndarray = 0.0
    cx: jnp.ndarray = 0.0
    cy: jnp.ndarray = 0.0
    dist: jnp.ndarray = None          # (4,) k1 k2 p1 p2  (or k1..k4 for fisheye)
    # ROI bounds (valid image area after rectification), scalars
    roi_x0: jnp.ndarray = 0.0
    roi_y0: jnp.ndarray = 0.0
    roi_x1: jnp.ndarray = 0.0
    roi_y1: jnp.ndarray = 0.0

    @property
    def K(self) -> jnp.ndarray:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx]),
                jnp.stack([z, self.fy, self.cy]),
                jnp.stack([z, z, o]),
            ]
        )

    @staticmethod
    def make(model: str, fx, fy, cx, cy, dist, width, height, dtype=jnp.float32) -> "Camera":
        m = PINHOLE if model.lower().startswith("pinhole") else FISHEYE
        return Camera(
            model=m,
            width=int(width),
            height=int(height),
            fx=jnp.asarray(fx, dtype),
            fy=jnp.asarray(fy, dtype),
            cx=jnp.asarray(cx, dtype),
            cy=jnp.asarray(cy, dtype),
            dist=jnp.asarray(dist, dtype),
            roi_x0=jnp.asarray(0.0, dtype),
            roi_y0=jnp.asarray(0.0, dtype),
            roi_x1=jnp.asarray(float(width), dtype),
            roi_y1=jnp.asarray(float(height), dtype),
        )


# ---------------------------------------------------------------------------
# distortion models (normalized coords -> distorted normalized coords)
# ---------------------------------------------------------------------------

def distort_radtan(p: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Radial-tangential (OpenCV k1 k2 p1 p2). p: (..., 2) normalized."""
    k1, k2, p1, p2 = dist[0], dist[1], dist[2], dist[3]
    x, y = p[..., 0], p[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def distort_equi(p: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Equidistant fisheye (OpenCV fisheye / Kalibr pinhole-equi, k1..k4)."""
    k1, k2, k3, k4 = dist[0], dist[1], dist[2], dist[3]
    x, y = p[..., 0], p[..., 1]
    r = jnp.sqrt(jnp.maximum(x * x + y * y, 1e-18))
    theta = jnp.arctan(r)
    th2 = theta * theta
    theta_d = theta * (1.0 + th2 * (k1 + th2 * (k2 + th2 * (k3 + th2 * k4))))
    scale = jnp.where(r > 1e-8, theta_d / r, 1.0)
    return p * scale[..., None]


def _distort(cam: Camera, p: jnp.ndarray) -> jnp.ndarray:
    if cam.model == FISHEYE:
        return distort_equi(p, cam.dist)
    return distort_radtan(p, cam.dist)


def _undistort_iter(cam: Camera, pd: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
    """Invert the distortion with fixed-point iteration (OpenCV-style).

    pd: (..., 2) distorted normalized coords -> undistorted normalized coords.
    """
    if cam.model == FISHEYE:
        # invert theta_d -> theta by Newton, then rescale
        k1, k2, k3, k4 = cam.dist[0], cam.dist[1], cam.dist[2], cam.dist[3]
        rd = jnp.linalg.norm(pd, axis=-1)
        theta = rd  # init

        def body(th):
            th2 = th * th
            f = th * (1.0 + th2 * (k1 + th2 * (k2 + th2 * (k3 + th2 * k4)))) - rd
            df = 1.0 + th2 * (3 * k1 + th2 * (5 * k2 + th2 * (7 * k3 + th2 * 9 * k4)))
            return th - f / jnp.maximum(df, 1e-6)

        # unrolled (static iters): a fori_loop here costs `iters` sequential
        # device syncs on the per-frame path for a few dozen flops each
        for _ in range(iters):
            theta = body(theta)
        scale = jnp.where(rd > 1e-8, jnp.tan(theta) / rd, 1.0)
        return pd * scale[..., None]

    # radtan: Gauss-Newton on distort(p) = pd (quadratic convergence; the
    # OpenCV-style fixed-point iteration is too slow at image borders)
    k1, k2, p1, p2 = cam.dist[0], cam.dist[1], cam.dist[2], cam.dist[3]

    def body(p):
        x, y = p[..., 0], p[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + k1 * r2 + k2 * r2 * r2
        dradial = k1 + 2.0 * k2 * r2  # d radial / d r2
        fx_ = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x) - pd[..., 0]
        fy_ = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y - pd[..., 1]
        # analytic 2x2 Jacobian of the distortion map
        j00 = radial + x * dradial * 2.0 * x + 2.0 * p1 * y + 6.0 * p2 * x
        j01 = x * dradial * 2.0 * y + 2.0 * p1 * x + 2.0 * p2 * y
        j10 = y * dradial * 2.0 * x + 2.0 * p2 * y + 2.0 * p1 * x
        j11 = radial + y * dradial * 2.0 * y + 6.0 * p1 * y + 2.0 * p2 * x
        det = j00 * j11 - j01 * j10
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        dx = (j11 * fx_ - j01 * fy_) / det
        dy = (-j10 * fx_ + j00 * fy_) / det
        return jnp.stack([x - dx, y - dy], axis=-1)

    p = pd
    for _ in range(iters):    # unrolled: see fisheye branch note
        p = body(p)
    return p


# ---------------------------------------------------------------------------
# projection API (reference: camera_calibration.hpp:59-81)
# ---------------------------------------------------------------------------

def project_cam_to_image(cam: Camera, x3d: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame 3D point -> *undistorted* pixel coords. (..., 3)->(..., 2)"""
    z = x3d[..., 2]
    invz = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * x3d[..., 0] * invz + cam.cx
    v = cam.fy * x3d[..., 1] * invz + cam.cy
    return jnp.stack([u, v], axis=-1)


def project_cam_to_image_dist(cam: Camera, x3d: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame 3D point -> *distorted/raw* pixel coords."""
    z = x3d[..., 2]
    invz = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    pn = x3d[..., :2] * invz[..., None]
    pdn = _distort(cam, pn)
    u = cam.fx * pdn[..., 0] + cam.cx
    v = cam.fy * pdn[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def undistort_px(cam: Camera, px: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
    """Raw pixel coords -> undistorted pixel coords (same K)."""
    pn = jnp.stack(
        [(px[..., 0] - cam.cx) / cam.fx, (px[..., 1] - cam.cy) / cam.fy], axis=-1
    )
    pu = _undistort_iter(cam, pn, iters)
    return jnp.stack([pu[..., 0] * cam.fx + cam.cx, pu[..., 1] * cam.fy + cam.cy], axis=-1)


def bearing_from_undist_px(cam: Camera, unpx: jnp.ndarray) -> jnp.ndarray:
    """Undistorted pixel -> unit bearing vector (reference: frame.cpp:246-262)."""
    x = (unpx[..., 0] - cam.cx) / cam.fx
    y = (unpx[..., 1] - cam.cy) / cam.fy
    b = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return b / jnp.linalg.norm(b, axis=-1, keepdims=True)


def bearing_from_px(cam: Camera, px: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
    return bearing_from_undist_px(cam, undistort_px(cam, px, iters))


def in_image(cam: Camera, px: jnp.ndarray, border: float = 0.0) -> jnp.ndarray:
    """Valid-ROI test (reference: camera_calibration.cpp:72-75 ROI masks)."""
    u, v = px[..., 0], px[..., 1]
    return (
        (u >= cam.roi_x0 + border)
        & (u < cam.roi_x1 - border)
        & (v >= cam.roi_y0 + border)
        & (v < cam.roi_y1 - border)
    )


# ---------------------------------------------------------------------------
# undistortion / rectification map precompute (setup-time)
# ---------------------------------------------------------------------------

def compute_undist_rect_map(
    cam: Camera,
    R_rect: Optional[jnp.ndarray] = None,
    K_new: Optional[jnp.ndarray] = None,
    size: Optional[Tuple[int, int]] = None,
) -> jnp.ndarray:
    """Build a remap grid: for each output pixel of the rectified image, the
    source (x, y) in the raw image (same semantics as cv::initUndistortRectifyMap;
    reference: camera_calibration.cpp:80-131 setUndistMap / setUndistStereoMap).

    Returns (H, W, 2) float32 source coordinates.
    """
    H, W = (cam.height, cam.width) if size is None else (size[1], size[0])
    Kn = cam.K if K_new is None else K_new
    fxn, fyn = Kn[0, 0], Kn[1, 1]
    cxn, cyn = Kn[0, 2], Kn[1, 2]
    us = jnp.arange(W, dtype=jnp.float32)
    vs = jnp.arange(H, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(us, vs)  # (H, W)
    x = (uu - cxn) / fxn
    y = (vv - cyn) / fyn
    p = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)  # (H, W, 3)
    if R_rect is not None:
        # p is in rectified cam frame; rotate back into raw cam frame
        p = jnp.einsum("ij,hwj->hwi", jnp.asarray(R_rect, p.dtype).T, p)
    pn = p[..., :2] / p[..., 2:3]
    pdn = _distort(cam, pn)
    src_x = cam.fx * pdn[..., 0] + cam.cx
    src_y = cam.fy * pdn[..., 1] + cam.cy
    return jnp.stack([src_x, src_y], axis=-1)


def stereo_rectify(
    cam_l: Camera,
    cam_r: Camera,
    T_rl: lie.SE3,
    alpha: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Bouguet stereo rectification (what the reference gets from
    cv::stereoRectify; reference: camera_calibration.cpp setUndistStereoMap and
    ov2slam.cpp:342-425 setupStereoCalibration).

    Args:
      T_rl: right-camera-from-left-camera transform (x_r = R x_l + t).
    Returns:
      (R_rect_l, R_rect_r, K_new, baseline_px) as numpy arrays: the two
      rectifying rotations, the shared new intrinsic matrix, and fx*baseline.
    """
    R = np.asarray(T_rl.R, np.float64)
    t = np.asarray(T_rl.t, np.float64)

    # float64 host-side Rodrigues (this runs once at setup; keep full precision)
    def _np_log(Rm):
        ct = np.clip((np.trace(Rm) - 1.0) * 0.5, -1.0, 1.0)
        th = np.arccos(ct)
        if th < 1e-10:
            return np.zeros(3)
        v = np.array([Rm[2, 1] - Rm[1, 2], Rm[0, 2] - Rm[2, 0], Rm[1, 0] - Rm[0, 1]])
        return th / (2.0 * np.sin(th)) * v

    def _np_exp(w_):
        th = np.linalg.norm(w_)
        Wm = np.array([[0, -w_[2], w_[1]], [w_[2], 0, -w_[0]], [-w_[1], w_[0], 0]])
        if th < 1e-10:
            return np.eye(3) + Wm
        return (
            np.eye(3)
            + np.sin(th) / th * Wm
            + (1.0 - np.cos(th)) / (th * th) * (Wm @ Wm)
        )

    # split the relative rotation evenly between the two cameras
    w = _np_log(R)
    R_half_r = _np_exp(-w / 2.0)
    R_half_l = _np_exp(w / 2.0)
    # translation between the half-rotated frames
    t_new = R_half_r @ t

    # build the rectifying basis: e1 along the baseline
    e1 = t_new / np.linalg.norm(t_new)
    if abs(t_new[0]) >= abs(t_new[1]):
        # horizontal stereo; keep x-axis pointing in -t direction sign such
        # that the new x axis goes from right cam to left cam origin
        if e1[0] < 0:
            e1 = -e1
    e2 = np.array([-e1[1], e1[0], 0.0])
    n = np.linalg.norm(e2)
    e2 = np.array([0.0, 1.0, 0.0]) if n < 1e-12 else e2 / n
    e3 = np.cross(e1, e2)
    Rw = np.stack([e1, e2, e3], axis=0)  # rows

    R_rect_l = Rw @ R_half_l
    R_rect_r = Rw @ R_half_r

    # shared intrinsics: average focal, principal point centered
    fx = float(0.5 * (float(cam_l.fy) + float(cam_r.fy)))
    W, H = cam_l.width, cam_l.height
    K_new = np.array(
        [[fx, 0.0, W / 2.0], [0.0, fx, H / 2.0], [0.0, 0.0, 1.0]], np.float64
    )
    baseline = float(np.linalg.norm(t))
    return R_rect_l, R_rect_r, K_new, fx * baseline


def camera_with_intrinsics(cam: Camera, K_new: np.ndarray, zero_dist: bool = False) -> Camera:
    """Camera with replaced working intrinsics (post-rectification view)."""
    dt = cam.fx.dtype
    return dataclasses.replace(
        cam,
        fx=jnp.asarray(K_new[0, 0], dt),
        fy=jnp.asarray(K_new[1, 1], dt),
        cx=jnp.asarray(K_new[0, 2], dt),
        cy=jnp.asarray(K_new[1, 2], dt),
        dist=jnp.zeros_like(cam.dist) if zero_dist else cam.dist,
    )
