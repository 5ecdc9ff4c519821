"""Reprojection residuals + analytic Jacobians for the NLLS engine.

The device-side equivalents of the reference's hand-written Ceres cost
functions (reference: src/ceres_parametrization.cpp:107-713, namespace
DirectLeftSE3): mono/right-cam reprojection with XYZ or anchored-inverse-depth
landmarks, motion-only variant, and the relative SE(3) pose factor. All use
the same left-multiplicative SE(3) update ``T' = exp(xi) T``
(se3left_parametrization.hpp:39-73); all are batched over observations.

Conventions: poses are world-to-camera (T_cw); px are *undistorted* pixel
observations; calibration (fx, fy, cx, cy) is held fixed (the reference also
sets it constant in every solve, optimizer.cpp:118-126).

Huber weighting follows the IRLS form: w = 1 for |r|^2 <= th^2 else th/|r|,
applied as sqrt-weights on residual and Jacobian rows.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ov2slam_tpu.core import lie
from ov2slam_tpu.core.lie import SE3


class Calib(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray


def project(calib: Calib, Xc: jnp.ndarray) -> jnp.ndarray:
    z = Xc[..., 2]
    iz = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    return jnp.stack(
        [calib.fx * Xc[..., 0] * iz + calib.cx, calib.fy * Xc[..., 1] * iz + calib.cy],
        axis=-1,
    )


def _dproj_dXc(calib: Calib, Xc: jnp.ndarray) -> jnp.ndarray:
    """(..., 2, 3) Jacobian of pixel projection wrt camera-frame point."""
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    iz = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    iz2 = iz * iz
    zero = jnp.zeros_like(x)
    row_u = jnp.stack([calib.fx * iz, zero, -calib.fx * x * iz2], axis=-1)
    row_v = jnp.stack([zero, calib.fy * iz, -calib.fy * y * iz2], axis=-1)
    return jnp.stack([row_u, row_v], axis=-2)


def _dXc_dxi(Xc: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 6) for the left-mult update: dXc = dv + dw x Xc = [I | -hat(Xc)] xi."""
    I = jnp.broadcast_to(jnp.eye(3, dtype=Xc.dtype), Xc.shape[:-1] + (3, 3))
    return jnp.concatenate([I, -lie.hat(Xc)], axis=-1)


# ---------------------------------------------------------------------------
# factor: motion-only reprojection (ReprojectionErrorSE3,
# ceres_parametrization.cpp:301-360)
# ---------------------------------------------------------------------------

def reproj_se3(
    calib: Calib, T_cw: SE3, Xw: jnp.ndarray, obs_px: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Residual (N, 2), J_pose (N, 2, 6), depth-positive (N,)."""
    Xc = lie.se3_apply(T_cw, Xw)
    r = project(calib, Xc) - obs_px
    J = _dproj_dXc(calib, Xc) @ _dXc_dxi(Xc)
    return r, J, Xc[..., 2] > 0


# ---------------------------------------------------------------------------
# factor: pose + XYZ landmark (ReprojectionErrorKSE3XYZ, :107-196)
# ---------------------------------------------------------------------------

def reproj_xyz(
    calib: Calib, T_cw: SE3, Xw: jnp.ndarray, obs_px: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Residual (N, 2), J_pose (N, 2, 6), J_point (N, 2, 3), depth>0 (N,)."""
    Xc = lie.se3_apply(T_cw, Xw)
    r = project(calib, Xc) - obs_px
    dpdX = _dproj_dXc(calib, Xc)
    Jp = dpdX @ _dXc_dxi(Xc)
    Jx = dpdX @ jnp.broadcast_to(T_cw.R, Xc.shape[:-1] + (3, 3))
    return r, Jp, Jx, Xc[..., 2] > 0


# ---------------------------------------------------------------------------
# factor: right camera + XYZ (ReprojectionErrorRightCamKSE3XYZ, :198-300)
# T_rl: right-from-left extrinsic (fixed)
# ---------------------------------------------------------------------------

def reproj_xyz_right(
    calib: Calib, T_rl: SE3, T_cw: SE3, Xw: jnp.ndarray, obs_px: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    Xl = lie.se3_apply(T_cw, Xw)
    Xr = lie.se3_apply(T_rl, Xl)
    r = project(calib, Xr) - obs_px
    dpdXr = _dproj_dXc(calib, Xr)
    Rrl = jnp.broadcast_to(T_rl.R, Xl.shape[:-1] + (3, 3))
    Jp = dpdXr @ (Rrl @ _dXc_dxi(Xl))
    Jx = dpdXr @ (Rrl @ jnp.broadcast_to(T_cw.R, Xl.shape[:-1] + (3, 3)))
    return r, Jp, Jx, Xr[..., 2] > 0


# ---------------------------------------------------------------------------
# factor: anchored inverse depth (ReprojectionErrorKSE3AnchInvDepth, :361-475
# and right-cam variants :476-713)
#
# landmark = bearing b_a (z=1) in anchor cam + inverse depth lam:
#   Xw = T_wa (b_a / lam);  residual in observer cam (optionally right cam).
# ---------------------------------------------------------------------------

def reproj_anch_invdepth(
    calib: Calib,
    T_wa: SE3,              # anchor cam-to-world
    T_cw: SE3,              # observer world-to-cam
    b_a: jnp.ndarray,       # (N, 3) anchor-frame bearing, z=1
    lam: jnp.ndarray,       # (N,) inverse depth
    obs_px: jnp.ndarray,    # (N, 2)
    T_rl: SE3 = None,       # optional right-cam extrinsic
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Residual (N,2), J_obs_pose (N,2,6), J_anchor_pose (N,2,6),
    J_lam (N,2,1), depth>0 (N,)."""
    ilam = 1.0 / jnp.where(jnp.abs(lam) < 1e-9, 1e-9, lam)
    Xa = b_a * ilam[..., None]
    Xw = lie.se3_apply(T_wa, Xa)
    Xl = lie.se3_apply(T_cw, Xw)
    if T_rl is None:
        Xc = Xl
        R_extra = None
    else:
        Xc = lie.se3_apply(T_rl, Xl)
        R_extra = T_rl.R
    r = project(calib, Xc) - obs_px
    dpdXc = _dproj_dXc(calib, Xc)
    if R_extra is not None:
        dpdXl = dpdXc @ jnp.broadcast_to(R_extra, Xl.shape[:-1] + (3, 3))
    else:
        dpdXl = dpdXc
    # observer pose (left-mult on T_cw)
    J_obs = dpdXl @ _dXc_dxi(Xl)
    # anchor pose (left-mult on T_wa): dXw = [I | -hat(Xw)] xi_a
    Rcw = jnp.broadcast_to(T_cw.R, Xl.shape[:-1] + (3, 3))
    J_anc = dpdXl @ (Rcw @ _dXc_dxi(Xw))
    # inverse depth: dXa/dlam = -b_a / lam^2
    dXw_dlam = jnp.einsum("...ij,...j->...i", T_wa.R, -b_a * (ilam * ilam)[..., None])
    J_lam = (dpdXl @ (Rcw @ dXw_dlam[..., None]))
    return r, J_obs, J_anc, J_lam, Xc[..., 2] > 0


# ---------------------------------------------------------------------------
# factor: relative SE(3) pose (LeftSE3RelativePoseError,
# se3left_parametrization.hpp:76-99): r = log(T_ab_meas^-1 T_aw T_wb)
# with T_*w world-to-cam convention -> relative pose a->b.
# ---------------------------------------------------------------------------

def relpose_residual(T_a: SE3, T_b: SE3, T_ab_meas: SE3) -> jnp.ndarray:
    """(..., 6) residual: log(meas^-1 (T_a T_b^-1)) for world-to-cam poses
    where meas = T_a T_b^-1 at the measurement time."""
    T_ab = lie.se3_compose(T_a, lie.se3_inverse(T_b))
    return lie.se3_log(lie.se3_compose(lie.se3_inverse(T_ab_meas), T_ab))


def se3_ad(xi: jnp.ndarray) -> jnp.ndarray:
    """(…, 6, 6) adjoint of the Lie algebra: ad([v, w]) = [[w^, v^], [0, w^]]."""
    v, w = xi[..., :3], xi[..., 3:]
    W = lie.hat(w)
    V = lie.hat(v)
    Z = jnp.zeros_like(W)
    top = jnp.concatenate([W, V], axis=-1)
    bot = jnp.concatenate([Z, W], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def se3_left_jac_inv(xi: jnp.ndarray) -> jnp.ndarray:
    """Inverse left Jacobian of SE(3), Bernoulli series truncated at ad^2:
    J_l^-1(xi) ≈ I - ad(xi)/2 + ad(xi)^2/12 (exact enough for the small
    residuals of pose-graph factors; the residual itself stays exact)."""
    A = se3_ad(xi)
    I = jnp.broadcast_to(jnp.eye(6, dtype=xi.dtype), A.shape)
    return I - 0.5 * A + (1.0 / 12.0) * (A @ A)


def relpose_jacobians(T_a: SE3, T_b: SE3, T_ab_meas: SE3):
    """Analytic 6x6 Jacobians wrt left-mult updates of T_a and T_b.

    With M = meas^-1 T_a T_b^-1 and r = log(M):
      perturbing T_a: M' = exp(Ad(meas^-1) xi) M  =>  Ja = Jl^-1(r) Ad(meas^-1)
      perturbing T_b: M' = M exp(-xi)            =>  Jb = -Jr^-1(r) = -Jl^-1(-r)
    (The arccos-based log is not autodiff-safe at zero residual, so these are
    closed-form — the reference's Ceres analytic Jacobians play the same role,
    se3left_parametrization.hpp:76-99.)
    """
    r = relpose_residual(T_a, T_b, T_ab_meas)
    Ad_minv = lie.se3_adjoint(lie.se3_inverse(T_ab_meas))
    Ja = se3_left_jac_inv(r) @ Ad_minv
    Jb = -se3_left_jac_inv(-r)
    return r, Ja, Jb


# ---------------------------------------------------------------------------
# robust weights
# ---------------------------------------------------------------------------

def huber_weight(chi2: jnp.ndarray, th2: jnp.ndarray) -> jnp.ndarray:
    """IRLS sqrt-weight for the Huber loss with threshold th = sqrt(th2) on
    the squared norm chi2 = |r|^2 (the reference uses Huber(sqrt(5.9915)) on
    pixel residuals, optimizer.cpp:270)."""
    w2 = jnp.where(chi2 <= th2, 1.0, jnp.sqrt(th2 / jnp.maximum(chi2, 1e-12)))
    return jnp.sqrt(w2)
