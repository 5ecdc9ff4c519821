"""SO(3)/SE(3) Lie-group operations, batched and jit-friendly.

Covers what the reference gets from Sophus (Thirdparty/Sophus/sophus/se3.hpp,
so3.hpp): exp/log, compose/inverse/apply, adjoint, quaternion conversions, and
the left-multiplicative boxplus update used by its SE(3) Ceres
parameterization (reference: include/ceres_parametrization/
ceres_parametrization/se3left_parametrization.hpp:39-73).

Conventions
-----------
* A pose is a pair ``(R, t)``: rotation matrix ``(..., 3, 3)`` and translation
  ``(..., 3)``. All functions broadcast over leading batch dims.
* se(3) tangent vectors are ``(..., 6)`` ordered ``[upsilon, omega]``
  (translational part first, like Sophus).
* All small-angle paths use Taylor expansions switched with ``jnp.where`` so
  gradients stay finite under jit.

f32 is the working precision on TPU; tests compare against a float64 numpy
oracle at ~1e-5 tolerances.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-8


class SE3(NamedTuple):
    """Rigid transform: ``x_out = R @ x + t``. Batched over leading dims."""

    R: jnp.ndarray  # (..., 3, 3)
    t: jnp.ndarray  # (..., 3)

    @property
    def batch_shape(self):
        return self.t.shape[:-1]

    def matrix(self) -> jnp.ndarray:
        """(..., 4, 4) homogeneous matrix."""
        Rt = jnp.concatenate([self.R, self.t[..., :, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=Rt.dtype),
            Rt.shape[:-2] + (1, 4),
        )
        return jnp.concatenate([Rt, bottom], axis=-2)

    @staticmethod
    def from_matrix(T: jnp.ndarray) -> "SE3":
        return SE3(T[..., :3, :3], T[..., :3, 3])

    @staticmethod
    def identity(batch_shape: Tuple[int, ...] = (), dtype=jnp.float32) -> "SE3":
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))
        t = jnp.zeros(batch_shape + (3,), dtype=dtype)
        return SE3(R, t)


# ---------------------------------------------------------------------------
# so(3)
# ---------------------------------------------------------------------------

def hat(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) skew -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_cos_coeffs(theta2: jnp.ndarray):
    """Return (A, B, C) = (sin th/th, (1-cos th)/th^2, (th - sin th)/th^3)
    with Taylor fallbacks for small angles."""
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    small = theta2 < 1e-8
    # guard the denominators so the unused branch stays finite
    th2s = jnp.where(small, 1.0, theta2)
    ths = jnp.sqrt(th2s)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(ths) / ths)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(ths)) / th2s)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (ths - jnp.sin(ths)) / (th2s * ths))
    return A, B, C


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: (..., 3) axis-angle -> (..., 3, 3) rotation."""
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_cos_coeffs(theta2)
    W = hat(w)
    W2 = W @ W
    I = jnp.eye(3, dtype=w.dtype)
    return I + A[..., None, None] * W + B[..., None, None] * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation -> (..., 3) axis-angle. Safe near 0 and pi."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # generic branch: theta / (2 sin theta) * (R - R^T)^vee
    sin_theta = jnp.sin(theta)
    near_pi = cos_theta < -1.0 + 1e-6
    near_0 = sin_theta < 1e-6
    generic = ~(near_pi | (near_0 & (cos_theta > 0)))

    safe_sin = jnp.where(near_0, 1.0, sin_theta)
    w_generic = (theta / (2.0 * safe_sin))[..., None] * vee(R - jnp.swapaxes(R, -1, -2))

    # small-angle: vee(R - R^T)/2 * (1 + theta^2/6)
    w_small = 0.5 * (1.0 + theta[..., None] ** 2 / 6.0) * vee(R - jnp.swapaxes(R, -1, -2))

    # near pi: |w_i| from diagonal, signs from the largest off-diagonal column
    # R = I + (2/pi^2-ish) ... use: R + I = 2(cos) I + (1 - cos) (I + nn^T) -> nn^T
    S = R + jnp.eye(3, dtype=R.dtype)  # columns proportional to axis n
    col_norms = jnp.linalg.norm(S, axis=-2)
    k = jnp.argmax(col_norms, axis=-1)
    n = jnp.take_along_axis(S, k[..., None, None], axis=-1)[..., 0]
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), _EPS)
    w_pi = theta[..., None] * n

    w = jnp.where(generic[..., None], w_generic, jnp.where(near_pi[..., None], w_pi, w_small))
    return w


def so3_left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian J_l of SO(3): exp((J_l dw)^) ≈ exp((w+dw)^) exp(-w^)."""
    theta2 = jnp.sum(w * w, axis=-1)
    _, B, C = _sinc_cos_coeffs(theta2)
    W = hat(w)
    I = jnp.eye(3, dtype=w.dtype)
    return I + B[..., None, None] * W + C[..., None, None] * (W @ W)


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------

def se3_exp(xi: jnp.ndarray) -> SE3:
    """(..., 6) tangent [upsilon, omega] -> SE3."""
    v, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    V = so3_left_jacobian(w)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return SE3(R, t)


def se3_log(T: SE3) -> jnp.ndarray:
    """SE3 -> (..., 6) tangent [upsilon, omega]."""
    from ov2slam_tpu.core import smallalg
    w = so3_log(T.R)
    V = so3_left_jacobian(w)
    # closed-form 3x3 inverse: jnp.linalg.solve lowers to a sequential
    # device loop that costs ~0.1 ms of latency on the pose-graph/BA paths
    v = jnp.einsum("...ij,...j->...i", smallalg.inv3(V), T.t)
    return jnp.concatenate([v, w], axis=-1)


def se3_inverse(T: SE3) -> SE3:
    Rt = jnp.swapaxes(T.R, -1, -2)
    return SE3(Rt, -jnp.einsum("...ij,...j->...i", Rt, T.t))


def se3_compose(A: SE3, B: SE3) -> SE3:
    """A ∘ B (apply B first)."""
    R = A.R @ B.R
    t = jnp.einsum("...ij,...j->...i", A.R, B.t) + A.t
    return SE3(R, t)


def se3_apply(T: SE3, x: jnp.ndarray) -> jnp.ndarray:
    """Transform points ``x`` (..., 3). Broadcasts pose over point batches."""
    return jnp.einsum("...ij,...j->...i", T.R, x) + T.t


def se3_boxplus_left(T: SE3, xi: jnp.ndarray) -> SE3:
    """Left-multiplicative update exp(xi) ∘ T — the update rule of the
    reference's SE3 parameterization (se3left_parametrization.hpp:54-60)."""
    return se3_compose(se3_exp(xi), T)


def se3_adjoint(T: SE3) -> jnp.ndarray:
    """(..., 6, 6) adjoint: Ad_T [v; w] = [Rv + t x Rw; Rw]."""
    R = T.R
    tx = hat(T.t)
    top = jnp.concatenate([R, tx @ R], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(R), R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def se3_relative(A: SE3, B: SE3) -> SE3:
    """A^-1 ∘ B."""
    return se3_compose(se3_inverse(A), B)


# ---------------------------------------------------------------------------
# Quaternions (for trajectory output / interop). Convention: (x, y, z, w),
# Hamilton, matching TUM-format trajectory files (reference: logger.hpp:150).
# ---------------------------------------------------------------------------

def quat_from_mat(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) quaternion (x, y, z, w), branch-free Shepperd."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate quaternions (unnormalized), one per dominant component
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)        # w-dominant (w,x,y,z)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11], axis=-1)

    # pick the numerically best branch
    c0 = tr
    c1 = m00 - m11 - m22
    c2 = m11 - m00 - m22
    c3 = m22 - m00 - m11
    cands = jnp.stack([c0, c1, c2, c3], axis=-1)
    idx = jnp.argmax(cands, axis=-1)
    q_wxyz = jnp.select(
        [idx[..., None] == 0, idx[..., None] == 1, idx[..., None] == 2],
        [qw, qx, qy],
        qz,
    )
    q_wxyz = q_wxyz / jnp.maximum(jnp.linalg.norm(q_wxyz, axis=-1, keepdims=True), _EPS)
    # canonical sign: w >= 0
    q_wxyz = jnp.where(q_wxyz[..., :1] < 0, -q_wxyz, q_wxyz)
    # reorder to (x, y, z, w)
    return jnp.concatenate([q_wxyz[..., 1:], q_wxyz[..., :1]], axis=-1)


def mat_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) quaternion (x, y, z, w) -> (..., 3, 3)."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def se3_normalize(T: SE3) -> SE3:
    """Re-orthonormalize R via quaternion round trip (drift control)."""
    return SE3(mat_from_quat(quat_from_mat(T.R)), T.t)


# batched stacking helpers -------------------------------------------------

def se3_stack(poses) -> SE3:
    return SE3(jnp.stack([p.R for p in poses]), jnp.stack([p.t for p in poses]))


def se3_index(T: SE3, idx) -> SE3:
    return SE3(T.R[idx], T.t[idx])
