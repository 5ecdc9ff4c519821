"""Small fixed-size linear algebra, fully unrolled for TPU.

jnp.linalg.{svd, eigh, solve, inv} on small matrices lower to sequential
device while-loops (LAPACK-style iterations of tiny dynamic-update-slice
steps) — each one costs ~0.1-0.4 ms of latency-bound device time on the
per-frame SLAM path regardless of FLOPs. Everything here is straight-line
code at trace time (Python loops over STATIC dims, fixed Jacobi sweep
counts), so XLA fuses it into the surrounding computation with zero loop
overhead, and every function vmaps/batches cleanly.

Sizes are tiny (n <= 9) so the unrolled op count is trivial; numerics are
f32 and match the LAPACK routines to ~1e-5 relative (tests/test_smallalg.py
checks each against numpy on random batches).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Cholesky solve (SPD), unrolled
# ---------------------------------------------------------------------------

def solve_spd(H: jnp.ndarray, g: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Solve H x = g for SPD H of static size (..., n, n), g (..., n).

    Unrolled Cholesky + two triangular solves. Singular/ill-conditioned
    inputs produce large-but-finite outputs (diagonal guarded by eps);
    callers gate on their own damping/validity as usual.
    """
    n = H.shape[-1]
    # unrolled Cholesky: L lower-triangular, H = L L^T
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = H[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, eps))
            else:
                L[i][j] = s / L[j][j]
    # forward substitution L y = g
    y = [None] * n
    for i in range(n):
        s = g[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution L^T x = y
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


# ---------------------------------------------------------------------------
# 3x3 closed-form inverse (adjugate)
# ---------------------------------------------------------------------------

def inv3(A: jnp.ndarray, eps: float = 1e-30) -> jnp.ndarray:
    """Closed-form inverse of (..., 3, 3) via the adjugate."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    det = jnp.where(jnp.abs(det) < eps, eps, det)
    inv = jnp.stack([
        jnp.stack([A11, A12, A13], axis=-1),
        jnp.stack([A21, A22, A23], axis=-1),
        jnp.stack([A31, A32, A33], axis=-1),
    ], axis=-2)
    return inv / det[..., None, None]


# ---------------------------------------------------------------------------
# symmetric eigendecomposition: fixed-sweep cyclic Jacobi, unrolled
# ---------------------------------------------------------------------------

def eigh_jacobi(A: jnp.ndarray, sweeps: int = 6
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eigendecomposition of symmetric (..., n, n), n static and small.

    Fixed `sweeps` of unrolled cyclic Jacobi rotations (quadratic
    convergence: 5-6 sweeps reach ~f32 machine precision for n<=9).
    Returns (w, V) with w ASCENDING and A = V diag(w) V^T, like
    jnp.linalg.eigh.

    Each rotation is applied as dense (n, n) matmuls with a rotation matrix
    assembled from static one-hots — a handful of HLO ops per rotation (the
    slice/stack row-update formulation produced ~60 ops per rotation and
    blew XLA compile time up by minutes at 9x9). The angle uses half-angle
    square roots, no trig.
    """
    import numpy as np
    n = A.shape[-1]
    dt = A.dtype
    I = jnp.asarray(np.eye(n), dt)
    V = jnp.broadcast_to(I, A.shape)
    onehots = {}
    for p in range(n):
        for q in range(n):
            m = np.zeros((n, n), np.float64)
            m[p, q] = 1.0
            onehots[(p, q)] = jnp.asarray(m, dt)
    def one_sweep(_, carry):
        A, V = carry
        for p in range(n - 1):
            for q in range(p + 1, n):
                app = A[..., p, p]
                aqq = A[..., q, q]
                apq = A[..., p, q]
                # c = cos θ, s = sin θ with θ = 0.5 atan2(2 apq, app - aqq),
                # via half-angle identities (θ ∈ (-π/2, π/2] ⇒ c >= 0)
                x = app - aqq
                y = 2.0 * apq
                h = jnp.maximum(jnp.sqrt(x * x + y * y), 1e-30)
                c = jnp.sqrt(jnp.maximum((1.0 + x / h) * 0.5, 0.0))
                s = jnp.sign(y) * jnp.sqrt(
                    jnp.maximum((1.0 - x / h) * 0.5, 0.0))
                small = jnp.abs(y) < 1e-30
                c = jnp.where(small, 1.0, c)[..., None, None]
                s = jnp.where(small, 0.0, s)[..., None, None]
                # J: identity with [[c, s], [-s, c]] in the (p, q) plane;
                # A <- J A J^T zeroes A[p, q], V accumulates V J^T
                J = (I + (c - 1.0) * (onehots[(p, p)] + onehots[(q, q)])
                     + s * onehots[(p, q)] - s * onehots[(q, p)])
                Jt = jnp.swapaxes(J, -1, -2)
                A = J @ A @ Jt
                V = V @ Jt
        return A, V

    # roll the sweeps (keep the (p, q) cycle unrolled — indices must be
    # static for the one-hot rotation assembly): one sweep of HLO instead of
    # six; at 9x9 vmapped over hundreds of RANSAC hypotheses the unrolled
    # form dominated XLA compile time (segfaulted the CPU LLVM backend)
    A, V = jax.lax.fori_loop(0, sweeps, one_sweep, (A, V))
    w = jnp.diagonal(A, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w, V


def smallest_eigvec(A: jnp.ndarray, sweeps: int = 6) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue of symmetric (..., n, n)."""
    _, V = eigh_jacobi(A, sweeps)
    v = V[..., :, 0]
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


# ---------------------------------------------------------------------------
# 3x3 SVD pieces built on eigh_jacobi
# ---------------------------------------------------------------------------

def svd3(E: jnp.ndarray, sweeps: int = 6
         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """SVD of (..., 3, 3): returns (U, s, Vt) with s DESCENDING, E = U s Vt.

    Via eigh of E E^T (left basis) with the right basis recovered as
    v_i = E^T u_i / s_i; the third right vector comes from the cross
    product so rank-2 inputs (essential matrices) stay well-defined.
    U and V are proper orthogonal up to column signs (like any SVD).
    """
    G = E @ jnp.swapaxes(E, -1, -2)
    w, U = eigh_jacobi(G, sweeps)            # ascending
    # descending order
    w = w[..., ::-1]
    U = U[..., :, ::-1]
    s = jnp.sqrt(jnp.maximum(w, 0.0))
    v0 = jnp.einsum("...ji,...j->...i", E, U[..., :, 0])
    v0 = v0 / jnp.maximum(jnp.linalg.norm(v0, axis=-1, keepdims=True), 1e-20)
    v1 = jnp.einsum("...ji,...j->...i", E, U[..., :, 1])
    # orthogonalize v1 against v0 (degenerate s1≈s0 cases)
    v1 = v1 - jnp.sum(v1 * v0, axis=-1, keepdims=True) * v0
    v1 = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=-1, keepdims=True), 1e-20)
    # third direction from the cross product (stays defined at s2 = 0), sign
    # matched to the true E^T u2 so full-rank inputs reconstruct exactly
    v2 = jnp.cross(v0, v1)
    w2 = jnp.einsum("...ji,...j->...i", E, U[..., :, 2])
    flip = jnp.sum(v2 * w2, axis=-1, keepdims=True) < 0
    v2 = jnp.where(flip, -v2, v2)
    Vt = jnp.stack([v0, v1, v2], axis=-2)
    return U, s, Vt


def essential_project(E: jnp.ndarray, sweeps: int = 6) -> jnp.ndarray:
    """Project (..., 3, 3) onto the essential manifold: singular values
    -> (1, 1, 0) (the reference's U diag(1,1,0) V^T step)."""
    U, _, Vt = svd3(E, sweeps)
    return (U[..., :, 0:1] * Vt[..., 0:1, :]
            + U[..., :, 1:2] * Vt[..., 1:2, :])


# ---------------------------------------------------------------------------
# Procrustes rotation (Wahba/Kabsch) via the quaternion (Davenport) method
# ---------------------------------------------------------------------------

def procrustes_rotation(M: jnp.ndarray, sweeps: int = 6) -> jnp.ndarray:
    """The proper rotation R maximizing trace(R^T M) for (..., 3, 3) M
    (Kabsch with M = sum_i b_i a_i^T gives b ~= R a).

    Quaternion method: R's quaternion is the largest eigenvector of the
    symmetric 4x4 Davenport K-matrix — a 4x4 Jacobi eigh, unrolled, instead
    of the 3x3 SVD + det-fix (which needs a full SVD and a reflection
    branch). Handles reflections/degenerate M like the SVD formulation.
    """
    m00, m01, m02 = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    m10, m11, m12 = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    m20, m21, m22 = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    K = jnp.stack([
        jnp.stack([m00 + m11 + m22, m21 - m12, m02 - m20, m10 - m01], -1),
        jnp.stack([m21 - m12, m00 - m11 - m22, m01 + m10, m02 + m20], -1),
        jnp.stack([m02 - m20, m01 + m10, -m00 + m11 - m22, m12 + m21], -1),
        jnp.stack([m10 - m01, m02 + m20, m12 + m21, -m00 - m11 + m22], -1),
    ], axis=-2)
    w, V = eigh_jacobi(K, sweeps)
    q = V[..., :, -1]                       # largest eigenvalue (ascending)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-20)
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack([
        jnp.stack([1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz),
                   2 * (qx * qz + qw * qy)], -1),
        jnp.stack([2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz),
                   2 * (qy * qz - qw * qx)], -1),
        jnp.stack([2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx),
                   1 - 2 * (qx * qx + qy * qy)], -1),
    ], axis=-2)
    return R
