"""Multi-view geometry: batched triangulation, essential-matrix and PnP
RANSAC, epipolar distances.

Replaces the reference's MultiViewGeometry (reference: src/multi_view_geometry
.cpp:53-837) and its OpenGV backend (Kneip P3P, Nister 5-pt, triangulate2,
RANSAC scaffolding).

TPU-first redesign: RANSAC is not a sequential host loop with early exit — it
is a fixed batch of K hypotheses, each from a vmapped minimal/linear solver,
scored against all N correspondences at once ((K, N) error matrix -> argmax
inliers). We trade the reference's adaptive 100-iteration loop for hundreds of
hypotheses evaluated in parallel, which is both faster on TPU and more robust.
Minimal solvers are chosen for batchability: 8-pt essential (batched SVD)
instead of Nister 5-pt, quartic-free P3P (Grunert with closed-form quartic)
for pose from 3 points.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ov2slam_tpu.core import lie
from ov2slam_tpu.core import smallalg
from ov2slam_tpu.core.lie import SE3


# ---------------------------------------------------------------------------
# triangulation
# ---------------------------------------------------------------------------

def triangulate_midpoint(T_ab: SE3, bv_a: jnp.ndarray, bv_b: jnp.ndarray) -> jnp.ndarray:
    """Midpoint triangulation in frame a (opengv::triangulation::triangulate2
    semantics, reference: multi_view_geometry.cpp:53-136).

    T_ab: b-to-a transform (pose of cam b in frame a). bv_a/bv_b: (..., 3)
    unit bearings in their own camera frames. Returns (..., 3) points in
    frame a.
    """
    r1 = bv_a
    r2 = jnp.einsum("ij,...j->...i", T_ab.R, bv_b)
    o2 = T_ab.t
    # solve [r1 -r2] [d1 d2]^T = o2 in least squares (2x2 normal equations)
    a = jnp.sum(r1 * r1, axis=-1)
    b = -jnp.sum(r1 * r2, axis=-1)
    c = jnp.sum(r2 * r2, axis=-1)
    e1 = jnp.sum(r1 * o2, axis=-1)
    e2 = -jnp.sum(r2 * o2, axis=-1)
    det = a * c - b * b
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    d1 = (c * e1 - b * e2) / det
    d2 = (a * e2 - b * e1) / det
    p1 = r1 * d1[..., None]
    p2 = o2 + r2 * d2[..., None]
    return 0.5 * (p1 + p2)


# ---------------------------------------------------------------------------
# epipolar geometry
# ---------------------------------------------------------------------------

def essential_from_pose(T_ab: SE3) -> jnp.ndarray:
    """E such that bv_a^T E bv_b = 0, from the b-to-a transform."""
    t = T_ab.t
    tn = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    return lie.hat(tn) @ T_ab.R


def fundamental_from_poses(K_a: jnp.ndarray, K_b: jnp.ndarray, T_ab: SE3) -> jnp.ndarray:
    """F for raw pixels: px_a^T F px_b = 0 (reference: multi_view_geometry.hpp
    :118-125 computeFundamentalMat12, used for the stereo epipolar check)."""
    E = lie.hat(T_ab.t) @ T_ab.R
    return jnp.linalg.inv(K_a).T @ E @ jnp.linalg.inv(K_b)


def sampson_dist(E: jnp.ndarray, x_a: jnp.ndarray, x_b: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) distance on normalized image coords.

    x_a/x_b: (..., 3) homogeneous normalized coords (z=1) or bearings.
    Matches MultiViewGeometry::computeSampsonDistance.
    """
    Ex_b = jnp.einsum("ij,...j->...i", E, x_b)
    Etx_a = jnp.einsum("ji,...j->...i", E, x_a)
    num = jnp.sum(x_a * Ex_b, axis=-1)
    den = Ex_b[..., 0] ** 2 + Ex_b[..., 1] ** 2 + Etx_a[..., 0] ** 2 + Etx_a[..., 1] ** 2
    return num * num / jnp.maximum(den, 1e-12)


def epipolar_line_dist(E: jnp.ndarray, x_a: jnp.ndarray, x_b: jnp.ndarray) -> jnp.ndarray:
    """Point-to-epipolar-line distance of x_a against line E x_b (normalized
    coords)."""
    l = jnp.einsum("ij,...j->...i", E, x_b)
    num = jnp.abs(jnp.sum(x_a * l, axis=-1))
    den = jnp.sqrt(l[..., 0] ** 2 + l[..., 1] ** 2)
    return num / jnp.maximum(den, 1e-12)


# ---------------------------------------------------------------------------
# 8-point essential matrix (batched minimal-ish solver for RANSAC)
# ---------------------------------------------------------------------------

def _eight_point(x_a: jnp.ndarray, x_b: jnp.ndarray) -> jnp.ndarray:
    """Essential from >=8 normalized correspondences; (M, 3) each -> (3, 3).

    Linear 8-pt with rank-2 + equal-singular-value projection (the essential
    manifold projection). The null vector comes from an unrolled Jacobi eigh
    of A^T A (9x9) instead of an SVD of A — jnp.linalg.svd lowers to a
    sequential device while-loop that costs ~ms at RANSAC batch sizes."""
    # rows: [xb*xa, xb*ya, xb, yb*xa, yb*ya, yb, xa, ya, 1] for xa^T E xb = 0
    xa, ya = x_a[:, 0], x_a[:, 1]
    xb, yb = x_b[:, 0], x_b[:, 1]
    A = jnp.stack(
        [xa * xb, xa * yb, xa, ya * xb, ya * yb, ya, xb, yb, jnp.ones_like(xa)],
        axis=-1,
    )  # row [i] . vec(E) with E row-major: sum_ij E_ij a_i b_j
    E = smallalg.smallest_eigvec(A.T @ A).reshape(3, 3)
    # project to the essential manifold: singular values (1, 1, 0)
    return smallalg.essential_project(E)


def decompose_essential(
    E: jnp.ndarray, x_a: jnp.ndarray, x_b: jnp.ndarray, mask: jnp.ndarray
) -> SE3:
    """Pick the (R, t) with max points in front of both cameras
    (cv::recoverPose semantics). Returns T_ab with |t| = 1."""
    u, _, vt = smallalg.svd3(E)
    # enforce det +1
    d = jnp.linalg.det(u) * jnp.linalg.det(vt)
    vt = vt * jnp.where(d < 0, -1.0, 1.0)
    Wm = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = u @ Wm @ vt
    R2 = u @ Wm.T @ vt
    t = u[:, 2]

    def chirality(R, tt):
        T = SE3(R, tt)
        X_a = triangulate_midpoint(T, x_a, x_b)  # points in frame a
        X_b = jnp.einsum("ij,...j->...i", R.T, X_a - tt)
        good = (X_a[..., 2] > 0) & (X_b[..., 2] > 0) & mask
        return jnp.sum(good)

    cands_R = jnp.stack([R1, R1, R2, R2])
    cands_t = jnp.stack([t, -t, t, -t])
    scores = jax.vmap(chirality)(cands_R, cands_t)
    k = jnp.argmax(scores)
    return SE3(cands_R[k], cands_t[k])


def refine_essential_pose(T: SE3, x_a: jnp.ndarray, x_b: jnp.ndarray,
                          w: jnp.ndarray, iters: int = 8) -> SE3:
    """Gauss-Newton refinement of a relative pose on weighted Sampson
    residuals (the gold-standard local polish after RANSAC; the reference
    relies on OpenGV's optimize_nonlinear refine flag,
    multi_view_geometry.cpp:214-216). T is the b-to-a transform; |t| is
    renormalized each step (scale is unobservable)."""

    def resid(xi, R, t):
        Td = lie.se3_boxplus_left(SE3(R, t), xi)
        tn = Td.t / jnp.maximum(jnp.linalg.norm(Td.t), 1e-12)
        E = lie.hat(tn) @ Td.R
        Ex_b = jnp.einsum("ij,nj->ni", E, x_b)
        Etx_a = jnp.einsum("ji,nj->ni", E, x_a)
        num = jnp.sum(x_a * Ex_b, axis=-1)
        den = (Ex_b[:, 0] ** 2 + Ex_b[:, 1] ** 2
               + Etx_a[:, 0] ** 2 + Etx_a[:, 1] ** 2)
        return num / jnp.sqrt(jnp.maximum(den, 1e-18)) * w

    def step(carry, _):
        R, t = carry
        z = jnp.zeros(6, x_a.dtype)
        r = resid(z, R, t)
        J = jax.jacfwd(resid)(z, R, t)               # (N, 6)
        H = J.T @ J + 1e-9 * jnp.eye(6, dtype=x_a.dtype)
        g = J.T @ r
        Tn = lie.se3_boxplus_left(SE3(R, t), -smallalg.solve_spd(H, g))
        tn = Tn.t / jnp.maximum(jnp.linalg.norm(Tn.t), 1e-12)
        return (Tn.R, tn), None

    (R_f, t_f), _ = jax.lax.scan(step, (T.R, T.t), None, length=iters)
    return SE3(R_f, t_f)


class RansacResult(NamedTuple):
    model: jnp.ndarray       # best model params
    inliers: jnp.ndarray     # (N,) bool
    n_inliers: jnp.ndarray   # scalar
    success: jnp.ndarray     # scalar bool


@functools.partial(jax.jit, static_argnames=("n_hyps", "solver", "lmeds"))
def essential_ransac(
    bv_a: jnp.ndarray,       # (N, 3) unit bearings in frame a
    bv_b: jnp.ndarray,       # (N, 3)
    valid: jnp.ndarray,      # (N,) bool
    key: jnp.ndarray,
    err_th: float,           # Sampson threshold on normalized coords
    n_hyps: int = 256,
    solver: str = "nister",
    lmeds: bool = False,
) -> RansacResult:
    """Batched essential-matrix RANSAC (reference: 5-pt Nister RANSAC,
    multi_view_geometry.cpp:600-771): K vmapped minimal-solver hypotheses,
    joint (K*, N) Sampson scoring, best-model inlier re-fit.

    solver="nister" (default, matches the reference backend) runs the 5-point
    minimal solver — safe for coplanar scenes, up to 10 models per sample;
    solver="8pt" runs the linear 8-point solver (planar-degenerate, kept as
    the cheaper fallback and as the inlier re-fit).

    lmeds=True scores hypotheses by median squared Sampson error instead of
    inlier count (the reference's LMedS branch, multi_view_geometry.cpp:
    144-380 via use_lmeds); the returned inlier set still uses err_th."""
    N = bv_a.shape[0]
    # normalized homogeneous coords (z=1) are better conditioned for 8pt
    x_a = bv_a / jnp.maximum(jnp.abs(bv_a[..., 2:3]), 1e-9)
    x_b = bv_b / jnp.maximum(jnp.abs(bv_b[..., 2:3]), 1e-9)

    # weighted sampling restricted to valid entries
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)

    if solver == "nister":
        from ov2slam_tpu.ops import fivepoint
        idx = jax.random.choice(key, N, shape=(n_hyps, 5), p=p)

        def hyp5(i):
            return fivepoint.five_point_essential(x_a[i], x_b[i])

        Es, oks = jax.vmap(hyp5)(idx)            # (K, 10, 3, 3), (K, 10)
        Es = Es.reshape(-1, 3, 3)
        oks = oks.reshape(-1)
    else:
        idx = jax.random.choice(key, N, shape=(n_hyps, 8), p=p)

        def hyp(i):
            return _eight_point(x_a[i], x_b[i])

        Es = jax.vmap(hyp)(idx)                                  # (K, 3, 3)
        oks = jnp.ones(Es.shape[0], bool)

    errs = jax.vmap(lambda E: sampson_dist(E, x_a, x_b))(Es)     # (K*, N)
    inl = (errs < err_th * err_th) & valid[None, :] & oks[:, None]
    counts = jnp.sum(inl, axis=1)
    if lmeds:
        # median of squared Sampson errors over the valid correspondences
        # (invalid entries padded with +inf sort to the tail; the median
        # index is the live count's midpoint)
        n_valid = jnp.sum(valid)
        big = jnp.full_like(errs, jnp.inf)
        errs_v = jnp.where(valid[None, :], errs, big)
        srt = jnp.sort(errs_v, axis=1)
        med = srt[:, jnp.maximum(n_valid // 2, 1)]
        med = jnp.where(oks, med, jnp.inf)
        k = jnp.argmin(med)
    else:
        # score: most inliers, then lowest mean inlier error (bounded < 1 so
        # it never outranks a count difference)
        mean_err = (jnp.sum(jnp.where(inl, errs, 0.0), axis=1)
                    / jnp.maximum(counts, 1))
        val = counts.astype(jnp.float32) - mean_err / (1.0 + mean_err)
        val = jnp.where(oks, val, -jnp.inf)
        # disambiguation among near-tie top models. Two distinct exact
        # ambiguities live here on planar scenes:
        #   1. the twisted pair (same t, R flipped pi about t) — identical
        #      Sampson residuals, separated by CHEIRALITY (points in front
        #      of both cameras, Nister's resolution);
        #   2. the Faugeras-Lustman TWO-FOLD planar ambiguity — two exact
        #      (R, t, plane) interpretations of the same two views, BOTH
        #      fully cheirality-consistent, structurally inseparable from
        #      two views alone. A VO front-end sees temporally adjacent
        #      frames, so the SMALL-MOTION prior picks correctly: the
        #      conjugate solution's rotation is composed with a reflection
        #      about the plane and is generically much larger.
        # Decompose the top-8 models; pick lexicographically
        # (inlier count, chirality count, smaller rotation angle).
        TOPJ = 8
        top_val, top_idx = jax.lax.top_k(val, TOPJ)

        def chirality_count(E, inl_k):
            u, _, vt = smallalg.svd3(E)
            d = jnp.linalg.det(u) * jnp.linalg.det(vt)
            vt = vt * jnp.where(d < 0, -1.0, 1.0)
            Wm = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0],
                              [0.0, 0.0, 1.0]], E.dtype)
            tvec = u[:, 2]

            def cnt(R, tt):
                T = SE3(R, tt)
                X_a = triangulate_midpoint(T, x_a, x_b)
                X_b = jnp.einsum("ij,...j->...i", R.T, X_a - tt)
                return jnp.sum((X_a[..., 2] > 0) & (X_b[..., 2] > 0) & inl_k)

            Ra, Rb = u @ Wm @ vt, u @ Wm.T @ vt
            cs = jnp.stack([cnt(Ra, tvec), cnt(Ra, -tvec),
                            cnt(Rb, tvec), cnt(Rb, -tvec)])
            b = jnp.argmax(cs)
            Rbest = jnp.where(b < 2, Ra, Rb)
            ang = jnp.arccos(jnp.clip(
                (jnp.trace(Rbest) - 1.0) * 0.5, -1.0, 1.0))
            return jnp.max(cs), ang

        chir, ang = jax.vmap(chirality_count)(Es[top_idx], inl[top_idx])
        # arbitration only applies between models of (near-)equal inlier
        # support — the ambiguity case; it never overrides a count win.
        # Scales: one chirality count (100) outweighs any angle gap (< pi);
        # val's tiebreak (<= 1e-4 within the near-tie band) never outweighs
        # a meaningful angle gap.
        near = top_val >= top_val[0] - 1.0
        score = chir.astype(jnp.float32) * 100.0 - ang + top_val * 1e-4
        j = jnp.argmax(jnp.where(near, score, -jnp.inf))
        k = top_idx[j]
    best_inl = inl[k]

    # re-fit on the best inlier set (masked rows -> zero rows in A)
    w = best_inl.astype(x_a.dtype)[:, None]
    xa_w = x_a * w
    xb_w = x_b * w

    def refit():
        xa, ya = xa_w[:, 0], xa_w[:, 1]
        xb, yb = xb_w[:, 0], xb_w[:, 1]
        ww = w[:, 0]
        A = jnp.stack([xa * xb, xa * yb, xa * ww, ya * xb, ya * yb, ya * ww,
                       xb * ww, yb * ww, ww], axis=-1)
        E = smallalg.smallest_eigvec(A.T @ A).reshape(3, 3)
        return smallalg.essential_project(E)

    E_best = refit()
    err_best = sampson_dist(E_best, x_a, x_b)
    inl_best = (err_best < err_th * err_th) & valid
    n_in = jnp.sum(inl_best)

    # manifold polish: decompose the winner (chirality-correct branch) and
    # Gauss-Newton the pose on its inlier Sampson residuals — this is what
    # actually sharpens the model when the inlier count saturates (planar
    # scenes, low-parallax frames) and the minimal-sample scatter is the
    # accuracy limit
    T_gn = decompose_essential(Es[k], x_a, x_b, best_inl)
    T_gn = refine_essential_pose(T_gn, x_a, x_b, best_inl.astype(x_a.dtype))
    E_gn = lie.hat(T_gn.t) @ T_gn.R
    err_gn = sampson_dist(E_gn, x_a, x_b)
    inl_gn = (err_gn < err_th * err_th) & valid
    n_gn = jnp.sum(inl_gn)

    # selection: the linear refit only wins by STRICTLY adding inliers (on
    # planar scenes the whole degenerate E family scores every point an
    # inlier, so an equal-count 8-pt refit can silently replace a correct
    # model); the manifold polish wins at equal count (it only moves within
    # the winner's own pose branch)
    use_gn = n_gn >= counts[k]
    E_mid = jnp.where(use_gn, E_gn, Es[k])
    inl_mid = jnp.where(use_gn, inl_gn, best_inl)
    n_mid = jnp.where(use_gn, n_gn, counts[k])
    use_refit = n_in > n_mid
    E_fin = jnp.where(use_refit, E_best, E_mid)
    inl_fin = jnp.where(use_refit, inl_best, inl_mid)
    n_fin = jnp.maximum(n_in, n_mid)
    return RansacResult(E_fin, inl_fin, n_fin, n_fin >= 8)


# ---------------------------------------------------------------------------
# P3P (Grunert) + PnP RANSAC
# ---------------------------------------------------------------------------

def _solve_quartic(c4, c3, c2, c1, c0):
    """Closed-form (Ferrari) roots of c4 x^4 + ... + c0 = 0.

    Batched-friendly, complex64 arithmetic; returns (..., 4) complex roots.
    """
    c4 = jnp.where(jnp.abs(c4) < 1e-12, 1e-12, c4)
    a = c3 / c4
    b = c2 / c4
    c = c1 / c4
    d = c0 / c4
    # depressed quartic y^4 + p y^2 + q y + r, x = y - a/4
    p = b - 3.0 * a * a / 8.0
    q = c - a * b / 2.0 + a * a * a / 8.0
    r = d - a * c / 4.0 + a * a * b / 16.0 - 3.0 * a ** 4 / 256.0

    p_ = p.astype(jnp.complex64)
    q_ = q.astype(jnp.complex64)
    r_ = r.astype(jnp.complex64)

    # resolvent cubic: m^3 + p m^2 + (p^2/4 - r) m - q^2/8 = 0 — take one root
    b2 = p_
    b1 = p_ * p_ / 4.0 - r_
    b0 = -q_ * q_ / 8.0
    # Cardano for m^3 + b2 m^2 + b1 m + b0
    pp = b1 - b2 * b2 / 3.0
    qq = 2.0 * b2 ** 3 / 27.0 - b2 * b1 / 3.0 + b0
    disc = (qq / 2.0) ** 2 + (pp / 3.0) ** 3
    sq = jnp.sqrt(disc)
    # pick the cube-root branch with the larger magnitude (avoids the
    # catastrophic cancellation of -qq/2 + sq when they nearly cancel)
    u3a = -qq / 2.0 + sq
    u3b = -qq / 2.0 - sq
    u3 = jnp.where(jnp.abs(u3a) >= jnp.abs(u3b), u3a, u3b)
    u = u3 ** (1.0 / 3.0)
    u = jnp.where(jnp.abs(u) < 1e-12, 1e-12 + 0j, u)
    m = u - pp / (3.0 * u) - b2 / 3.0

    m = jnp.where(jnp.abs(m) < 1e-10, m + 1e-10, m)
    sqrt2m = jnp.sqrt(2.0 * m)
    t1 = -(2.0 * p_ + 2.0 * m)
    t2 = 2.0 * q_ / sqrt2m
    s1 = jnp.sqrt(t1 - t2)
    s2 = jnp.sqrt(t1 + t2)
    y0 = (sqrt2m + s1) / 2.0
    y1 = (sqrt2m - s1) / 2.0
    y2 = (-sqrt2m + s2) / 2.0
    y3 = (-sqrt2m - s2) / 2.0
    shift = (a / 4.0).astype(jnp.complex64)
    roots = jnp.stack([y0, y1, y2, y3], axis=-1) - shift[..., None]

    # complex Newton polish against the original (normalized) quartic
    c4_ = c4.astype(jnp.complex64)[..., None]
    c3_ = c3.astype(jnp.complex64)[..., None]
    c2_ = c2.astype(jnp.complex64)[..., None]
    c1_ = c1.astype(jnp.complex64)[..., None]
    c0_ = c0.astype(jnp.complex64)[..., None]

    def polish(z):
        f = (((c4_ * z + c3_) * z + c2_) * z + c1_) * z + c0_
        df = ((4.0 * c4_ * z + 3.0 * c3_) * z + 2.0 * c2_) * z + c1_
        df = jnp.where(jnp.abs(df) < 1e-12, 1e-12 + 0j, df)
        return z - f / df

    for _ in range(3):     # unrolled (fixed count, per-frame hot path)
        roots = polish(roots)
    return roots


def p3p_grunert(X: jnp.ndarray, bv: jnp.ndarray) -> Tuple[SE3, jnp.ndarray]:
    """P3P: world points X (3, 3), unit bearings bv (3, 3) -> up to 8
    candidate world-to-cam poses (4 quartic roots x 2 depth signs), batched
    as SE3 with (8,) validity.

    Depth-ratio quartic derived by resultant elimination from the three
    law-of-cosines constraints (verified symbolically + numerically; same
    problem the reference solves with opengv KneipP3P,
    multi_view_geometry.cpp:144-380).
    """
    dt = X.dtype
    # normalize scene scale for f32 conditioning (depths scale linearly)
    centroid = jnp.mean(X, axis=0)
    scl = jnp.maximum(jnp.sqrt(jnp.mean(jnp.sum((X - centroid) ** 2, axis=-1))), 1e-9)
    X = X / scl
    A, B, C = X[0], X[1], X[2]
    a2 = jnp.sum((B - C) ** 2)   # a = |BC|
    b2 = jnp.sum((C - A) ** 2)   # b = |CA|
    c2 = jnp.sum((A - B) ** 2)   # c = |AB|
    p = jnp.dot(bv[1], bv[2])    # cos angle between rays to B, C
    q = jnp.dot(bv[2], bv[0])    # C, A
    r = jnp.dot(bv[0], bv[1])    # A, B

    # quartic in u = s2/s1 (sympy resultant of the two depth-ratio constraints)
    G4 = a2 * (-a2 + 2 * b2 + 2 * c2) + 4 * b2 * c2 * p ** 2 + b2 * (-b2 - 2 * c2) - c2 ** 2
    G3 = p * (-8 * b2 * c2 * p * r + q * (-4 * a2 * c2 - 4 * b2 * c2 + 4 * c2 ** 2)) \
        + r * (a2 * (4 * a2 - 8 * b2 - 4 * c2) + b2 * (4 * b2 + 4 * c2))
    G2 = a2 * (-2 * a2 + 4 * b2) - 2 * b2 ** 2 + 2 * c2 ** 2 \
        + p * (p * (4 * b2 * c2 - 4 * c2 ** 2) + q * r * (8 * a2 * c2 + 8 * b2 * c2)) \
        + q ** 2 * (4 * a2 * c2 - 4 * c2 ** 2) \
        + r ** 2 * (a2 * (-4 * a2 + 8 * b2) - 4 * b2 ** 2)
    G1 = -8 * a2 * c2 * q ** 2 * r + p * q * (-4 * a2 * c2 - 4 * b2 * c2 + 4 * c2 ** 2) \
        + r * (a2 * (4 * a2 - 8 * b2 + 4 * c2) + b2 * (4 * b2 - 4 * c2))
    G0 = 4 * a2 * c2 * q ** 2 + a2 * (-a2 + 2 * b2 - 2 * c2) + b2 * (-b2 + 2 * c2) - c2 ** 2

    # normalize coefficients for conditioning (they scale like length^4)
    scale = jnp.maximum(jnp.abs(G4), jnp.maximum(jnp.abs(G0), 1e-12))
    G4n, G3n, G2n, G1n, G0n = (G4 / scale, G3 / scale, G2 / scale, G1 / scale, G0 / scale)
    roots = _solve_quartic(G4n, G3n, G2n, G1n, G0n)
    real = jnp.abs(roots.imag) < 1e-3 * jnp.maximum(jnp.abs(roots.real), 1.0)
    u = roots.real               # (4,)

    # Newton-polish the real roots (recovers the f32/complex64 Ferrari error)
    def polish(uu):
        f = (((G4n * uu + G3n) * uu + G2n) * uu + G1n) * uu + G0n
        df = ((4.0 * G4n * uu + 3.0 * G3n) * uu + 2.0 * G2n) * uu + G1n
        return uu - f / jnp.where(jnp.abs(df) < 1e-9, 1e-9, df)

    for _ in range(3):     # unrolled
        u = polish(u)

    den = 1.0 + u * u - 2.0 * u * r
    s1 = jnp.sqrt(c2 / jnp.maximum(den, 1e-12))
    s2 = u * s1
    # v = s3/s1 from 1 + v^2 - 2 v q = b2/s1^2
    disc = q * q - (1.0 - b2 / jnp.maximum(s1 * s1, 1e-12))
    sqd = jnp.sqrt(jnp.maximum(disc, 0.0))
    ok_root = real & (den > 1e-12) & (disc >= 0) & (s1 > 0) & (s2 > 0)

    s1_all = jnp.concatenate([s1, s1])
    s2_all = jnp.concatenate([s2, s2])
    s3_all = jnp.concatenate([(q + sqd) * s1, (q - sqd) * s1])
    ok_all = jnp.concatenate([ok_root, ok_root])   # (8,)

    # Gauss-Newton polish of the depths on the three law-of-cosines
    # constraints (cleans up f32 quartic noise, incl. near-tangential cases)
    def gn_depths(s):
        s1_, s2_, s3_ = s[..., 0], s[..., 1], s[..., 2]
        f1 = s1_ * s1_ + s2_ * s2_ - 2.0 * s1_ * s2_ * r - c2
        f2 = s2_ * s2_ + s3_ * s3_ - 2.0 * s2_ * s3_ * p - a2
        f3 = s1_ * s1_ + s3_ * s3_ - 2.0 * s1_ * s3_ * q - b2
        z = jnp.zeros_like(s1_)
        J = jnp.stack([
            jnp.stack([2 * s1_ - 2 * s2_ * r, 2 * s2_ - 2 * s1_ * r, z], -1),
            jnp.stack([z, 2 * s2_ - 2 * s3_ * p, 2 * s3_ - 2 * s2_ * p], -1),
            jnp.stack([2 * s1_ - 2 * s3_ * q, z, 2 * s3_ - 2 * s1_ * q], -1),
        ], -2)                                     # (..., 3, 3)
        F = jnp.stack([f1, f2, f3], -1)[..., None]  # (..., 3, 1)
        JTJ = jnp.swapaxes(J, -1, -2) @ J + 1e-9 * jnp.eye(3, dtype=s.dtype)
        g = (jnp.swapaxes(J, -1, -2) @ F)[..., 0]
        step = smallalg.solve_spd(JTJ, g)
        return s - step

    depths = jnp.stack([s1_all, s2_all, s3_all], axis=-1)
    for _ in range(4):     # unrolled
        depths = gn_depths(depths)
    s1_all, s2_all, s3_all = depths[..., 0], depths[..., 1], depths[..., 2]

    # validity: positive depths + all constraints satisfied after polish
    e1 = jnp.abs(s1_all ** 2 + s2_all ** 2 - 2 * s1_all * s2_all * r - c2)
    e2 = jnp.abs(s2_all ** 2 + s3_all ** 2 - 2 * s2_all * s3_all * p - a2)
    e3 = jnp.abs(s1_all ** 2 + s3_all ** 2 - 2 * s1_all * s3_all * q - b2)
    tol = 1e-3 * jnp.maximum(a2, jnp.maximum(b2, c2))
    ok_all = (
        ok_all & (s1_all > 0) & (s2_all > 0) & (s3_all > 0)
        & (e1 < tol) & (e2 < tol) & (e3 < tol)
    )

    def pose_from_depths(d):
        s1_, s2_, s3_ = d[0], d[1], d[2]
        Pc = jnp.stack([bv[0] * s1_, bv[1] * s2_, bv[2] * s3_])  # cam frame
        # Procrustes: R, t with Pc = R X + t — quaternion (Davenport) method
        # on the 3x3 attitude-profile matrix (SVD-free, unrolled)
        cw = jnp.mean(X, axis=0)
        cc = jnp.mean(Pc, axis=0)
        M = (Pc - cc).T @ (X - cw)     # sum_i b_i a_i^T with b ≈ R a
        R = smallalg.procrustes_rotation(M)
        t = cc - R @ cw
        return R, t

    Rs, ts = jax.vmap(pose_from_depths)(jnp.stack([s1_all, s2_all, s3_all], axis=-1))
    # undo the scene-scale normalization (rotation is scale-free)
    return SE3(Rs, ts * scl), ok_all


def refine_pose_gn(
    X: jnp.ndarray,          # (N, 3) world points
    bv: jnp.ndarray,         # (N, 3) unit bearings
    weights: jnp.ndarray,    # (N,) 0/1 or soft weights
    T_init: SE3,
    iters: int = 8,
) -> SE3:
    """Gauss-Newton refinement of a world-to-cam pose on normalized
    reprojection residuals, left-multiplicative SE(3) update. Small fixed
    iteration count — used to polish RANSAC poses on their inlier sets."""

    obs = bv[:, :2] / jnp.maximum(bv[:, 2:3], 1e-9)

    def body(T):
        R, t = T
        Xc = jnp.einsum("ij,nj->ni", R, X) + t
        x, y, z = Xc[:, 0], Xc[:, 1], Xc[:, 2]
        iz = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        r_u = x * iz - obs[:, 0]
        r_v = y * iz - obs[:, 1]
        w = weights * (z > 0.1)
        # d(proj)/d(xi) for left-mult update xi=[v, w]: dXc = dv + dw x Xc
        # du/dXc = [iz, 0, -x iz^2]; dv/dXc = [0, iz, -y iz^2]
        zeros = jnp.zeros_like(x)
        du = jnp.stack([iz, zeros, -x * iz * iz], axis=-1)   # (N, 3)
        dv = jnp.stack([zeros, iz, -y * iz * iz], axis=-1)
        # dXc/dxi = [I | -hat(Xc)]
        Ju = jnp.concatenate([du, jnp.cross(Xc, du)], axis=-1)  # (N, 6)
        Jv = jnp.concatenate([dv, jnp.cross(Xc, dv)], axis=-1)
        Jw = jnp.concatenate([Ju * w[:, None], Jv * w[:, None]], axis=0)  # (2N, 6)
        rw = jnp.concatenate([r_u * w, r_v * w], axis=0)
        H = Jw.T @ Jw + 1e-8 * jnp.eye(6, dtype=X.dtype)
        g = Jw.T @ rw
        dx = -smallalg.solve_spd(H, g)
        Tn = lie.se3_boxplus_left(SE3(R, t), dx)
        return (Tn.R, Tn.t)

    carry = (T_init.R, T_init.t)
    for _ in range(iters):     # unrolled
        carry = body(carry)
    return SE3(*carry)


@functools.partial(jax.jit, static_argnames=("n_hyps",))
def p3p_ransac(
    X: jnp.ndarray,          # (N, 3) world points
    bv: jnp.ndarray,         # (N, 3) unit bearings (current cam frame)
    valid: jnp.ndarray,      # (N,) bool
    key: jnp.ndarray,
    err_th_norm: float,      # reprojection threshold in normalized coords
    n_hyps: int = 512,
) -> Tuple[SE3, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched P3P RANSAC -> world-to-cam pose (reference: p3pRansac,
    multi_view_geometry.cpp:144-460). Each of K samples yields up to 4
    candidate poses; all 4K are scored jointly on all correspondences.

    Returns (T_cw, inliers, n_inliers, success).
    """
    N = X.shape[0]
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    idx = jax.random.choice(key, N, shape=(n_hyps, 3), p=p)

    def hyp(i):
        return p3p_grunert(X[i], bv[i])

    Ts, oks = jax.vmap(hyp)(idx)                 # SE3 (K, 4, ...), (K, 4)
    Rs = Ts.R.reshape(-1, 3, 3)
    ts = Ts.t.reshape(-1, 3)
    oks = oks.reshape(-1)

    # score: angular reprojection in normalized coords
    def score(R, t):
        Xc = jnp.einsum("ij,nj->ni", R, X) + t
        z = Xc[:, 2]
        proj = Xc[:, :2] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)[:, None]
        obs = bv[:, :2] / jnp.maximum(bv[:, 2:3], 1e-9)
        err = jnp.sum((proj - obs) ** 2, axis=-1)
        return ((err < err_th_norm * err_th_norm) & (z > 0) & valid)

    inl = jax.vmap(score)(Rs, ts)                # (8K, N)
    counts = jnp.sum(inl, axis=1) * oks.astype(jnp.int32)
    k = jnp.argmax(counts)

    # Gauss-Newton polish on the winning inlier set, then re-score (the
    # reference's refine-after-RANSAC, multi_view_geometry.cpp:289-321)
    T_ref = refine_pose_gn(X, bv, inl[k].astype(X.dtype), SE3(Rs[k], ts[k]))
    inl_ref = score(T_ref.R, T_ref.t)
    n_ref = jnp.sum(inl_ref)
    better = n_ref >= counts[k]
    R_fin = jnp.where(better, T_ref.R, Rs[k])
    t_fin = jnp.where(better, T_ref.t, ts[k])
    inl_fin = jnp.where(better, inl_ref, inl[k])
    n_fin = jnp.maximum(n_ref, counts[k])
    return SE3(R_fin, t_fin), inl_fin, n_fin, n_fin >= 5
