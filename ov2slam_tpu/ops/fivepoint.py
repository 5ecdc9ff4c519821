"""Batched Nister 5-point essential-matrix solver.

Replaces the reference's OpenGV NISTER relative-pose backend
(reference: src/multi_view_geometry.cpp:594-698; the OpenCV fallback uses
cv::findEssentialMat, :749-771). The 8-point linear solver previously used
here is degenerate for coplanar scenes (the epipolar constraint matrix drops
rank and the nullspace mixes in the planar homography family); the 5-point
minimal solver has no planar degeneracy and needs only 5 inliers per RANSAC
hypothesis.

TPU-first design decisions:
  - The classic formulation diagonalizes a 10x10 action matrix with a
    NONSYMMETRIC eigensolver, which XLA/TPU does not provide. Instead we
    follow Nister's polynomial route: Gauss-Jordan-reduce the 10x20 cubic
    constraint system, form the 3x3 polynomial matrix B(z), and find the
    real roots of the degree-10 polynomial det B(z) with a fixed-shape
    grid-sign-change + bisection + Newton scheme (batched, no eig, no
    data-dependent shapes).
  - The cubic constraint rows (det E = 0 and 2*E*E^T*E - tr(E*E^T)*E = 0)
    are expanded with GENERIC polynomial arithmetic over static monomial
    tables built at trace time — no hand-transcribed coefficient tables.
  - Everything vmaps over RANSAC hypotheses; each 5-sample yields up to 10
    essential matrices with validity flags (fixed shapes).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ov2slam_tpu.core import smallalg


# ---------------------------------------------------------------------------
# static monomial tables for polynomials in (x, y, z)
# ---------------------------------------------------------------------------
# deg-1 basis: [x, y, z, 1]
_E1 = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0)]


def _monomials(max_deg: int):
    out = []
    for d in range(max_deg, -1, -1):
        for i in range(d, -1, -1):
            for j in range(d - i, -1, -1):
                k = d - i - j
                out.append((i, j, k))
    return out


_E2 = _monomials(2)       # 10 monomials
_E3 = _monomials(3)       # 20 monomials
_IDX2 = {m: i for i, m in enumerate(_E2)}
_IDX3 = {m: i for i, m in enumerate(_E3)}

# multiplication tables: deg1[i] * deg1[j] -> deg2 index, etc.
_MUL11 = np.zeros((4, 4), np.int32)
for i, a in enumerate(_E1):
    for j, b in enumerate(_E1):
        _MUL11[i, j] = _IDX2[(a[0] + b[0], a[1] + b[1], a[2] + b[2])]
_MUL21 = np.zeros((10, 4), np.int32)
for i, a in enumerate(_E2):
    for j, b in enumerate(_E1):
        _MUL21[i, j] = _IDX3[(a[0] + b[0], a[1] + b[1], a[2] + b[2])]


def _pmul11(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(…, 4) x (…, 4) deg-1 polys -> (…, 10) deg-2 poly."""
    prod = a[..., :, None] * b[..., None, :]             # (…, 4, 4)
    out = jnp.zeros(a.shape[:-1] + (10,), a.dtype)
    return out.at[..., _MUL11.reshape(-1)].add(prod.reshape(*prod.shape[:-2], 16))


def _pmul21(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(…, 10) deg-2 x (…, 4) deg-1 -> (…, 20) deg-3 poly."""
    prod = a[..., :, None] * b[..., None, :]             # (…, 10, 4)
    out = jnp.zeros(a.shape[:-1] + (20,), a.dtype)
    return out.at[..., _MUL21.reshape(-1)].add(prod.reshape(*prod.shape[:-2], 40))


# Nister's monomial ordering for the Gauss-Jordan step: the leading 10
# columns carry every monomial containing x or y of degree >= 2 in (x, y)
# or mixed with z; the trailing 10 are x*z^a, y*z^a, z^a.
_LEAD = [(3, 0, 0), (0, 3, 0), (2, 1, 0), (1, 2, 0), (2, 0, 1), (2, 0, 0),
         (0, 2, 1), (0, 2, 0), (1, 1, 1), (1, 1, 0)]
_TRAIL = [(1, 0, 2), (1, 0, 1), (1, 0, 0), (0, 1, 2), (0, 1, 1), (0, 1, 0),
          (0, 0, 3), (0, 0, 2), (0, 0, 1), (0, 0, 0)]
_COL_ORDER = np.asarray([_IDX3[m] for m in _LEAD + _TRAIL], np.int32)

# rows of the reduced system, by leading monomial position in _LEAD:
_ROW_E, _ROW_F = 4, 5          # x^2 z, x^2
_ROW_G, _ROW_H = 6, 7          # y^2 z, y^2
_ROW_I, _ROW_J = 8, 9          # xyz,   xy


def _constraint_rows(Ebasis: jnp.ndarray) -> jnp.ndarray:
    """Ebasis (4, 3, 3) nullspace basis (x*E0 + y*E1 + z*E2 + E3) ->
    (10, 20) cubic constraint coefficient matrix over the deg-3 basis."""
    # E entries as deg-1 polynomials: P[i, j] has coeff vector (4,)
    P = jnp.moveaxis(Ebasis, 0, -1)                     # (3, 3, 4)

    def m11(i1, j1, i2, j2):
        return _pmul11(P[i1, j1], P[i2, j2])

    rows = []
    # det(E) = 0 (cofactor expansion along the first row)
    c00 = m11(1, 1, 2, 2) - m11(1, 2, 2, 1)
    c01 = m11(1, 2, 2, 0) - m11(1, 0, 2, 2)
    c02 = m11(1, 0, 2, 1) - m11(1, 1, 2, 0)
    det = (_pmul21(c00, P[0, 0]) + _pmul21(c01, P[0, 1])
           + _pmul21(c02, P[0, 2]))
    rows.append(det)

    # trace constraint 2 E E^T E - tr(E E^T) E = 0 (9 cubic equations)
    # G = E E^T (deg-2 entries), tr = G00 + G11 + G22
    G = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            acc = m11(i, 0, j, 0) + m11(i, 1, j, 1) + m11(i, 2, j, 2)
            G[i][j] = acc
    tr = G[0][0] + G[1][1] + G[2][2]
    for i in range(3):
        for j in range(3):
            acc = (_pmul21(G[i][0], P[0, j]) + _pmul21(G[i][1], P[1, j])
                   + _pmul21(G[i][2], P[2, j]))
            rows.append(2.0 * acc - _pmul21(tr, P[i, j]))
    return jnp.stack(rows)                               # (10, 20)


# ---------------------------------------------------------------------------
# degree-10 polynomial real roots: grid sign changes + bisection + Newton
# ---------------------------------------------------------------------------

_N_GRID = 128
_MAX_ROOTS = 10


def _scan_real_roots(q_of, dt) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Real roots of q(a) on a in (-pi/2, pi/2); z = tan(a_root).

    q_of maps an angle array (..., S) to values (..., S) — here the caller
    passes det B(tan a) * cos(a)^12, which is bounded and has the same sign
    changes as the degree-10 polynomial det B(z) over all real z (including
    large |z|, covered by the tan substitution). Grid-scan, then bisect each
    sign change in a-space. Root slots beyond the found sign changes are
    filled with the grid points of locally-minimal |q| — candidate
    even-multiplicity (tangent) roots, which produce NO sign change; the
    caller's Gauss-Newton polish on the cubic constraints either converges
    them onto a true solution or leaves a large residual that the caller's
    essentiality check rejects. Returns (z_roots, valid), shape (..., 10).
    """
    a = jnp.asarray(
        np.linspace(-np.pi / 2 + 1e-3, np.pi / 2 - 1e-3, _N_GRID), dt)

    qv = q_of(a)                                          # (..., S)
    sgn = jnp.sign(qv)
    changed = sgn[..., :-1] * sgn[..., 1:] < 0            # (..., S-1)
    # tangent-root candidates: interior local minima of |q| with no sign
    # change on either side, ranked by |q| (smallest first)
    absq = jnp.abs(qv)
    is_lmin = ((absq[..., 1:-1] <= absq[..., :-2])
               & (absq[..., 1:-1] <= absq[..., 2:]))      # (..., S-2)
    near_change = changed[..., :-1] | changed[..., 1:]    # around interior pt
    lmin_score = jnp.where(is_lmin & ~near_change, absq[..., 1:-1], jnp.inf)
    lmin_order = jnp.argsort(lmin_score, axis=-1)         # interval index - 1
    # stable argsort: sign-change intervals first, in index order
    order = jnp.argsort(~changed, axis=-1, stable=True)[..., :_MAX_ROOTS]
    valid = jnp.take_along_axis(changed, order, axis=-1)  # (..., 10)
    # fill invalid slots with tangent candidates (interval around the local
    # minimum); rank k invalid slot <- rank k tangent candidate
    inv_rank = jnp.cumsum((~valid).astype(jnp.int32), axis=-1) - 1
    fill = jnp.take_along_axis(
        lmin_order, jnp.clip(inv_rank, 0, lmin_order.shape[-1] - 1), axis=-1)
    fill_ok = jnp.take_along_axis(
        lmin_score, jnp.clip(inv_rank, 0, lmin_order.shape[-1] - 1), axis=-1
    ) < jnp.inf
    is_fill = ~valid & fill_ok
    order = jnp.where(valid, order, jnp.where(fill_ok, fill, order))
    valid = valid | fill_ok
    # genuine brackets: bisect [a[i], a[i+1]]; tangent fills: degenerate
    # bracket at the local-min grid point a[i+1] (bisection is a no-op and
    # the GN polish does the work)
    lo = jnp.where(is_fill, a[jnp.minimum(order + 1, _N_GRID - 1)], a[order])
    hi = a[jnp.minimum(order + 1, _N_GRID - 1)]
    qlo = jnp.take_along_axis(qv, order, axis=-1)

    # bisection as a rolled loop: the unrolled form inflated the (already
    # vmapped-by-RANSAC) HLO enough to take minutes / segfault LLVM on the
    # CPU backend; a fori_loop is 26x smaller to compile at identical math
    def bis_body(_, carry):
        lo, hi, qlo = carry
        mid = 0.5 * (lo + hi)
        qm = q_of(mid)
        go_hi = (qm * qlo) > 0                            # root in [mid, hi]
        return (jnp.where(go_hi, mid, lo),
                jnp.where(go_hi, hi, mid),
                jnp.where(go_hi, qm, qlo))

    lo, hi, qlo = jax.lax.fori_loop(0, 26, bis_body, (lo, hi, qlo))
    return jnp.tan(0.5 * (lo + hi)), valid


# ---------------------------------------------------------------------------
# the 5-point solver
# ---------------------------------------------------------------------------

def five_point_essential(x_a: jnp.ndarray, x_b: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Essential matrices from 5 normalized correspondences.

    x_a, x_b: (5, 3) homogeneous normalized coords (z=1) with
    x_a^T E x_b = 0 (same convention as the 8-pt path). Returns
    (Es (10, 3, 3), valid (10,)) — up to 10 real solutions.
    """
    dt = x_a.dtype
    xa, ya = x_a[:, 0], x_a[:, 1]
    xb, yb = x_b[:, 0], x_b[:, 1]
    one = jnp.ones_like(xa)
    Q = jnp.stack([xa * xb, xa * yb, xa, ya * xb, ya * yb, ya,
                   xb, yb, one], axis=-1)                # (5, 9)
    # 4-dim nullspace: eigenvectors of the 4 smallest eigenvalues of Q^T Q.
    # eigh of the Gram matrix SQUARES cond(Q), so in f32 the raw basis is
    # only ~cond(Q)^2 * eps accurate — on near-planar samples that alone
    # pushed the E family past usable accuracy. Two Newton refinement steps
    # against Q itself (V <- V - Q^+ (Q V), with Q^+ = Q^T (Q Q^T)^-1 built
    # from the 5x5 row-space Gram, full rank for any non-degenerate sample)
    # bring the error back to ~cond(Q) * eps, then re-orthonormalize.
    _, Vfull = smallalg.eigh_jacobi(Q.T @ Q)
    V = Vfull[:, :4]                                     # (9, 4)
    QQt = Q @ Q.T + 1e-12 * jnp.eye(5, dtype=dt)
    for _ in range(2):
        V = V - Q.T @ jnp.linalg.solve(QQt, Q @ V)
        # Gram-Schmidt re-orthonormalization (4 columns, unrolled)
        cols = []
        for c in range(4):
            v = V[:, c]
            for u in cols:
                v = v - (u @ v) * u
            cols.append(v / jnp.maximum(jnp.linalg.norm(v), 1e-12))
        V = jnp.stack(cols, axis=-1)
    basis = V.T.reshape(4, 3, 3)                         # E = x*B0+y*B1+z*B2+B3

    M = _constraint_rows(basis)                          # (10, 20)
    M = M[:, _COL_ORDER]
    # scale rows for conditioning (coefficients are degree-3 products)
    M = M / jnp.maximum(
        jnp.max(jnp.abs(M), axis=-1, keepdims=True), 1e-12)
    A10 = M[:, :10] + 1e-12 * jnp.eye(10, dtype=dt)
    C10 = M[:, 10:]
    # Gauss-Jordan: reduce the leading block to identity, with one step of
    # iterative refinement (the f32 residual is computed on O(1)-scaled
    # rows, so the correction recovers digits lost to cond(A10))
    Bmat = jnp.linalg.solve(A10, C10)                    # (10, 10)
    Bmat = Bmat + jnp.linalg.solve(A10, C10 - A10 @ Bmat)

    # rows e - z*f, g - z*h, i - z*j in the extended basis
    # trailing columns: [x z^2, x z, x, y z^2, y z, y, z^3, z^2, z, 1]
    def row_pair(r_hi, r_lo):
        """<r_hi> - z * <r_lo> -> (Bx (4,), By (4,), Bc (5,)) asc powers."""
        e = Bmat[r_hi]
        f = Bmat[r_lo]
        # x-coefficient polynomial in z (ascending): [x, xz, xz^2, xz^3]
        bx = jnp.stack([e[2], e[1] - f[2], e[0] - f[1], -f[0]])
        by = jnp.stack([e[5], e[4] - f[5], e[3] - f[4], -f[3]])
        bc = jnp.stack([e[9], e[8] - f[9], e[7] - f[8], e[6] - f[7], -f[6]])
        return bx, by, bc

    kx, ky, kc = row_pair(_ROW_E, _ROW_F)
    lx, ly, lc = row_pair(_ROW_G, _ROW_H)
    mx, my, mc = row_pair(_ROW_I, _ROW_J)

    # normalize each B(z) row for conditioning (positive scale: det sign
    # pattern unchanged)
    def row_norm(*ps):
        s = jnp.maximum(
            jnp.max(jnp.stack([jnp.max(jnp.abs(p)) for p in ps])), 1e-20)
        return tuple(p / s for p in ps)

    kx, ky, kc = row_norm(kx, ky, kc)
    lx, ly, lc = row_norm(lx, ly, lc)
    mx, my, mc = row_norm(mx, my, mc)

    # Real roots of det B(z), B = [[kx, ky, kc], [lx, ly, lc], [mx, my, mc]]
    # (3x3 of z-polynomials, det degree 3+3+4 = 10). Evaluated DIRECTLY per
    # probe point — expanding the degree-10 coefficient vector by polynomial
    # convolution loses the roots to catastrophic f32 cancellation (measured:
    # benign roots vanish from the expanded poly's sign pattern on planar
    # minimal samples); direct evaluation keeps each probe at the precision
    # of a 3x3 determinant. Bounded via z = tan(a) with cos(a)^4 row scaling.
    def detB_at(aa):
        z, c = jnp.tan(aa), jnp.cos(aa)
        c4 = (c * c) ** 2

        def ev(p):                                        # Horner, asc powers
            acc = jnp.zeros_like(z)
            for k in range(p.shape[-1] - 1, -1, -1):
                acc = acc * z + p[k]
            return acc * c4

        e11, e12, e13 = ev(kx), ev(ky), ev(kc)
        e21, e22, e23 = ev(lx), ev(ly), ev(lc)
        e31, e32, e33 = ev(mx), ev(my), ev(mc)
        return (e11 * (e22 * e33 - e23 * e32)
                - e12 * (e21 * e33 - e23 * e31)
                + e13 * (e21 * e32 - e22 * e31))

    z_roots, valid = _scan_real_roots(detB_at, dt)       # (10,), (10,)
    # extra multi-start seeds on a fixed z-grid: when the f32 coefficient
    # cascade corrupts det B(z) badly enough that the grid scan brackets
    # almost nothing (observed on near-planar minimal samples), the
    # Gauss-Newton polish below can still pull a spread of generic seeds
    # onto the true solution family — the final residual gate arbitrates.
    z_extra = jnp.tan(jnp.asarray(
        np.linspace(-np.pi / 2 * 0.85, np.pi / 2 * 0.85, 6), dt))
    z_roots = jnp.concatenate([z_roots, z_extra])         # (16,)
    valid = jnp.concatenate([valid, jnp.ones(6, bool)])

    # for each root: solve the 2x2 system [kx ky; lx ly] [x y]^T = -[kc; lc]
    def eval_poly(p, zz):
        acc = jnp.zeros_like(zz)
        for k in range(p.shape[-1] - 1, -1, -1):
            acc = acc * zz + p[k]
        return acc

    a11 = eval_poly(kx, z_roots)
    a12 = eval_poly(ky, z_roots)
    b1 = -eval_poly(kc, z_roots)
    a21 = eval_poly(lx, z_roots)
    a22 = eval_poly(ly, z_roots)
    b2 = -eval_poly(lc, z_roots)
    a31 = eval_poly(mx, z_roots)
    a32 = eval_poly(my, z_roots)
    b3 = -eval_poly(mc, z_roots)
    # least-squares over all three rows (the third adds robustness when the
    # first two are near-parallel)
    h11 = a11 * a11 + a21 * a21 + a31 * a31
    h12 = a11 * a12 + a21 * a22 + a31 * a32
    h22 = a12 * a12 + a22 * a22 + a32 * a32
    g1 = a11 * b1 + a21 * b2 + a31 * b3
    g2 = a12 * b1 + a22 * b2 + a32 * b3
    det = h11 * h22 - h12 * h12
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    x_sol = (h22 * g1 - h12 * g2) / det
    y_sol = (h11 * g2 - h12 * g1) / det

    # Gauss-Newton polish of (x, y, z) on the 10 cubic constraints.
    # Every candidate satisfies the 5 DATA equations exactly for any
    # (x, y, z) (the basis spans Q's nullspace); what f32 loses through the
    # GJ/det/root cascade is *essentiality* — so polish directly on the
    # unscaled constraint residuals r(v) = M0 @ mono3(v), whose Jacobian
    # follows from the static exponent table.
    M0 = _constraint_rows(basis)                         # (10, 20) unscaled
    exps = jnp.asarray(np.asarray(_E3, np.float32))      # (20, 3)

    def mono3_and_grad(v):
        vx, vy, vz = v[..., 0:1], v[..., 1:2], v[..., 2:3]
        ex, ey, ez = exps[:, 0], exps[:, 1], exps[:, 2]
        # x^ex * y^ey * z^ez with 0^0 = 1 (static integer exponents)
        def powi(base, e):
            out = jnp.ones_like(base) * jnp.ones_like(e)
            for k in (1, 2, 3):
                out = jnp.where(e >= k, out * base, out)
            return out
        px_, py_, pz_ = powi(vx, ex), powi(vy, ey), powi(vz, ez)
        m = px_ * py_ * pz_                               # (..., 20)
        # d m / d x = ex * x^(ex-1) * y^ey * z^ez (guard ex = 0)
        dpx = jnp.where(ex > 0, ex * powi(vx, ex - 1), 0.0) * py_ * pz_
        dpy = jnp.where(ey > 0, ey * powi(vy, ey - 1), 0.0) * px_ * pz_
        dpz = jnp.where(ez > 0, ez * powi(vz, ez - 1), 0.0) * px_ * py_
        return m, jnp.stack([dpx, dpy, dpz], axis=-1)     # (..., 20, 3)

    def gn_body(_, v):
        m, dm = mono3_and_grad(v)
        r = jnp.einsum("rc,kc->kr", M0, m)                # (10 roots, 10 eqs)
        J = jnp.einsum("rc,kcj->krj", M0, dm)             # (10, 10, 3)
        H = jnp.einsum("krj,krl->kjl", J, J) + 1e-10 * jnp.eye(3, dtype=dt)
        g = jnp.einsum("krj,kr->kj", J, r)
        return v - smallalg.solve_spd(H, g)

    v = jnp.stack([x_sol, y_sol, z_roots], axis=-1)       # (10, 3)
    v = jax.lax.fori_loop(0, 12, gn_body, v)
    x_sol, y_sol, z_fin = v[..., 0], v[..., 1], v[..., 2]

    Es = (x_sol[:, None, None] * basis[0] + y_sol[:, None, None] * basis[1]
          + z_fin[:, None, None] * basis[2] + basis[3])
    nrm = jnp.sqrt(jnp.sum(Es * Es, axis=(-2, -1), keepdims=True))
    Es = Es / jnp.maximum(nrm, 1e-12)
    # final validity is ESSENTIALITY of the polished result, not bracket
    # provenance: dead-end seeds (tangent fills that converged nowhere, or
    # brackets of a root the f32 coefficient cascade displaced) leave a
    # large relative constraint residual. Scale-invariant form: r is cubic
    # in the E coefficients, so compare against |v|^3-scaled row norms.
    m_fin, _ = mono3_and_grad(v)
    r_fin = jnp.einsum("rc,kc->kr", M0, m_fin)            # (16, 10)
    row_scale = jnp.linalg.norm(M0, axis=-1)              # (10,)
    vmag = jnp.maximum(jnp.linalg.norm(v, axis=-1), 1.0)  # (16,)
    rel = jnp.linalg.norm(r_fin / row_scale, axis=-1) / vmag ** 3
    valid = (valid & jnp.isfinite(z_fin) & (nrm[..., 0, 0] > 1e-9)
             & (rel < 3e-4))
    # keep the 10 best candidates by residual (fixed output shape)
    key = jnp.where(valid, rel, jnp.inf)
    order = jnp.argsort(key)[:_MAX_ROOTS]
    return Es[order], valid[order]
