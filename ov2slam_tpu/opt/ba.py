"""Bundle adjustment: Schur-complement Levenberg-Marquardt on device.

Replaces Ceres SPARSE_SCHUR + LM for the reference's localBA / looseBA /
fullBA / structureOnlyBA problems (reference: src/optimizer.cpp:34-897,
:900-1673, :1674-2333, :2594-2782).

TPU-first design — "pad everything, mask everything":
* the problem is a fixed-capacity padded tensor struct: F pose slots,
  L landmark slots, O observation slots, each with validity masks;
* per-observation residual/Jacobian kernels are batched (opt.residuals);
* the normal equations are built with scatter-adds into DENSE padded blocks:
  pose-pose (F, F, 6, 6), landmark diag (L, nl, nl), pose-landmark
  (L, F, 6, nl) — the local-BA window is small (F <= ~32), so the Schur
  reduced camera system is a small dense matrix factorized on device;
* landmark elimination is one einsum over the (L, F, 6, nl) coupling tensor
  (MXU work), not a sparse traversal;
* the LM trust-region loop is a lax.while_loop; robustness is Huber IRLS;
  gauge fixing = constant-pose masks (identity rows in the reduced system);
* the chi2 outlier sweep and optional L2 re-solve mirror optimizer.cpp:488-735.

Landmarks are either XYZ (nl=3) or anchored inverse-depth (nl=1, with
Jacobians flowing into the anchor pose block as well — buse_inv_depth).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ov2slam_tpu.core import lie
from ov2slam_tpu.core.lie import SE3
from ov2slam_tpu.opt import residuals as res
from ov2slam_tpu.opt.residuals import Calib


class BAProblem(NamedTuple):
    """Padded BA problem. Invalid slots must be masked out.

    Poses are world-to-cam. In inverse-depth mode, landmark j is
    ``X_w = T_wc[anchor[j]] (bearing[j] / lam[j])`` and ``Xw`` is ignored
    (kept for writeback convenience).
    """

    # pose slots
    R: jnp.ndarray            # (F, 3, 3)
    t: jnp.ndarray            # (F, 3)
    pose_opt: jnp.ndarray     # (F,) bool — optimized (vs constant/gauge)
    # landmark slots
    Xw: jnp.ndarray           # (L, 3)    xyz mode
    anchor: jnp.ndarray       # (L,) int32 anchor pose slot (invdepth mode)
    bearing: jnp.ndarray      # (L, 3)    anchor-frame bearing, z=1
    lam: jnp.ndarray          # (L,)      inverse depth
    lm_valid: jnp.ndarray     # (L,) bool
    # observation slots
    obs_kf: jnp.ndarray       # (O,) int32 observer pose slot
    obs_lm: jnp.ndarray       # (O,) int32 landmark slot
    obs_px: jnp.ndarray       # (O, 2) undistorted pixels
    obs_right: jnp.ndarray    # (O,) bool — right-camera observation
    obs_valid: jnp.ndarray    # (O,) bool
    # calibration
    calib_l: Calib
    calib_r: Calib
    T_rl: SE3                 # right-from-left extrinsic


class BAResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    Xw: jnp.ndarray           # updated landmark positions (world)
    lam: jnp.ndarray
    obs_inlier: jnp.ndarray   # (O,) bool — survived the chi2/depth sweep
    cost0: jnp.ndarray
    cost: jnp.ndarray
    n_iters: jnp.ndarray


def _residuals_all(p: BAProblem, R, t, Xw, lam, invdepth: bool):
    """Per-observation residuals + Jacobians.

    Returns r (O,2), J_obs (O,2,6), J_anc (O,2,6), J_lm (O,2,nl), pos (O,).
    """
    Ro = R[p.obs_kf]
    to = t[p.obs_kf]
    T_obs = SE3(Ro, to)
    if invdepth:
        anc = p.anchor[p.obs_lm]
        Ra = R[anc]
        ta = t[anc]
        # anchor cam-to-world
        T_wa = lie.se3_inverse(SE3(Ra, ta))
        b_a = p.bearing[p.obs_lm]
        lam_o = lam[p.obs_lm]

        def f(calib, T_rl):
            return res.reproj_anch_invdepth(
                calib, T_wa, T_obs, b_a, lam_o, p.obs_px, T_rl)

        rl, Jol, Jal, Jll, posl = f(p.calib_l, None)
        rr, Jor, Jar, Jlr, posr = f(p.calib_r, SE3(
            jnp.broadcast_to(p.T_rl.R, Ro.shape),
            jnp.broadcast_to(p.T_rl.t, to.shape)))
        m = p.obs_right[:, None]
        r = jnp.where(m, rr, rl)
        J_obs = jnp.where(m[..., None], Jor, Jol)
        J_anc_w = jnp.where(m[..., None], Jar, Jal)
        J_lm = jnp.where(m[..., None], Jlr, Jll)
        pos = jnp.where(p.obs_right, posr, posl)
        # J_anc is wrt left-mult update of T_wa; convert to update of the
        # anchor's world-to-cam pose T_aw: T_wa = T_aw^-1, and
        # exp(xi) T_aw  =>  T_wa' = T_wa exp(-xi); first-order:
        # d T_wa p / d xi = -T_wa [I | -hat(p_a')] ... handled directly:
        # recompute via chain rule below.
        return r, J_obs, J_anc_w, J_lm, pos
    else:
        X = Xw[p.obs_lm]
        rl, Jpl, Jxl, posl = res.reproj_xyz(p.calib_l, T_obs, X, p.obs_px)
        rr, Jpr, Jxr, posr = res.reproj_xyz_right(
            p.calib_r, p.T_rl, T_obs, X, p.obs_px)
        m = p.obs_right[:, None]
        r = jnp.where(m, rr, rl)
        J_obs = jnp.where(m[..., None], Jpr, Jpl)
        J_lm = jnp.where(m[..., None], Jxr, Jxl)
        pos = jnp.where(p.obs_right, posr, posl)
        J_anc = jnp.zeros_like(J_obs)
        return r, J_obs, J_anc, J_lm, pos


def _anchor_jacobian_fix(p, R, t, lam, J_anc_wa):
    """Convert anchor Jacobian from 'update T_wa' to 'update T_aw' frame.

    With the left-mult update T_aw' = exp(xi) T_aw, we have
    T_wa' = T_wa exp(-xi), so d(T_wa' q)/dxi = -R_wa [I | -hat(q)] xi for
    q the anchor-frame point. The residual code computed J wrt left-mult on
    T_wa directly: d(T_wa q) = [I | -hat(X_w)] xi_wa. The exact relation is
    xi_wa = -Ad(T_wa) xi_aw; we fold that in here."""
    anc = p.anchor[p.obs_lm]
    T_wa = lie.se3_inverse(SE3(R[anc], t[anc]))
    Ad = lie.se3_adjoint(T_wa)                    # (O, 6, 6)
    return -(J_anc_wa @ Ad)


def _sqrtw(p: BAProblem, r, pos, th2_mono, th2_stereo, robust):
    chi2 = jnp.sum(r * r, axis=-1)
    th2 = jnp.where(p.obs_right, th2_stereo, th2_mono)
    sw = jnp.where(robust, res.huber_weight(chi2, th2), 1.0)
    return p.obs_valid.astype(r.dtype) * sw, chi2, th2


def _cost(p, r, w_valid, chi2, th2, robust):
    th = jnp.sqrt(th2)
    rho = jnp.where(chi2 <= th2, chi2, 2.0 * th * jnp.sqrt(chi2) - th2)
    return jnp.sum(jnp.where(robust, rho, chi2) * w_valid)


@functools.partial(
    jax.jit,
    static_argnames=("invdepth", "max_iters", "robust", "l2_refine",
                     "l2_iters", "method"),
)
def solve_ba(
    p: BAProblem,
    invdepth: bool = True,
    max_iters: int = 5,
    robust: bool = True,
    th2_mono: float = 5.9915,
    th2_stereo: float = 7.8147,
    optimize_landmarks: bool = True,
    lam0: float = 1e-4,
    l2_refine: bool = False,
    l2_iters: int = 5,
    method: str = "lm",
) -> BAResult:
    """Schur-complement LM (or Powell dogleg). See module docstring.

    ``optimize_landmarks=False`` gives pose-only refinement;
    ``pose_opt`` all-False + optimize_landmarks=True gives structure-only BA
    (reference structureOnlyBA, optimizer.cpp:2594-2782).
    ``l2_refine`` mirrors apply_l2_after_robust (optimizer.cpp:488-735):
    after the robust solve + chi2 sweep, outlier observations are masked out
    and the remaining inliers are re-solved with plain L2 loss.
    ``method="dogleg"`` swaps LM damping for a Powell dogleg trust region
    (the reference's use_dogleg Ceres option, optimizer.cpp:448-456): same
    normal equations, step = Gauss-Newton clipped to the trust radius along
    the classic two-segment path, radius adapted by the gain ratio.
    """
    out = _lm_run(p, p.R, p.t, p.Xw, p.lam, jnp.asarray(robust),
                  invdepth, max_iters, th2_mono, th2_stereo,
                  optimize_landmarks, lam0, method=method)
    if l2_refine:
        # robust->L2: drop chi2/depth outliers, re-solve the inlier-only
        # problem with L2 loss starting from the robust solution
        p2 = p._replace(obs_valid=out.obs_inlier)
        out2 = _lm_run(p2, out.R, out.t, out.Xw, out.lam, jnp.asarray(False),
                       invdepth, l2_iters, th2_mono, th2_stereo,
                       optimize_landmarks, lam0, method=method)
        out = BAResult(out2.R, out2.t, out2.Xw, out2.lam,
                       out2.obs_inlier & out.obs_inlier,
                       out.cost0, out2.cost, out.n_iters + out2.n_iters)
    return out


def _lm_run(
    p: BAProblem,
    R_init, t_init, Xw_init, lam_init, rob,
    invdepth: bool,
    max_iters: int,
    th2_mono: float,
    th2_stereo: float,
    optimize_landmarks: bool,
    lam0: float,
    psum_axis: Optional[str] = None,
    method: str = "lm",
) -> BAResult:
    """One robust-or-L2 LM run. With ``psum_axis`` set the function runs
    inside shard_map with the observation arrays sharded over that mesh
    axis: normal equations and costs are psum-accumulated over ICI, every
    device then executes the identical (replicated) Schur solve, and the
    returned obs_inlier covers only the local shard (reassembled by the
    caller's out_specs). All LM accept/reject decisions key off the global
    cost, so devices stay in lockstep."""
    dt = p.t.dtype
    F = p.R.shape[0]
    L = p.lam.shape[0]
    nl = 1 if invdepth else 3
    opt_lm_flag = jnp.asarray(optimize_landmarks)

    pose_w = p.pose_opt.astype(dt)                       # (F,)
    lm_w = p.lm_valid.astype(dt) * opt_lm_flag           # (L,)

    def build(R, t, Xw, lam):
        r, J_obs, J_anc, J_lm, pos = _residuals_all(p, R, t, Xw, lam, invdepth)
        if invdepth:
            J_anc = _anchor_jacobian_fix(p, R, t, lam, J_anc)
        if invdepth:
            J_lm_ = J_lm                                   # (O, 2, 1)
        else:
            J_lm_ = J_lm                                   # (O, 2, 3)
        w, chi2, th2 = _sqrtw(p, r, pos, th2_mono, th2_stereo, rob)
        obs_lm_w = lm_w[p.obs_lm]

        # mask: constant poses contribute no pose-Jacobian
        anc_idx = p.anchor[p.obs_lm] if invdepth else p.obs_kf
        Jo = J_obs * (w * pose_w[p.obs_kf])[:, None, None]
        Ja = J_anc * (w * pose_w[anc_idx])[:, None, None] if invdepth else J_anc
        Jl = J_lm_ * (w * obs_lm_w)[:, None, None]
        rw = r * w[:, None]

        cost = _cost(p, r, p.obs_valid.astype(dt), chi2, th2, rob)

        # ---- accumulate normal equations ----
        # pose-pose dense blocks (F, F, 6, 6)
        Hpp = jnp.zeros((F, F, 6, 6), dt)
        Hpp = Hpp.at[p.obs_kf, p.obs_kf].add(jnp.einsum("oij,oik->ojk", Jo, Jo))
        bp = jnp.zeros((F, 6), dt)
        bp = bp.at[p.obs_kf].add(jnp.einsum("oij,oi->oj", Jo, rw))
        if invdepth:
            Hpp = Hpp.at[anc_idx, anc_idx].add(jnp.einsum("oij,oik->ojk", Ja, Ja))
            Hpp = Hpp.at[p.obs_kf, anc_idx].add(jnp.einsum("oij,oik->ojk", Jo, Ja))
            Hpp = Hpp.at[anc_idx, p.obs_kf].add(jnp.einsum("oij,oik->ojk", Ja, Jo))
            bp = bp.at[anc_idx].add(jnp.einsum("oij,oi->oj", Ja, rw))

        # landmark diagonal (L, nl, nl) + rhs (L, nl)
        Hll = jnp.zeros((L, nl, nl), dt)
        Hll = Hll.at[p.obs_lm].add(jnp.einsum("oij,oik->ojk", Jl, Jl))
        bl = jnp.zeros((L, nl), dt)
        bl = bl.at[p.obs_lm].add(jnp.einsum("oij,oi->oj", Jl, rw))

        # pose-landmark coupling (L, F, 6, nl)
        W = jnp.zeros((L, F, 6, nl), dt)
        W = W.at[p.obs_lm, p.obs_kf].add(jnp.einsum("oij,oik->ojk", Jo, Jl))
        if invdepth:
            W = W.at[p.obs_lm, anc_idx].add(jnp.einsum("oij,oik->ojk", Ja, Jl))

        if psum_axis is not None:
            # accumulate the per-shard normal equations over the mesh
            Hpp, bp, Hll, bl, W, cost = jax.tree.map(
                lambda x: jax.lax.psum(x, psum_axis),
                (Hpp, bp, Hll, bl, W, cost))
        return Hpp, bp, Hll, bl, W, cost

    def eval_cost(R, t, Xw, lam):
        r, _, _, _, pos = _residuals_all(p, R, t, Xw, lam, invdepth)
        chi2 = jnp.sum(r * r, axis=-1)
        th2 = jnp.where(p.obs_right, th2_stereo, th2_mono)
        c = _cost(p, r, p.obs_valid.astype(dt), chi2, th2, rob)
        return jax.lax.psum(c, psum_axis) if psum_axis is not None else c

    def solve_step(Hpp, bp, Hll, bl, W, damp):
        # damp landmark blocks + invert
        eyeL = jnp.eye(nl, dtype=dt)
        Hll_d = Hll + damp * eyeL * jnp.maximum(
            jnp.abs(jnp.diagonal(Hll, axis1=-2, axis2=-1))[..., None], 1e-6)
        # guard empty landmarks
        diag_ok = jnp.diagonal(Hll, axis1=-2, axis2=-1).sum(-1) > 1e-10
        Hll_g = Hll_d + (~diag_ok)[:, None, None] * eyeL
        if nl == 1:
            Hll_inv = 1.0 / jnp.where(jnp.abs(Hll_g) < 1e-12, 1e-12, Hll_g)
        else:
            # closed-form batched 3x3 inverse (jnp.linalg.inv lowers to a
            # sequential LU while-loop on TPU)
            from ov2slam_tpu.core import smallalg
            Hll_inv = smallalg.inv3(Hll_g)
        Hll_inv = Hll_inv * diag_ok[:, None, None]

        # Schur: S = Hpp - W Hll^-1 W^T   (einsum over landmarks -> MXU)
        WHinv = jnp.einsum("lfin,lnm->lfim", W, Hll_inv)       # (L, F, 6, nl)
        S_red = jnp.einsum("lfim,lgjm->fgij", WHinv, W)        # (F, F, 6, 6)
        S = Hpp - S_red
        b_red = bp - jnp.einsum("lfim,lm->fi", WHinv, bl)      # (F, 6)

        # flatten to (6F, 6F); damp pose diagonal; identity for const poses
        Sf = S.transpose(0, 2, 1, 3).reshape(F * 6, F * 6)
        diag = jnp.diag(Sf)
        Sf = Sf + jnp.diag(damp * jnp.maximum(jnp.abs(diag), 1e-6))
        const = (1.0 - pose_w)
        const6 = jnp.repeat(const, 6)
        Sf = Sf + jnp.diag(const6)
        bf = b_red.reshape(F * 6) * jnp.repeat(pose_w, 6)

        dxp = -jnp.linalg.solve(Sf, bf).reshape(F, 6)
        dxp = dxp * pose_w[:, None]

        # back-substitute landmarks: dl = Hll^-1 (-bl - W^T dxp)
        Wt_dx = jnp.einsum("lfim,fi->lm", W, dxp)              # (L, nl)
        dl = jnp.einsum("lnm,lm->ln", Hll_inv, -bl - Wt_dx)
        dl = dl * lm_w[:, None]
        return dxp, dl

    def apply_step(R, t, Xw, lam, dxp, dl):
        T_new = lie.se3_boxplus_left(SE3(R, t), dxp)
        if invdepth:
            lam_new = lam + dl[:, 0]
            return T_new.R, T_new.t, Xw, lam_new
        return T_new.R, T_new.t, Xw + dl, lam

    # LM with ONE normal-equation build per iteration: the carry holds the
    # best-so-far parameters AND their normal equations, so a rejected trial
    # re-solves the stored system with more damping instead of rebuilding.
    normals0 = build(R_init, t_init, Xw_init, lam_init)
    cost0 = normals0[-1]

    def lm_cond(state):
        it = state[0]
        done = state[-1]
        return (it < max_iters) & ~done

    def lm_body(state):
        (it, best, best_normals, best_cost, trial, damp, _) = state
        Hpp_t, bp_t, Hll_t, bl_t, W_t, cost_t = build(*trial)
        better = cost_t < best_cost
        pick = lambda a, b: jnp.where(better, a, b)
        best = tuple(pick(a, b) for a, b in zip(trial, best))
        best_normals = tuple(
            pick(a, b) for a, b in
            zip((Hpp_t, bp_t, Hll_t, bl_t, W_t), best_normals))
        best_cost = jnp.minimum(cost_t, best_cost)
        damp = jnp.clip(
            jnp.where(better, damp * 0.5, damp * 10.0), 1e-8, 1e6)
        dxp, dl = solve_step(*best_normals, damp)
        Rn, tn, Xn, ln = apply_step(*best, dxp, dl)
        small = jnp.sum(dxp * dxp) + jnp.sum(dl * dl) < 1e-14
        return (it + 1, best, best_normals, best_cost, (Rn, tn, Xn, ln),
                damp, small)

    params0 = (R_init, t_init, Xw_init, lam_init)
    if method == "dogleg":
        # ---- Powell dogleg trust region (the reference's use_dogleg /
        # use_subspace_dogleg Ceres option, optimizer.cpp:448-456): same
        # normal equations as LM; the step is the Gauss-Newton solution
        # clipped to the trust radius along the classic two-segment
        # Cauchy-point -> GN path; the radius adapts on the gain ratio. ----
        def dogleg_step(Hpp, bp, Hll, bl, W, Delta):
            dxp_gn, dl_gn = solve_step(Hpp, bp, Hll, bl, W,
                                       jnp.asarray(1e-8, dt))
            gp = bp * pose_w[:, None]                       # J^T r (masked)
            gl = bl * lm_w[:, None]
            gTg = jnp.sum(gp * gp) + jnp.sum(gl * gl)
            Hg_p = (jnp.einsum("fgij,gj->fi", Hpp, gp)
                    + jnp.einsum("lfim,lm->fi", W, gl))
            Hg_l = (jnp.einsum("lnm,lm->ln", Hll, gl)
                    + jnp.einsum("lfim,fi->lm", W, gp))
            gTHg = jnp.sum(gp * Hg_p) + jnp.sum(gl * Hg_l)
            alpha = gTg / jnp.maximum(gTHg, 1e-12)
            sd_p, sd_l = -alpha * gp, -alpha * gl           # Cauchy step
            n_sd = alpha * jnp.sqrt(gTg)
            n_gn = jnp.sqrt(jnp.sum(dxp_gn ** 2) + jnp.sum(dl_gn ** 2))
            dp_p, dp_l = dxp_gn - sd_p, dl_gn - sd_l
            a2 = jnp.sum(dp_p ** 2) + jnp.sum(dp_l ** 2)
            ab = jnp.sum(sd_p * dp_p) + jnp.sum(sd_l * dp_l)
            c2 = n_sd * n_sd - Delta * Delta
            disc = jnp.maximum(ab * ab - a2 * c2, 0.0)
            beta = jnp.clip((-ab + jnp.sqrt(disc)) / jnp.maximum(a2, 1e-12),
                            0.0, 1.0)
            case_gn = n_gn <= Delta
            case_sd = (~case_gn) & (n_sd >= Delta)
            s_sd = Delta / jnp.maximum(n_sd, 1e-12)
            h_p = jnp.where(case_gn, dxp_gn,
                            jnp.where(case_sd, s_sd * sd_p,
                                      sd_p + beta * dp_p))
            h_l = jnp.where(case_gn, dl_gn,
                            jnp.where(case_sd, s_sd * sd_l,
                                      sd_l + beta * dp_l))
            # predicted decrease of the (un-halved) cost: -2(g.h + h.Hh/2)
            Hh_p = (jnp.einsum("fgij,gj->fi", Hpp, h_p)
                    + jnp.einsum("lfim,lm->fi", W, h_l))
            Hh_l = (jnp.einsum("lnm,lm->ln", Hll, h_l)
                    + jnp.einsum("lfim,fi->lm", W, h_p))
            gh = jnp.sum(gp * h_p) + jnp.sum(gl * h_l)
            hHh = jnp.sum(h_p * Hh_p) + jnp.sum(h_l * Hh_l)
            pred = -2.0 * (gh + 0.5 * hHh)
            n_h = jnp.sqrt(jnp.sum(h_p ** 2) + jnp.sum(h_l ** 2))
            return h_p, h_l, pred, n_h

        def dl_cond(state):
            it, _, _, _, _, done = state
            return (it < max_iters) & ~done

        def dl_body(state):
            it, params, normals, cost, Delta, _ = state
            h_p, h_l, pred, n_h = dogleg_step(*normals, Delta)
            trial = apply_step(*params, h_p, h_l)
            cost_t = eval_cost(*trial)
            rho = (cost - cost_t) / jnp.maximum(pred, 1e-12)
            accept = cost_t < cost
            Delta = jnp.clip(
                jnp.where(rho > 0.75, jnp.maximum(Delta, 3.0 * n_h),
                          jnp.where(rho < 0.25, 0.5 * Delta, Delta)),
                1e-8, 1e8)
            params = tuple(jnp.where(accept, a, b)
                           for a, b in zip(trial, params))
            trial_normals = build(*params)
            normals = tuple(jnp.where(accept, a, b)
                            for a, b in zip(trial_normals[:5], normals))
            cost = jnp.minimum(cost_t, cost)
            done = n_h < 1e-7
            return it + 1, params, normals, cost, Delta, done

        it, best_f, _, cost_f, _, _ = jax.lax.while_loop(
            dl_cond, dl_body,
            (jnp.asarray(0), params0, normals0[:5], cost0,
             jnp.asarray(1.0, dt), jnp.asarray(False)))
        R_f, t_f, X_f, lam_f = best_f
    else:
        dxp0, dl0 = solve_step(*normals0[:5], jnp.asarray(lam0, dt))
        trial0 = apply_step(*params0, dxp0, dl0)
        it, best_f, _, _, trial_f, _, _ = jax.lax.while_loop(
            lm_cond, lm_body,
            (jnp.asarray(1), params0, normals0[:5], cost0, trial0,
             jnp.asarray(lam0, dt), jnp.asarray(False)),
        )
        # the final trial may beat the best-so-far; take the winner
        cost_trial = eval_cost(*trial_f)
        cost_best = eval_cost(*best_f)
        take_trial = cost_trial < cost_best
        R_f, t_f, X_f, lam_f = tuple(
            jnp.where(take_trial, a, b) for a, b in zip(trial_f, best_f))
        cost_f = jnp.minimum(cost_trial, cost_best)

    # final chi2 / depth-positivity sweep (optimizer.cpp:488-627)
    r, _, _, _, pos = _residuals_all(p, R_f, t_f, X_f, lam_f, invdepth)
    chi2 = jnp.sum(r * r, axis=-1)
    th2 = jnp.where(p.obs_right, th2_stereo, th2_mono)
    inl = p.obs_valid & (chi2 <= th2) & pos

    # world positions for writeback
    if invdepth:
        T_wa = lie.se3_inverse(SE3(R_f[p.anchor], t_f[p.anchor]))
        ilam = 1.0 / jnp.where(jnp.abs(lam_f) < 1e-9, 1e-9, lam_f)
        Xw_out = lie.se3_apply(T_wa, p.bearing * ilam[:, None])
    else:
        Xw_out = X_f

    return BAResult(R_f, t_f, Xw_out, lam_f, inl, cost0, cost_f, it)


# ---------------------------------------------------------------------------
# structure-only BA: block-diagonal normal equations, no Schur machinery
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("max_iters",))
def solve_structure_only(
    p: BAProblem,
    max_iters: int = 3,
    th2_mono: float = 5.9915,
    th2_stereo: float = 7.8147,
    robust: bool = True,
) -> BAResult:
    """Refine landmark positions with every pose held fixed
    (Optimizer::structureOnlyBA, reference: src/optimizer.cpp:2594-2782).

    With poses constant the normal equations are block-diagonal — one 3x3
    block per landmark — so this solver is batched damped Gauss-Newton with
    PER-LANDMARK accept/reject (landmark costs are independent), no Schur
    complement, no reduced camera system. It compiles to a tiny HLO compared
    to `solve_ba` (whose dense-Schur program both costs a multi-second
    trace+compile at loop-closure time and has crashed the XLA CPU backend),
    and runs in a fraction of the time. Landmarks are optimized in XYZ;
    inverse depths are recomputed from the (fixed) anchor poses afterwards.
    Landmarks with fewer than 2 valid observations are left untouched (a
    single ray cannot constrain a point)."""
    dt = p.Xw.dtype
    L = p.Xw.shape[0]
    rob = jnp.asarray(robust)

    n_obs = jnp.zeros((L,), jnp.int32).at[p.obs_lm].add(
        p.obs_valid.astype(jnp.int32))
    sel = p.lm_valid & (n_obs >= 2)

    def eqs(Xw):
        r, _, _, Jx, pos = _residuals_all(p, p.R, p.t, Xw, p.lam, False)
        w, chi2, th2 = _sqrtw(p, r, pos, th2_mono, th2_stereo, rob)
        Jw = Jx * w[:, None, None]
        rw = r * w[:, None]
        Hb = jnp.einsum("oij,oik->ojk", Jw, Jw)
        gb = jnp.einsum("oij,oi->oj", Jw, rw)
        H = jnp.zeros((L, 3, 3), dt).at[p.obs_lm].add(Hb)
        g = jnp.zeros((L, 3), dt).at[p.obs_lm].add(gb)
        th = jnp.sqrt(th2)
        rho = jnp.where(chi2 <= th2, chi2, 2.0 * th * jnp.sqrt(chi2) - th2)
        c_o = jnp.where(rob, rho, chi2) * p.obs_valid.astype(dt)
        c = jnp.zeros((L,), dt).at[p.obs_lm].add(c_o)
        return H, g, c

    H, g, cost_l = eqs(p.Xw)
    cost0 = jnp.sum(jnp.where(sel, cost_l, 0.0))
    damp = jnp.full((L,), 1e-3, dt)
    eye3 = jnp.eye(3, dtype=dt)
    X = p.Xw
    for _ in range(max_iters):
        dH = jnp.maximum(
            jnp.diagonal(H, axis1=-2, axis2=-1), 1e-8)       # (L, 3)
        Hd = H + damp[:, None, None] * dH[:, :, None] * eye3 + 1e-10 * eye3
        dx = -jnp.einsum("lij,lj->li", smallalg.inv3(Hd), g)
        Xn = jnp.where(sel[:, None], X + dx, X)
        Hn, gn, cn = eqs(Xn)
        better = (cn < cost_l) & sel
        X = jnp.where(better[:, None], Xn, X)
        H = jnp.where(better[:, None, None], Hn, H)
        g = jnp.where(better[:, None], gn, g)
        cost_l = jnp.where(better, cn, cost_l)
        damp = jnp.clip(jnp.where(better, damp * 0.5, damp * 4.0), 1e-8, 1e4)
    cost = jnp.sum(jnp.where(sel, cost_l, 0.0))

    # recompute inverse depths in the (fixed) anchor frames
    z_anc = lie.se3_apply(SE3(p.R[p.anchor], p.t[p.anchor]), X)[..., 2]
    lam_out = jnp.where(sel, 1.0 / jnp.maximum(z_anc, 1e-6), p.lam)

    # final chi2 / depth-positivity sweep (same gate as solve_ba)
    r, _, _, _, pos = _residuals_all(p, p.R, p.t, X, lam_out, False)
    chi2 = jnp.sum(r * r, axis=-1)
    th2 = jnp.where(p.obs_right, th2_stereo, th2_mono)
    inl = p.obs_valid & (chi2 <= th2) & pos
    return BAResult(p.R, p.t, X, lam_out, inl, cost0, cost,
                    jnp.asarray(max_iters))
