"""Global bundle adjustment: matrix-free Schur-reduced PCG, one solve over
ALL keyframes.

Replaces the reference's final Optimizer::fullBA (reference:
src/optimizer.cpp:1674-2333 — one sparse Ceres problem over every keyframe
from 0, SPARSE_SCHUR), and supersedes the dense-window sweep fallback
(slam/estimator.py windowed_ba): sequential window sweeps anchor each window
on the previous one and can leave cross-window residue a single global solve
removes.

TPU-first design — the dense local-BA layout (opt/ba.py) materializes the
(L, F, 6, nl) pose-landmark coupling tensor, which is quadratic in window
size and dies at F ~ hundreds. Here nothing bigger than the observation
arrays is ever materialized:

* landmark blocks are eliminated EXACTLY per landmark (Hll is block
  diagonal; its inverse is a batched nl x nl inverse);
* the reduced camera system S = Hpp - W Hll^-1 W^T is applied matrix-free:
  each S @ v is two batched passes over the observation arrays
  (gather pose blocks -> per-obs 2-vectors -> scatter-add back), all
  standard XLA gather/scatter on padded arrays;
* the linear solve is preconditioned CG (block-Jacobi preconditioner from
  the 6x6 pose diagonal of Hpp) with a fixed iteration budget inside
  lax.fori_loop — an offline final pass, so latency-per-iteration is not
  on the tracking path;
* the outer loop is LM accept/reject on the true robust cost, with the
  same Huber IRLS weighting, chi2 outlier sweep, and optional robust->L2
  re-solve as the local solver.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ov2slam_tpu.core import lie
from ov2slam_tpu.core import smallalg
from ov2slam_tpu.core.lie import SE3
from ov2slam_tpu.opt import ba as ba_mod
from ov2slam_tpu.opt.ba import BAProblem, BAResult


def _jacobians(p: BAProblem, R, t, Xw, lam, invdepth, rob,
               th2_mono, th2_stereo, pose_w, lm_w):
    """Weighted residuals/Jacobians per observation + masks folded in.

    Returns (rw, Jo, Ja, Jl, cost) with sqrt-IRLS weights and const-pose /
    invalid-landmark masking already applied (same scheme as
    ba._lm_run.build)."""
    r, J_obs, J_anc, J_lm, pos = ba_mod._residuals_all(
        p, R, t, Xw, lam, invdepth)
    if invdepth:
        J_anc = ba_mod._anchor_jacobian_fix(p, R, t, lam, J_anc)
    w, chi2, th2 = ba_mod._sqrtw(p, r, pos, th2_mono, th2_stereo, rob)
    dt = r.dtype
    obs_lm_w = lm_w[p.obs_lm]
    anc_idx = p.anchor[p.obs_lm] if invdepth else p.obs_kf
    Jo = J_obs * (w * pose_w[p.obs_kf])[:, None, None]
    Ja = (J_anc * (w * pose_w[anc_idx])[:, None, None]
          if invdepth else jnp.zeros_like(J_obs))
    Jl = J_lm * (w * obs_lm_w)[:, None, None]
    rw = r * w[:, None]
    cost = ba_mod._cost(p, r, p.obs_valid.astype(dt), chi2, th2, rob)
    return rw, Jo, Ja, Jl, cost, anc_idx


@functools.partial(
    jax.jit,
    static_argnames=("invdepth", "max_iters", "robust", "cg_iters",
                     "l2_refine", "l2_iters"),
)
def solve_ba_global(
    p: BAProblem,
    invdepth: bool = True,
    max_iters: int = 12,
    robust: bool = True,
    th2_mono: float = 5.9915,
    th2_stereo: float = 7.8147,
    lam0: float = 1e-4,
    cg_iters: int = 48,
    l2_refine: bool = True,
    l2_iters: int = 6,
) -> BAResult:
    """One global Schur-PCG LM solve over the whole padded problem."""
    out = _lm_pcg(p, p.R, p.t, p.Xw, p.lam, jnp.asarray(robust), invdepth,
                  max_iters, th2_mono, th2_stereo, lam0, cg_iters)
    if l2_refine:
        p2 = p._replace(obs_valid=out.obs_inlier)
        out2 = _lm_pcg(p2, out.R, out.t, out.Xw, out.lam, jnp.asarray(False),
                       invdepth, l2_iters, th2_mono, th2_stereo, lam0,
                       cg_iters)
        out = BAResult(out2.R, out2.t, out2.Xw, out2.lam,
                       out2.obs_inlier & out.obs_inlier,
                       out.cost0, out2.cost, out.n_iters + out2.n_iters)
    return out


def _lm_pcg(p, R_init, t_init, Xw_init, lam_init, rob, invdepth,
            max_iters, th2_mono, th2_stereo, lam0, cg_iters):
    dt = p.t.dtype
    F = p.R.shape[0]
    L = p.lam.shape[0]
    nl = 1 if invdepth else 3
    pose_w = p.pose_opt.astype(dt)
    lm_w = p.lm_valid.astype(dt)
    eyeL = jnp.eye(nl, dtype=dt)

    def build(R, t, Xw, lam):
        rw, Jo, Ja, Jl, cost, anc = _jacobians(
            p, R, t, Xw, lam, invdepth, rob, th2_mono, th2_stereo,
            pose_w, lm_w)
        # landmark diagonal blocks + rhs
        Hll = jnp.zeros((L, nl, nl), dt).at[p.obs_lm].add(
            jnp.einsum("oij,oik->ojk", Jl, Jl))
        bl = jnp.zeros((L, nl), dt).at[p.obs_lm].add(
            jnp.einsum("oij,oi->oj", Jl, rw))
        # pose 6x6 diagonal blocks (preconditioner) + rhs
        Hpp_d = jnp.zeros((F, 6, 6), dt).at[p.obs_kf].add(
            jnp.einsum("oij,oik->ojk", Jo, Jo))
        bp = jnp.zeros((F, 6), dt).at[p.obs_kf].add(
            jnp.einsum("oij,oi->oj", Jo, rw))
        if invdepth:
            Hpp_d = Hpp_d.at[anc].add(jnp.einsum("oij,oik->ojk", Ja, Ja))
            bp = bp.at[anc].add(jnp.einsum("oij,oi->oj", Ja, rw))
        return (rw, Jo, Ja, Jl, anc, Hll, bl, Hpp_d, bp), cost

    def eval_cost(R, t, Xw, lam):
        r, _, _, _, pos = ba_mod._residuals_all(p, R, t, Xw, lam, invdepth)
        chi2 = jnp.sum(r * r, axis=-1)
        th2 = jnp.where(p.obs_right, th2_stereo, th2_mono)
        return ba_mod._cost(p, r, p.obs_valid.astype(dt), chi2, th2, rob)

    def solve_step(sys, damp):
        rw, Jo, Ja, Jl, anc, Hll, bl, Hpp_d, bp = sys
        # damped exact landmark-block inverse
        Hll_damp = Hll + damp * eyeL * jnp.maximum(
            jnp.abs(jnp.diagonal(Hll, axis1=-2, axis2=-1))[..., None], 1e-6)
        diag_ok = jnp.diagonal(Hll, axis1=-2, axis2=-1).sum(-1) > 1e-10
        if nl == 1:
            Hll_inv = (1.0 / jnp.maximum(Hll_damp, 1e-12)) \
                * diag_ok[:, None, None]
        else:
            Hll_inv = smallalg.inv3(
                Hll_damp + (~diag_ok)[:, None, None] * eyeL)
            Hll_inv = Hll_inv * diag_ok[:, None, None]

        def pose_gather(v):
            # per-obs 2-vector J v restricted to pose blocks
            u = jnp.einsum("oij,oj->oi", Jo, v[p.obs_kf])
            if invdepth:
                u = u + jnp.einsum("oij,oj->oi", Ja, v[anc])
            return u                                        # (O, 2)

        def pose_scatter(u):
            # J^T u accumulated into pose slots
            g = jnp.zeros((F, 6), dt).at[p.obs_kf].add(
                jnp.einsum("oij,oi->oj", Jo, u))
            if invdepth:
                g = g.at[anc].add(jnp.einsum("oij,oi->oj", Ja, u))
            return g

        def lm_scatter(u):
            return jnp.zeros((L, nl), dt).at[p.obs_lm].add(
                jnp.einsum("oij,oi->oj", Jl, u))

        def lm_gather(y):
            return jnp.einsum("oij,oj->oi", Jl, y[p.obs_lm])  # (O, 2)

        diagS = jnp.diagonal(Hpp_d, axis1=-2, axis2=-1)       # (F, 6)
        const = 1.0 - pose_w

        def S_mv(v):
            # v (F, 6) -> S v, S = Hpp - W Hll^-1 W^T + damping + gauge
            u = pose_gather(v)                                # (O, 2)
            hv = pose_scatter(u)
            y = jnp.einsum("lnm,lm->ln", Hll_inv, lm_scatter(u))
            hv = hv - pose_scatter(lm_gather(y))
            hv = hv + damp * jnp.maximum(jnp.abs(diagS), 1e-6) * v
            return hv * pose_w[:, None] + const[:, None] * v

        # reduced rhs: b_red = bp - W Hll^-1 bl  (we solve S dx = -b_red)
        y0 = jnp.einsum("lnm,lm->ln", Hll_inv, bl)
        b_red = (bp - pose_scatter(lm_gather(y0))) * pose_w[:, None]

        # block-Jacobi preconditioner from the damped pose diagonal
        M = Hpp_d + (damp * jnp.maximum(jnp.abs(diagS), 1e-6)
                     )[:, :, None] * jnp.eye(6, dtype=dt) \
            + (const[:, None, None] + 1e-8) * jnp.eye(6, dtype=dt)

        def precond(r_):
            return smallalg.solve_spd(M, r_) * pose_w[:, None]

        # PCG on S dx = -b_red
        b = -b_red
        x = jnp.zeros((F, 6), dt)
        r_ = b
        z = precond(r_)
        rho = jnp.sum(r_ * z)

        def cg_body(_, carry):
            x, r_, z, rho, d = carry
            Sd = S_mv(d)
            alpha = rho / jnp.maximum(jnp.sum(d * Sd), 1e-20)
            x2 = x + alpha * d
            r2 = r_ - alpha * Sd
            z2 = precond(r2)
            rho2 = jnp.sum(r2 * z2)
            beta = rho2 / jnp.maximum(rho, 1e-20)
            d2 = z2 + beta * d
            # freeze once converged (masked no-op keeps fori shape-stable)
            live = rho > 1e-16
            keep = lambda a, bnew: jnp.where(live, bnew, a)
            return (keep(x, x2), keep(r_, r2), keep(z, z2),
                    jnp.where(live, rho2, rho), keep(d, d2))

        x, *_ = jax.lax.fori_loop(0, cg_iters, cg_body, (x, r_, z, rho, z))
        dxp = x * pose_w[:, None]

        # back-substitute landmarks: dl = Hll^-1 (-bl - W^T dxp)
        Wt_dx = lm_scatter(pose_gather(dxp))
        dl = jnp.einsum("lnm,lm->ln", Hll_inv, -bl - Wt_dx)
        return dxp, dl * lm_w[:, None]

    def apply_step(R, t, Xw, lam, dxp, dl):
        T_new = lie.se3_boxplus_left(SE3(R, t), dxp)
        if invdepth:
            return T_new.R, T_new.t, Xw, lam + dl[:, 0]
        return T_new.R, T_new.t, Xw + dl, lam

    # LM loop: build once per accepted iterate (rejected trial re-solves the
    # stored system with more damping), same scheme as ba._lm_run
    sys0, cost0 = build(R_init, t_init, Xw_init, lam_init)

    def lm_cond(state):
        return (state[0] < max_iters) & ~state[-1]

    def lm_body(state):
        it, best, best_sys, best_cost, trial, damp, _ = state
        sys_t, cost_t = build(*trial)
        better = cost_t < best_cost
        pick = lambda a, b: jnp.where(better, a, b)
        best = tuple(pick(a, b) for a, b in zip(trial, best))
        best_sys = tuple(pick(a, b) for a, b in zip(sys_t, best_sys))
        best_cost = jnp.minimum(cost_t, best_cost)
        damp = jnp.clip(jnp.where(better, damp * 0.5, damp * 10.0),
                        1e-8, 1e6)
        dxp, dl = solve_step(best_sys, damp)
        trial2 = apply_step(*best, dxp, dl)
        small = jnp.sum(dxp * dxp) + jnp.sum(dl * dl) < 1e-14
        return it + 1, best, best_sys, best_cost, trial2, damp, small

    params0 = (R_init, t_init, Xw_init, lam_init)
    dxp0, dl0 = solve_step(sys0, jnp.asarray(lam0, dt))
    trial0 = apply_step(*params0, dxp0, dl0)
    it, best_f, _, _, trial_f, _, _ = jax.lax.while_loop(
        lm_cond, lm_body,
        (jnp.asarray(1), params0, sys0, cost0, trial0,
         jnp.asarray(lam0, dt), jnp.asarray(False)))

    cost_trial = eval_cost(*trial_f)
    cost_best = eval_cost(*best_f)
    take_trial = cost_trial < cost_best
    R_f, t_f, X_f, lam_f = tuple(
        jnp.where(take_trial, a, b) for a, b in zip(trial_f, best_f))
    cost_f = jnp.minimum(cost_trial, cost_best)

    r, _, _, _, pos = ba_mod._residuals_all(p, R_f, t_f, X_f, lam_f, invdepth)
    chi2 = jnp.sum(r * r, axis=-1)
    th2 = jnp.where(p.obs_right, th2_stereo, th2_mono)
    inl = p.obs_valid & (chi2 <= th2) & pos

    if invdepth:
        T_wa = lie.se3_inverse(SE3(R_f[p.anchor], t_f[p.anchor]))
        ilam = 1.0 / jnp.where(jnp.abs(lam_f) < 1e-9, 1e-9, lam_f)
        Xw_out = lie.se3_apply(T_wa, p.bearing * ilam[:, None])
    else:
        Xw_out = X_f

    return BAResult(R_f, t_f, Xw_out, lam_f, inl, cost0, cost_f, it)
