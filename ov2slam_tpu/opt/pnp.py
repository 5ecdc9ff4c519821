"""Motion-only PnP: Levenberg-Marquardt over one SE(3) pose with Huber IRLS.

The device-side equivalent of the reference's ceresPnP (reference:
src/multi_view_geometry.cpp:481-586): robust (Huber) solve, optional L2
refinement, chi2-based outlier report. The whole solve — residuals, 6x6
normal equations, LM damping loop — is one jitted device computation over all
N observations at once (lax.while_loop, no host round trips).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ov2slam_tpu.core import lie
from ov2slam_tpu.core import smallalg
from ov2slam_tpu.core.lie import SE3
from ov2slam_tpu.opt import residuals as res
from ov2slam_tpu.opt.residuals import Calib


class PnPResult(NamedTuple):
    T_cw: SE3
    chi2: jnp.ndarray        # (N,) final squared pixel error per obs
    inliers: jnp.ndarray     # (N,) bool — chi2 <= robust th^2 & depth > 0
    n_inliers: jnp.ndarray
    cost: jnp.ndarray        # final robust cost


def _normal_eqs(calib, T, Xw, obs_px, w_valid, th2, robust):
    r, J, pos = res.reproj_se3(calib, T, Xw, obs_px)
    chi2 = jnp.sum(r * r, axis=-1)
    sw = jnp.where(robust, res.huber_weight(chi2, th2), 1.0)
    w = w_valid * sw
    Jw = J * w[:, None, None]
    rw = r * w[:, None]
    H = jnp.einsum("nij,nik->jk", Jw, Jw)
    g = jnp.einsum("nij,ni->j", Jw, rw)
    # Huber cost: 0.5*chi2 if inlier else th*(|r| - th/2)
    th = jnp.sqrt(th2)
    rho = jnp.where(chi2 <= th2, chi2, 2.0 * th * jnp.sqrt(chi2) - th2)
    cost = jnp.sum(jnp.where(robust, rho, chi2) * w_valid)
    return H, g, cost, chi2, pos


@functools.partial(jax.jit, static_argnames=("max_iters",))
def pnp_lm(
    calib: Calib,
    T_init: SE3,
    Xw: jnp.ndarray,         # (N, 3) world points
    obs_px: jnp.ndarray,     # (N, 2) undistorted pixel observations
    valid: jnp.ndarray,      # (N,) bool
    robust_th2: float = 5.9915,
    max_iters: int = 10,
    robust: bool = True,
) -> PnPResult:
    """LM with diagonal damping; fixed max iteration budget (the reference
    caps at 5 iters / 5 ms, multi_view_geometry.cpp:540-548 — we run 10 cheap
    device iterations instead).

    The iteration loop is UNROLLED (Python loop with a `done` mask) rather
    than a lax.while_loop: each while iteration costs a latency-bound device
    sync on TPU that dwarfs the ~6x6 arithmetic; unrolled, the whole solve
    fuses into straight-line code (converged iterations become masked
    no-ops)."""
    dt = Xw.dtype
    w_valid = valid.astype(dt)
    th2 = jnp.asarray(robust_th2, dt)
    rob = jnp.asarray(robust)

    H, g, cost0, _, _ = _normal_eqs(calib, T_init, Xw, obs_px, w_valid, th2, rob)
    lam = jnp.asarray(1e-3, dt)

    # One normal-equations evaluation per iteration: H/g/cost at the current
    # accepted pose are CARRIED, the candidate evaluation supplies both the
    # accept test and (if accepted) the next iteration's H/g. A rejected step
    # reuses the carried H/g with a larger damping — the same math as
    # re-deriving them at the unchanged pose, at half the per-iteration work.
    T = T_init
    cost = cost0
    done = jnp.asarray(False)
    for _ in range(max_iters):
        Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-10 * jnp.eye(6, dtype=dt)
        dx = -smallalg.solve_spd(Hd, g)
        T_new = lie.se3_boxplus_left(T, dx)
        H_new, g_new, cost_new, _, _ = _normal_eqs(
            calib, T_new, Xw, obs_px, w_valid, th2, rob)
        better = (cost_new < cost) & ~done
        T = SE3(jnp.where(better, T_new.R, T.R),
                jnp.where(better, T_new.t, T.t))
        H = jnp.where(better, H_new, H)
        g = jnp.where(better, g_new, g)
        lam = jnp.where(done, lam,
                        jnp.clip(jnp.where(better, lam * 0.5, lam * 4.0),
                                 1e-8, 1e4))
        cost = jnp.where(better, cost_new, cost)
        done = done | (jnp.sum(dx * dx) < 1e-12)
    T_fin, cost_fin = T, cost

    r, _, pos = res.reproj_se3(calib, T_fin, Xw, obs_px)
    chi2 = jnp.sum(r * r, axis=-1)
    inl = valid & (chi2 <= th2) & pos
    return PnPResult(T_fin, chi2, inl, jnp.sum(inl), cost_fin)


@functools.partial(jax.jit, static_argnames=("max_iters",))
def pnp_robust_then_l2(
    calib: Calib,
    T_init: SE3,
    Xw: jnp.ndarray,
    obs_px: jnp.ndarray,
    valid: jnp.ndarray,
    robust_th2: float = 5.9915,
    max_iters: int = 10,
) -> PnPResult:
    """The reference's two-stage scheme (apply_l2_after_robust,
    multi_view_geometry.cpp:560-586): Huber solve, drop outliers, then an L2
    polish on the surviving observations."""
    r1 = pnp_lm(calib, T_init, Xw, obs_px, valid, robust_th2, max_iters, robust=True)
    r2 = pnp_lm(calib, r1.T_cw, Xw, obs_px, r1.inliers, robust_th2,
                max_iters, robust=False)
    return r2
