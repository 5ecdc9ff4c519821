"""SE(3) pose-graph optimization: relative-pose chain + loop edges.

Replaces the reference's localPoseGraph / fullPoseGraph Ceres problems
(reference: src/optimizer.cpp:2346-2592, :2783-2865): sequential relative-pose
factors between consecutive keyframes plus loop-closure edge(s), solved with
LM; the first (loop) keyframe is held fixed as gauge.

TPU-first: E padded edge slots, batched residual/Jacobian evaluation
(autodiff 6x6 blocks via vmap), dense (6F, 6F) normal equations assembled by
scatter-add and factorized on device — trajectory-scale F stays in the
low thousands, where a dense solve is faster on the MXU than any sparse
traversal.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ov2slam_tpu.core import lie
from ov2slam_tpu.core.lie import SE3
from ov2slam_tpu.opt import residuals as res


class PoseGraphProblem(NamedTuple):
    R: jnp.ndarray           # (F, 3, 3) world-to-cam
    t: jnp.ndarray           # (F, 3)
    pose_opt: jnp.ndarray    # (F,) bool — False = gauge-fixed
    edge_i: jnp.ndarray      # (E,) int32
    edge_j: jnp.ndarray      # (E,) int32
    # measured relative pose T_ij = T_i T_j^-1 (world-to-cam convention)
    meas_R: jnp.ndarray      # (E, 3, 3)
    meas_t: jnp.ndarray      # (E, 3)
    edge_weight: jnp.ndarray # (E,) 0 = padding; loop edges may be upweighted


class PoseGraphResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    cost0: jnp.ndarray
    cost: jnp.ndarray


def _edge_res_jac(p: PoseGraphProblem, R, t):
    Ti = SE3(R[p.edge_i], t[p.edge_i])
    Tj = SE3(R[p.edge_j], t[p.edge_j])
    meas = SE3(p.meas_R, p.meas_t)

    def one(Ri, ti, Rj, tj, Rm, tm):
        return res.relpose_jacobians(SE3(Ri, ti), SE3(Rj, tj), SE3(Rm, tm))

    r, Ja, Jb = jax.vmap(one)(Ti.R, Ti.t, Tj.R, Tj.t, meas.R, meas.t)
    return r, Ja, Jb       # (E, 6), (E, 6, 6), (E, 6, 6)


@functools.partial(jax.jit, static_argnames=("max_iters",))
def solve_pose_graph(
    p: PoseGraphProblem,
    max_iters: int = 10,
    lam0: float = 1e-6,
) -> PoseGraphResult:
    dt = p.t.dtype
    F = p.R.shape[0]
    pose_w = p.pose_opt.astype(dt)

    def eval_cost(R, t):
        r, _, _ = _edge_res_jac(p, R, t)
        return jnp.sum(jnp.sum(r * r, axis=-1) * p.edge_weight)

    def build(R, t):
        r, Ja, Jb = _edge_res_jac(p, R, t)
        w = jnp.sqrt(p.edge_weight)[:, None]
        rw = r * w
        Jaw = Ja * w[..., None] * pose_w[p.edge_i][:, None, None]
        Jbw = Jb * w[..., None] * pose_w[p.edge_j][:, None, None]

        H = jnp.zeros((F, F, 6, 6), dt)
        H = H.at[p.edge_i, p.edge_i].add(jnp.einsum("eij,eik->ejk", Jaw, Jaw))
        H = H.at[p.edge_j, p.edge_j].add(jnp.einsum("eij,eik->ejk", Jbw, Jbw))
        H = H.at[p.edge_i, p.edge_j].add(jnp.einsum("eij,eik->ejk", Jaw, Jbw))
        H = H.at[p.edge_j, p.edge_i].add(jnp.einsum("eij,eik->ejk", Jbw, Jaw))
        g = jnp.zeros((F, 6), dt)
        g = g.at[p.edge_i].add(jnp.einsum("eij,ei->ej", Jaw, rw))
        g = g.at[p.edge_j].add(jnp.einsum("eij,ei->ej", Jbw, rw))
        return H, g

    def step(R, t, damp):
        H, g = build(R, t)
        Hf = H.transpose(0, 2, 1, 3).reshape(F * 6, F * 6)
        diag = jnp.diag(Hf)
        Hf = Hf + jnp.diag(damp * jnp.maximum(jnp.abs(diag), 1e-8))
        Hf = Hf + jnp.diag(jnp.repeat(1.0 - pose_w, 6))
        gf = g.reshape(F * 6) * jnp.repeat(pose_w, 6)
        dx = -jnp.linalg.solve(Hf, gf).reshape(F, 6)
        dx = dx * pose_w[:, None]
        T = lie.se3_boxplus_left(SE3(R, t), dx)
        return T.R, T.t, dx

    cost0 = eval_cost(p.R, p.t)

    def cond(state):
        it, _, _, _, _, done = state
        return (it < max_iters) & ~done

    def body(state):
        it, R, t, damp, cost, _ = state
        Rn, tn, dx = step(R, t, damp)
        cost_new = eval_cost(Rn, tn)
        better = cost_new < cost
        R_o = jnp.where(better, Rn, R)
        t_o = jnp.where(better, tn, t)
        damp_o = jnp.clip(jnp.where(better, damp * 0.5, damp * 10.0), 1e-9, 1e6)
        cost_o = jnp.where(better, cost_new, cost)
        small = jnp.sum(dx * dx) < 1e-14
        return it + 1, R_o, t_o, damp_o, cost_o, small

    _, R_f, t_f, _, cost_f, _ = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(0), p.R, p.t, jnp.asarray(lam0, dt), cost0, jnp.asarray(False)),
    )
    return PoseGraphResult(R_f, t_f, cost0, cost_f)


def propagate_correction(
    R_old: jnp.ndarray, t_old: jnp.ndarray,
    R_new: jnp.ndarray, t_new: jnp.ndarray,
    last_idx: jnp.ndarray,
    R_tail: jnp.ndarray, t_tail: jnp.ndarray,
) -> SE3:
    """Apply the correction of keyframe `last_idx` to newer poses that were
    not in the graph (reference: optimizer.cpp:2527-2589): for each tail pose
    T, T' = T * T_old(last)^-1... in world-to-cam convention:
    T'_cw = T_cw ∘ (T_old_cw)^-1 ∘ T_new_cw evaluated at last_idx."""
    T_old = SE3(R_old[last_idx], t_old[last_idx])
    T_new = SE3(R_new[last_idx], t_new[last_idx])
    corr = lie.se3_compose(lie.se3_inverse(T_old), T_new)
    T_tail = SE3(R_tail, t_tail)
    return lie.se3_compose(T_tail, corr)
