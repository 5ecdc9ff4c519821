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


_solve_pose_graph_batched = jax.jit(
    jax.vmap(lambda p: solve_pose_graph(p, max_iters=15)))


def relax_full_trajectory(
    poses_wc_raw: "np.ndarray",     # (F, 4, 4) tracking-time T_wc (float64)
    kf_frame_idx: "np.ndarray",     # (K,) frame indices that are live KFs
    kf_T_wc: "np.ndarray",          # (K, 4, 4) corrected KF poses T_wc
) -> "np.ndarray":
    """Full-trajectory pose graph (reference: Optimizer::fullPoseGraph,
    src/optimizer.cpp:2783-2865 + SlamManager::writeFullTrajectoryLC,
    src/ov2slam.cpp:624-701): every frame pose is a node, chain edges carry
    the tracking-time relative poses, keyframe poses are held constant at
    their loop-corrected values, and the non-KF poses relax onto that
    skeleton (<=100 Ceres iters in the reference).

    TPU-first redesign: with the KF nodes fixed, the chain decomposes into
    INDEPENDENT segments between consecutive keyframes. Instead of one
    sparse (6F, 6F) solve we batch the S segments (padded to a power-of-two
    length) and vmap the dense LM pose-graph solver over them — S small
    dense solves on the MXU, one dispatch, no sparsity bookkeeping.

    Returns (F, 4, 4) relaxed T_wc. Frames before the first / after the
    last keyframe get the rigid chain rebuild (with only one anchored
    endpoint the chain constraints are satisfiable exactly)."""
    import numpy as np

    F = len(poses_wc_raw)
    out = np.array(poses_wc_raw, np.float64, copy=True)
    if F == 0 or len(kf_frame_idx) == 0:
        return out

    # tracking-time relatives: rel[i] = T_wc_raw[i-1]^-1 @ T_wc_raw[i]
    inv_prev = np.linalg.inv(poses_wc_raw[:-1])
    rel = np.einsum("fij,fjk->fik", inv_prev, poses_wc_raw[1:])

    # --- rigid chain rebuild from corrected KF anchors (the "wlc" pass) ---
    kf_set = {int(i): k for k, i in enumerate(kf_frame_idx)}
    # walk backwards from the first KF for leading frames
    first_kf = int(kf_frame_idx[0])
    T = kf_T_wc[0].copy()
    for i in range(first_kf, -1, -1):
        out[i] = T
        if i > 0:
            T = T @ np.linalg.inv(rel[i - 1])
    T = kf_T_wc[0].copy()
    for i in range(first_kf, F):
        if i in kf_set:
            T = kf_T_wc[kf_set[i]].copy()
        elif i > 0:
            T = out[i - 1] @ rel[i - 1]
        out[i] = T

    # --- batched segment relaxation between consecutive KFs ---
    segs = []
    for a, b in zip(kf_frame_idx[:-1], kf_frame_idx[1:]):
        if b - a >= 2:                      # interior frames exist
            segs.append((int(a), int(b)))
    if not segs:
        return out

    Lmax = 1 << max(2, int(max(b - a for a, b in segs)).bit_length())
    S = len(segs)
    dt32 = np.float32
    R = np.tile(np.eye(3, dtype=dt32), (S, Lmax, 1, 1))
    t = np.zeros((S, Lmax, 3), dt32)
    opt = np.zeros((S, Lmax), bool)
    E = Lmax - 1
    ei = np.zeros((S, E), np.int32)
    ej = np.zeros((S, E), np.int32)
    mR = np.tile(np.eye(3, dtype=dt32), (S, E, 1, 1))
    mt = np.zeros((S, E, 3), dt32)
    w = np.zeros((S, E), dt32)
    for s, (a, b) in enumerate(segs):
        n = b - a + 1
        T_cw = np.linalg.inv(out[a:b + 1])          # init from chain rebuild
        R[s, :n] = T_cw[:, :3, :3]
        t[s, :n] = T_cw[:, :3, 3]
        opt[s, 1:n - 1] = True                       # endpoints fixed
        idx = np.arange(1, n)
        ei[s, :n - 1] = idx
        ej[s, :n - 1] = idx - 1
        # meas T_ij in world-to-cam: T_cw_i @ T_cw_j^-1 = T_wc_i^-1 T_wc_j
        m = np.linalg.inv(poses_wc_raw[a + 1:b + 1]) @ poses_wc_raw[a:b]
        mR[s, :n - 1] = m[:, :3, :3]
        mt[s, :n - 1] = m[:, :3, 3]
        w[s, :n - 1] = 1.0

    prob = PoseGraphProblem(
        R=jnp.asarray(R), t=jnp.asarray(t), pose_opt=jnp.asarray(opt),
        edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
        meas_R=jnp.asarray(mR), meas_t=jnp.asarray(mt),
        edge_weight=jnp.asarray(w))
    res = _solve_pose_graph_batched(prob)
    R_new = np.asarray(res.R, np.float64)
    t_new = np.asarray(res.t, np.float64)
    for s, (a, b) in enumerate(segs):
        for li in range(1, b - a):
            T_cw = np.eye(4)
            T_cw[:3, :3] = R_new[s, li]
            T_cw[:3, 3] = t_new[s, li]
            out[a + li] = np.linalg.inv(T_cw)
    return out


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
