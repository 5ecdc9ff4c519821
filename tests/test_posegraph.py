"""Pose-graph optimization tests (reference: optimizer.cpp:2346-2592)."""

import numpy as np
import jax.numpy as jnp

from ov2slam_tpu.core import lie
from ov2slam_tpu.core.lie import SE3
from ov2slam_tpu.opt import posegraph as pg


def make_drifty_loop(rng, n=40, drift_w=0.002, drift_t=0.01):
    """A square-ish loop trajectory with accumulated odometry drift.

    Returns gt poses (world-to-cam), drifted poses, and gt relative edges."""
    poses_gt = [SE3.identity()]
    for i in range(1, n):
        # move along a loop: rotate slowly around y while advancing in x
        w = np.array([0.0, 2 * np.pi / n, 0.0], np.float32)
        t = np.array([0.25, 0.0, 0.0], np.float32)
        T_step = lie.se3_compose(
            lie.SE3(lie.so3_exp(jnp.asarray(w)), jnp.asarray(t)), SE3.identity())
        poses_gt.append(lie.se3_compose(T_step, poses_gt[-1]))

    # drifted odometry: perturb each relative step slightly
    poses_dr = [poses_gt[0]]
    for i in range(1, n):
        T_rel = lie.se3_compose(poses_gt[i], lie.se3_inverse(poses_gt[i - 1]))
        noise = np.concatenate([
            rng.normal(0, drift_t, 3), rng.normal(0, drift_w, 3)]).astype(np.float32)
        T_rel_n = lie.se3_boxplus_left(T_rel, jnp.asarray(noise))
        poses_dr.append(lie.se3_compose(T_rel_n, poses_dr[-1]))
    return poses_gt, poses_dr


def test_pose_graph_closes_loop():
    rng = np.random.default_rng(0)
    n = 40
    poses_gt, poses_dr = make_drifty_loop(rng, n)

    # edges: consecutive chain with *drifted* measurements (odometry), plus a
    # loop edge (n-1 -> 0) with the ground-truth relative pose
    ei, ej, mR, mt, wgt = [], [], [], [], []
    for i in range(1, n):
        T_rel = lie.se3_compose(poses_dr[i], lie.se3_inverse(poses_dr[i - 1]))
        ei.append(i); ej.append(i - 1)
        mR.append(np.asarray(T_rel.R)); mt.append(np.asarray(T_rel.t)); wgt.append(1.0)
    T_loop = lie.se3_compose(poses_gt[n - 1], lie.se3_inverse(poses_gt[0]))
    ei.append(n - 1); ej.append(0)
    mR.append(np.asarray(T_loop.R)); mt.append(np.asarray(T_loop.t)); wgt.append(1.0)

    # pad
    E = len(ei) + 4
    pad = E - len(ei)
    ei += [0] * pad; ej += [0] * pad
    mR += [np.eye(3, dtype=np.float32)] * pad
    mt += [np.zeros(3, np.float32)] * pad
    wgt += [0.0] * pad

    prob = pg.PoseGraphProblem(
        R=jnp.asarray(np.stack([np.asarray(T.R) for T in poses_dr])),
        t=jnp.asarray(np.stack([np.asarray(T.t) for T in poses_dr])),
        pose_opt=jnp.asarray(np.array([False] + [True] * (n - 1))),
        edge_i=jnp.asarray(np.asarray(ei, np.int32)),
        edge_j=jnp.asarray(np.asarray(ej, np.int32)),
        meas_R=jnp.asarray(np.stack(mR)),
        meas_t=jnp.asarray(np.stack(mt)),
        edge_weight=jnp.asarray(np.asarray(wgt, np.float32)),
    )
    out = pg.solve_pose_graph(prob, max_iters=15)
    assert float(out.cost) < float(out.cost0) * 0.2

    # drift at the loop end must shrink substantially
    def end_err(R, t):
        T = SE3(jnp.asarray(R[n - 1]), jnp.asarray(t[n - 1]))
        d = lie.se3_compose(T, lie.se3_inverse(poses_gt[n - 1]))
        return float(jnp.linalg.norm(d.t)) + float(jnp.linalg.norm(lie.so3_log(d.R)))

    err_before = end_err(prob.R, prob.t)
    err_after = end_err(out.R, out.t)
    assert err_after < err_before * 0.3
    # middle poses also improve on average
    errs_b = [end_err(prob.R, prob.t)]
    tot_b = tot_a = 0.0
    for k in range(n):
        Tb = SE3(jnp.asarray(prob.R[k]), jnp.asarray(prob.t[k]))
        Ta = SE3(jnp.asarray(out.R[k]), jnp.asarray(out.t[k]))
        db = lie.se3_compose(Tb, lie.se3_inverse(poses_gt[k]))
        da = lie.se3_compose(Ta, lie.se3_inverse(poses_gt[k]))
        tot_b += float(jnp.linalg.norm(db.t))
        tot_a += float(jnp.linalg.norm(da.t))
    assert tot_a < tot_b * 0.7


def test_propagate_correction():
    rng = np.random.default_rng(1)
    poses_gt, poses_dr = make_drifty_loop(rng, 10)
    R_old = jnp.asarray(np.stack([np.asarray(T.R) for T in poses_dr]))
    t_old = jnp.asarray(np.stack([np.asarray(T.t) for T in poses_dr]))
    R_new = jnp.asarray(np.stack([np.asarray(T.R) for T in poses_gt]))
    t_new = jnp.asarray(np.stack([np.asarray(T.t) for T in poses_gt]))
    # a tail pose defined relative to pose 9 keeps its relative transform
    T_rel = lie.se3_exp(jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.1))
    T_tail_old = lie.se3_compose(T_rel, SE3(R_old[9], t_old[9]))
    out = pg.propagate_correction(
        R_old, t_old, R_new, t_new, 9, T_tail_old.R[None], T_tail_old.t[None])
    T_tail_new_expected = lie.se3_compose(T_rel, SE3(R_new[9], t_new[9]))
    np.testing.assert_allclose(
        np.asarray(out.R[0]), np.asarray(T_tail_new_expected.R), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.t[0]), np.asarray(T_tail_new_expected.t), atol=1e-5)


def test_relax_full_trajectory_beats_rigid_rebuild():
    """Full-trajectory pose graph (optimizer.cpp:2783-2865): non-KF poses
    relax onto the corrected KF skeleton; the rigid chain rebuild leaves
    the whole drift at segment ends, the relaxation spreads it."""
    rng = np.random.default_rng(3)
    n = 61
    kf_every = 6
    # ground-truth world poses T_wc along an arc
    gt = [np.eye(4)]
    for i in range(1, n):
        th = 0.02
        step = np.eye(4)
        step[:3, :3] = np.array([
            [np.cos(th), 0, np.sin(th)],
            [0, 1, 0],
            [-np.sin(th), 0, np.cos(th)]])
        step[:3, 3] = [0.1, 0.0, 0.01]
        gt.append(gt[-1] @ step)
    gt = np.stack(gt)

    # drifted tracking: integrate GT relatives with per-step noise
    raw = [gt[0].copy()]
    for i in range(1, n):
        rel = np.linalg.inv(gt[i - 1]) @ gt[i]
        d = np.eye(4)
        ax = rng.normal(0, 0.002, 3)
        th = np.linalg.norm(ax)
        K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]])
        d[:3, :3] = np.eye(3) + K + 0.5 * (K @ K)
        d[:3, 3] = rng.normal(0, 0.01, 3)
        raw.append(raw[-1] @ rel @ d)
    raw = np.stack(raw)

    kf_idx = np.arange(0, n, kf_every)
    relaxed = pg.relax_full_trajectory(raw, kf_idx, gt[kf_idx])

    # KF poses pass through exactly
    np.testing.assert_allclose(relaxed[kf_idx], gt[kf_idx], atol=1e-5)

    # rigid rebuild: each segment integrates raw relatives from its start KF
    rigid = raw.copy()
    for a in kf_idx:
        T = gt[a].copy()
        rigid[a] = T
        for i in range(a + 1, min(a + kf_every, n)):
            T = T @ (np.linalg.inv(raw[i - 1]) @ raw[i])
            rigid[i] = T

    def err(est):
        return np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1)

    interior = np.setdiff1d(np.arange(n), kf_idx)
    e_rigid = err(rigid)[interior]
    e_relax = err(relaxed)[interior]
    assert e_relax.mean() < e_rigid.mean() * 0.9
    assert e_relax.max() < e_rigid.max() * 1.01
    assert np.isfinite(relaxed).all()
