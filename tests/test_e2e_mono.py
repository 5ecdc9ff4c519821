"""Monocular VO end-to-end: essential-matrix bootstrap + up-to-scale
tracking (reference: trackMono + mono init, visual_front_end.cpp:65-128,
:855-984)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from ov2slam_tpu.config import SlamParams
from ov2slam_tpu.slam.manager import SlamSystem

import synthetic as syn


def umeyama_scale_ate(est, gt):
    """ATE RMSE after Sim(3) (scale-included) alignment — mono is
    scale-free."""
    est = np.asarray(est, np.float64)
    gt = np.asarray(gt, np.float64)
    mu_e, mu_g = est.mean(0), gt.mean(0)
    E, G = est - mu_e, gt - mu_g
    cov = G.T @ E / len(est)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_e = (E ** 2).sum() / len(est)
    c = np.trace(np.diag(D) @ S) / max(var_e, 1e-12)
    est_al = c * (R @ E.T).T + mu_g
    return float(np.sqrt(np.mean(np.sum((est_al - gt) ** 2, axis=-1)))), c


def test_mono_vo_bootstrap_and_track():
    frames_l, _, poses_gt = syn.render_sequence(n_frames=50, step=0.05)
    d = syn.slam_params_dict()
    d["mono"] = 1
    d["stereo"] = 0
    params = SlamParams.from_dict(d)
    slam = SlamSystem(params)

    est = []
    for i, il in enumerate(frames_l):
        T = slam.process_mono(il, time=i * 0.05)
        est.append(T.copy())

    assert slam.initialized, "mono bootstrap never happened"
    assert slam.map.n_3d() > 40

    est_t = np.stack([T[:3, 3] for T in est])
    gt_t = np.stack([T[:3, 3] for T in poses_gt])

    # mono is up-to-scale: align with Umeyama incl. scale
    err, scale = umeyama_scale_ate(est_t, gt_t)
    assert err < 0.08, f"scale-aligned ATE {err:.3f} too high"
    # estimated path should be nonzero and smooth
    path = np.linalg.norm(np.diff(est_t, axis=0), axis=1)
    assert path.sum() > 0.1


def test_mono_no_parallax_no_init():
    """A static camera must never initialize (no parallax)."""
    frames_l, _, _ = syn.render_sequence(n_frames=2)
    d = syn.slam_params_dict()
    d["mono"] = 1
    d["stereo"] = 0
    slam = SlamSystem(SlamParams.from_dict(d))
    for i in range(12):
        slam.process_mono(frames_l[0], time=i * 0.05)
    assert not slam.initialized


def test_mono_pipelined_realtime():
    """Pipelined (force_realtime) mono: stats fetch lags pipeline_depth
    frames, keyframes land on the newest in-flight frame."""
    frames_l, _, poses_gt = syn.render_sequence(n_frames=50, step=0.05)
    d = syn.slam_params_dict()
    d["mono"] = 1
    d["stereo"] = 0
    d["force_realtime"] = 1
    slam = SlamSystem(SlamParams.from_dict(d))
    for i, il in enumerate(frames_l):
        T = slam.process_mono(il, time=i * 0.05)
        assert np.isfinite(T).all()
    slam.flush()
    assert slam.initialized
    assert slam.map.n_3d() > 40
    est_t = np.stack([np.asarray(p)[:3, 3] for p in slam.logger.poses_wc])
    gt_t = np.stack([T[:3, 3] for T in poses_gt])
    n = min(len(est_t), len(gt_t))
    err, _ = umeyama_scale_ate(est_t[-n:], gt_t[-n:])
    assert err < 0.1, f"pipelined mono scale-aligned ATE {err:.3f}"
