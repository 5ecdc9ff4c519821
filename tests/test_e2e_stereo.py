"""End-to-end stereo VO on a rendered synthetic sequence: the milestone-8
integration test of SURVEY §7 (reader -> pyramid -> KLT -> PnP -> KF ->
stereo triangulation -> local BA -> TUM trajectory)."""

import numpy as np
import pytest

from ov2slam_tpu.config import SlamParams
from ov2slam_tpu.io.trajectories import ate_rmse
from ov2slam_tpu.slam.manager import SlamSystem

import synthetic as syn


@pytest.fixture(scope="module")
def sequence():
    return syn.render_sequence(n_frames=40, step=0.05)


def test_stereo_vo_tracks_sequence(sequence, tmp_path):
    frames_l, frames_r, poses_gt = sequence
    params = SlamParams.from_dict(syn.slam_params_dict())
    slam = SlamSystem(params)

    est = []
    for i, (il, ir) in enumerate(zip(frames_l, frames_r)):
        T_wc = slam.process_stereo(il, ir, time=i * 0.05)
        est.append(T_wc.copy())

    assert slam.initialized
    assert len(slam.map.keyframes) >= 2
    assert slam.map.n_3d() > 50

    est_t = np.stack([T[:3, 3] for T in est])
    gt_t = np.stack([T[:3, 3] for T in poses_gt])

    # translation scale must be metric (stereo baseline): total path length
    path_est = np.linalg.norm(np.diff(est_t, axis=0), axis=1).sum()
    path_gt = np.linalg.norm(np.diff(gt_t, axis=0), axis=1).sum()
    assert abs(path_est - path_gt) / path_gt < 0.15

    err = ate_rmse(est_t, gt_t)
    assert err < 0.05, f"ATE {err:.4f} m too high"

    # trajectory outputs (reference-format files)
    slam.write_results(str(tmp_path))
    tum = np.loadtxt(tmp_path / "ov2slam_traj.txt")
    assert tum.shape == (len(frames_l), 8)
    kitti = np.loadtxt(tmp_path / "ov2slam_traj_kitti.txt")
    assert kitti.shape == (len(frames_l), 12)


def test_stereo_vo_keyframes_have_stereo_obs(sequence):
    frames_l, frames_r, poses_gt = sequence
    params = SlamParams.from_dict(syn.slam_params_dict())
    slam = SlamSystem(params)
    for i in range(10):
        slam.process_stereo(frames_l[i], frames_r[i], time=i * 0.05)
    any_right = any(
        rec.has_right.any() for rec in slam.map.keyframes.values())
    assert any_right
    # covisibility graph connects consecutive keyframes
    kfs = sorted(slam.map.keyframes)
    if len(kfs) >= 2:
        assert slam.map.covis[kfs[-1]].get(kfs[-2], 0) > 0


def test_determinism(sequence):
    """Same inputs + same seed => bit-identical trajectory. (The reference is
    nondeterministic across runs — its bench protocol repeats 5x because of
    it, SURVEY §4; the rebuild is deterministic by construction.)"""
    frames_l, frames_r, _ = sequence
    params = SlamParams.from_dict(syn.slam_params_dict())
    outs = []
    for _ in range(2):
        slam = SlamSystem(params)
        est = []
        for i in range(15):
            T = slam.process_stereo(frames_l[i], frames_r[i], time=i * 0.05)
            est.append(T.copy())
        outs.append(np.stack(est))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_force_realtime_pipelined(sequence, tmp_path):
    """force_realtime pipelines the blocking stats read behind the next
    frame's dispatch; the logged trajectory must stay accurate."""
    frames_l, frames_r, poses_gt = sequence
    d = syn.slam_params_dict()
    d["force_realtime"] = 1
    slam = SlamSystem(SlamParams.from_dict(d))
    for i, (il, ir) in enumerate(zip(frames_l, frames_r)):
        slam.process_stereo(il, ir, time=i * 0.05)
    slam.flush()
    assert len(slam.logger.poses_wc) == len(frames_l)
    est_t = np.stack([T[:3, 3] for T in slam.logger.poses_wc])
    gt_t = np.stack([T[:3, 3] for T in poses_gt])
    err = ate_rmse(est_t, gt_t)
    assert err < 0.05, f"pipelined ATE {err:.4f}"


def test_inflight_frames_get_late_corrections():
    """A BA / loop-closure pose correction that lands while frames are in
    flight (force_realtime pipelining) must reach those frames' logged
    poses. World-side right factors commute with the camera-side tracking
    chain (T_rel @ (T_cw @ dC) = (T_rel @ T_cw) @ dC), so finalize can fold
    corr_at_dispatch^-1 @ corr_now into the stats pose exactly
    (manager._late_corrected). The reference avoids the problem by blocking:
    its front end consumes corrections before the next frame starts
    (visual_front_end.cpp / map_manager mutex)."""
    d = syn.slam_params_dict()
    d["force_realtime"] = 1
    slam = SlamSystem(SlamParams.from_dict(d))

    rng = np.random.default_rng(3)
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = rng.normal(0, 1, 3)

    corr_at_dispatch = slam._corr_cw
    # no correction landed since dispatch -> identity (and same object)
    np.testing.assert_array_equal(
        slam._late_corrected(T, corr_at_dispatch), T)

    # a loop-closure-sized correction lands while the frame is in flight
    T_old = np.eye(4)
    T_new = np.eye(4)
    T_new[:3, 3] = [0.3, -0.2, 0.1]
    dT = np.linalg.inv(T_old) @ T_new
    slam._apply_pose_correction(T_old, T_new)
    np.testing.assert_allclose(slam._corr_cw, dT, atol=1e-12)

    out = slam._late_corrected(T, corr_at_dispatch)
    expected = T.astype(np.float64) @ dT
    np.testing.assert_allclose(out, expected, atol=1e-6)

    # two stacked corrections compose in order
    T_new2 = np.eye(4)
    T_new2[:3, :3] = np.array(
        [[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float64)
    slam._apply_pose_correction(T_old, T_new2)
    out2 = slam._late_corrected(T, corr_at_dispatch)
    np.testing.assert_allclose(
        out2, T.astype(np.float64) @ dT @ T_new2, atol=1e-6)

    # a frame dispatched AFTER all corrections is untouched
    np.testing.assert_array_equal(slam._late_corrected(T, slam._corr_cw), T)
    # reset clears the accumulator
    slam.reset()
    np.testing.assert_array_equal(slam._corr_cw, np.eye(4))


def test_chunked_tracking(sequence):
    """process_stereo_chunk (lax.scan over frames) matches per-frame
    accuracy on the synthetic sequence."""
    frames_l, frames_r, poses_gt = sequence
    params = SlamParams.from_dict(syn.slam_params_dict())
    slam = SlamSystem(params)
    n = len(frames_l)
    i = 0
    while i < n:
        chunk = [(frames_l[j], frames_r[j], j * 0.05)
                 for j in range(i, min(i + 4, n))]
        slam.process_stereo_chunk(chunk)
        i += len(chunk)
    assert len(slam.logger.poses_wc) == n
    est_t = np.stack([T[:3, 3] for T in slam.logger.poses_wc])
    gt_t = np.stack([T[:3, 3] for T in poses_gt])
    err = ate_rmse(est_t, gt_t)
    assert err < 0.06, f"chunked ATE {err:.4f}"


def test_rotation_heavy_tracking():
    """Strong yaw (about 1 deg/frame) with little translation — stresses the
    rotation-compensated parallax logic and prior-seeded tracking."""
    tex = syn.make_texture(31, size=6000)
    tex2 = syn.make_texture(131)
    poses = []
    for i in range(36):
        yaw = 0.018 * i
        c, s = np.cos(yaw), np.sin(yaw)
        T = np.eye(4)
        T[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        T[:3, 3] = [0.01 * i, 0, 0]
        poses.append(T)
    T_rl = np.eye(4)
    T_rl[0, 3] = -syn.BASELINE
    fl, fr = [], []
    for T_wc in poses:
        T_cw = np.linalg.inv(T_wc)
        fl.append(syn.render_view(tex, tex2, T_cw, plane_z=8.0, plane2_z=5.0,
                                  plane2_hw=3.0))
        fr.append(syn.render_view(tex, tex2, T_rl @ T_cw, plane_z=8.0,
                                  plane2_z=5.0, plane2_hw=3.0))
    slam = SlamSystem(SlamParams.from_dict(syn.slam_params_dict()))
    for i in range(36):
        slam.process_stereo(fl[i], fr[i], time=i * 0.05)
    est_t = np.stack([T[:3, 3] for T in slam.logger.poses_wc])
    gt_t = np.stack([T[:3, 3] for T in poses])
    err = ate_rmse(est_t, gt_t)
    assert err < 0.05, f"rotation-heavy ATE {err:.4f}"
    # yaw must be tracked: compare final rotation angle
    from ov2slam_tpu.core import lie as lie_mod
    import jax.numpy as jnp
    R_est = slam.logger.poses_wc[-1][:3, :3]
    R_gt = poses[-1][:3, :3]
    dw = np.asarray(lie_mod.so3_log(jnp.asarray(
        (R_est @ R_gt.T).astype(np.float32))))
    assert np.linalg.norm(dw) < 0.02


def test_windowed_full_ba_refines_all_keyframes(sequence):
    """fullBA beyond one dense window (optimizer.cpp:1674-2333): overlapping
    window sweeps must refine every keyframe, recovering from an injected
    perturbation of poses + landmarks."""
    frames_l, frames_r, poses_gt = sequence
    params = SlamParams.from_dict(syn.slam_params_dict())
    slam = SlamSystem(params)
    for i, (il, ir) in enumerate(zip(frames_l, frames_r)):
        slam.process_stereo(il, ir, time=i * 0.05)
    slam.flush()
    m = slam.map
    kfs = sorted(m.keyframes)
    assert len(kfs) >= 6

    gt_by_time = {round(i * 0.05, 6): poses_gt[i] for i in range(len(poses_gt))}

    def kf_ate():
        errs = []
        for k in kfs:
            rec = m.keyframes[k]
            gt = gt_by_time.get(round(rec.time, 6))
            if gt is None:
                continue
            t_wc = np.linalg.inv(rec.T_cw.astype(np.float64))[:3, 3]
            errs.append(np.linalg.norm(t_wc - gt[:3, 3]))
        return float(np.mean(errs))

    # perturb every KF pose except the first two (gauge anchors stay)
    rng = np.random.default_rng(7)
    for k in kfs[2:]:
        rec = m.keyframes[k]
        T = rec.T_cw.astype(np.float64)
        T[:3, 3] += rng.normal(0, 0.01, 3)
        rec.T_cw = T.astype(np.float32)
    m._device_dirty = True
    ate_pert = kf_ate()

    # small max_kfs forces >= 3 overlapping windows over the trajectory
    slam.estimator.full_ba(m, max_kfs=8, max_iters=8)
    ate_after = kf_ate()
    assert np.isfinite(ate_after)
    assert ate_after < ate_pert * 0.8, (ate_pert, ate_after)


def test_stereo_vo_kf_to_frame_tracking(sequence):
    """btrack_keyframetoframe (visual_front_end.cpp:278-442): KLT templates
    come from the last keyframe image at the keypoints' KF positions —
    drift-free within a keyframe's lifetime."""
    frames_l, frames_r, poses_gt = sequence
    d = syn.slam_params_dict()
    d["btrack_keyframetoframe"] = 1
    slam = SlamSystem(SlamParams.from_dict(d))
    est = []
    for i, (il, ir) in enumerate(zip(frames_l, frames_r)):
        T_wc = slam.process_stereo(il, ir, time=i * 0.05)
        est.append(T_wc.copy())
    assert slam.initialized
    est_t = np.stack([T[:3, 3] for T in est])
    gt_t = np.stack([T[:3, 3] for T in poses_gt])
    err = ate_rmse(est_t, gt_t)
    assert err < 0.05, f"KF-to-frame ATE {err:.4f} m too high"
