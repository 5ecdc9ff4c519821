"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ov2slam_tpu.opt import ba as ba_mod
from ov2slam_tpu.parallel import sharded
from ov2slam_tpu.core import lie

from test_opt import make_ba_problem, _pose_err


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_ba_matches_single_device():
    rng = np.random.default_rng(21)
    prob, poses_gt, Xw_gt, n_kf, n_lm = make_ba_problem(rng)
    # pad observation count to a multiple of 8
    O = prob.obs_kf.shape[0]
    O8 = ((O + 7) // 8) * 8
    pad = O8 - O

    def padv(x, fill=0):
        if x.ndim == 1:
            return jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
        return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])

    prob = prob._replace(
        obs_kf=padv(prob.obs_kf), obs_lm=padv(prob.obs_lm),
        obs_px=padv(prob.obs_px), obs_right=padv(prob.obs_right, False),
        obs_valid=padv(prob.obs_valid, False))

    mesh = sharded.make_mesh(8)
    res = sharded.solve_ba_sharded(prob, mesh, invdepth=True, max_iters=6)
    assert float(res.cost) < float(res.cost0) * 0.2
    errs = _pose_err(np.asarray(res.R), np.asarray(res.t), poses_gt, n_kf)
    assert errs.max() < 1e-2

    # full parity vs the single-chip solver: identical algorithm, psum'd
    # normal equations -> results must agree to float tolerance
    single = ba_mod.solve_ba(prob, invdepth=True, max_iters=6)
    np.testing.assert_allclose(
        np.asarray(res.t), np.asarray(single.t), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(res.R), np.asarray(single.R), atol=1e-4)
    assert (np.asarray(res.obs_inlier) == np.asarray(single.obs_inlier)).mean() > 0.99


def test_sharded_ba_l2_refine_matches_single_device():
    rng = np.random.default_rng(33)
    prob, poses_gt, Xw_gt, n_kf, n_lm = make_ba_problem(rng)
    O = prob.obs_kf.shape[0]
    O8 = ((O + 7) // 8) * 8
    pad = O8 - O

    def padv(x, fill=0):
        if x.ndim == 1:
            return jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
        return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])

    prob = prob._replace(
        obs_kf=padv(prob.obs_kf), obs_lm=padv(prob.obs_lm),
        obs_px=padv(prob.obs_px), obs_right=padv(prob.obs_right, False),
        obs_valid=padv(prob.obs_valid, False))

    mesh = sharded.make_mesh(8)
    res = sharded.solve_ba_sharded(
        prob, mesh, invdepth=True, max_iters=5, l2_refine=True, l2_iters=3)
    single = ba_mod.solve_ba(
        prob, invdepth=True, max_iters=5, l2_refine=True, l2_iters=3)
    np.testing.assert_allclose(
        np.asarray(res.t), np.asarray(single.t), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(res.Xw), np.asarray(single.Xw), atol=1e-3)


def test_e2e_slam_with_sharded_ba():
    """The WHOLE SlamSystem with n_devices=8: every local/loose/full BA
    solve routes through the observation-sharded Schur-LM on the virtual
    CPU mesh, and the trajectory must match the single-device run."""
    import synthetic as syn
    from ov2slam_tpu.config import SlamParams
    from ov2slam_tpu.slam.manager import SlamSystem

    frames_l, frames_r, poses_gt = syn.render_sequence(n_frames=25, step=0.05)

    def run(n_devices):
        d = syn.slam_params_dict()
        d["n_devices"] = n_devices
        slam = SlamSystem(SlamParams.from_dict(d))
        if n_devices > 1:
            assert slam.mesh is not None
            assert slam.estimator.mesh is slam.mesh
        est = []
        for i, (il, ir) in enumerate(zip(frames_l, frames_r)):
            T_wc = slam.process_stereo(il, ir, time=i * 0.05)
            est.append(T_wc[:3, 3].copy())
        assert slam.initialized
        return np.stack(est), slam.map.n_3d()

    t_single, n3d_single = run(0)
    t_shard, n3d_shard = run(8)
    # same algorithm, psum'd normal equations: trajectories agree to
    # float accumulation-order tolerance
    assert np.abs(t_shard - t_single).max() < 2e-3, (
        f"sharded vs single-device trajectory diverged: "
        f"{np.abs(t_shard - t_single).max():.5f} m")
    assert abs(n3d_shard - n3d_single) < 0.1 * max(n3d_single, 1)


def test_sharded_essential_ransac():
    rng = np.random.default_rng(22)
    n = 160
    Xc = rng.uniform(-3, 3, size=(n, 3)).astype(np.float32)
    Xc[:, 2] = 6.0 + rng.uniform(0, 3, n)
    w = rng.normal(size=3).astype(np.float32) * 0.2
    t = rng.normal(size=3).astype(np.float32)
    T_ab = lie.SE3(lie.so3_exp(jnp.asarray(w)), jnp.asarray(t))
    Xb = np.asarray(lie.se3_apply(lie.se3_inverse(T_ab), jnp.asarray(Xc)))
    bv_a = (Xc / np.linalg.norm(Xc, axis=1, keepdims=True)).astype(np.float32)
    bv_b = (Xb / np.linalg.norm(Xb, axis=1, keepdims=True)).astype(np.float32)
    out_idx = rng.choice(n, 40, replace=False)
    bv_b[out_idx] = bv_b[rng.permutation(out_idx)]

    mesh = sharded.make_mesh(8)
    res = sharded.essential_ransac_sharded(
        jnp.asarray(bv_a), jnp.asarray(bv_b), jnp.ones(n, bool),
        jax.random.PRNGKey(3), err_th=3.0 / 450.0, mesh=mesh,
        n_hyps_per_device=64)
    assert bool(res.success)
    inl = np.asarray(res.inliers)
    is_out = np.zeros(n, bool)
    is_out[out_idx] = True
    assert inl[~is_out].mean() > 0.8
