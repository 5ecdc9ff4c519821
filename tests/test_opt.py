"""NLLS engine tests: Jacobians vs autodiff, PnP, Schur-LM bundle adjustment
(reference behavior: src/optimizer.cpp, src/ceres_parametrization.cpp)."""

import numpy as np
import jax
import jax.numpy as jnp

from ov2slam_tpu.core import lie
from ov2slam_tpu.core.lie import SE3
from ov2slam_tpu.opt import residuals as res
from ov2slam_tpu.opt import pnp as pnp_mod
from ov2slam_tpu.opt import ba as ba_mod
from ov2slam_tpu.opt.residuals import Calib

CAL = Calib(
    jnp.asarray(450.0), jnp.asarray(450.0), jnp.asarray(376.0), jnp.asarray(240.0)
)


def rnd_pose(rng, tscale=1.0, wscale=0.5):
    w = rng.normal(size=3) * wscale
    t = rng.normal(size=3) * tscale
    return SE3(lie.so3_exp(jnp.asarray(w, jnp.float32)), jnp.asarray(t, jnp.float32))


def cam_scene(rng, n, depth=6.0, spread=3.0):
    Xc = rng.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    Xc[:, 2] = depth + rng.uniform(0, spread, size=n)
    return Xc


# ---------------------------------------------------------------------------
# Jacobian checks vs autodiff
# ---------------------------------------------------------------------------

def _check_pose_jac(factor_r, factor_J, T, atol=2e-3):
    """factor_r(xi) -> residuals given left-mult update xi; factor_J analytic."""
    J_auto = jax.jacfwd(factor_r)(jnp.zeros(6, jnp.float32))
    J_ana = factor_J
    np.testing.assert_allclose(np.asarray(J_ana), np.asarray(J_auto), atol=atol)


def test_reproj_se3_jacobian():
    rng = np.random.default_rng(0)
    T = rnd_pose(rng)
    Xc = cam_scene(rng, 12)
    Xw = np.asarray(lie.se3_apply(lie.se3_inverse(T), jnp.asarray(Xc)))
    obs = np.asarray(res.project(CAL, jnp.asarray(Xc))) + rng.normal(0, 2, (12, 2)).astype(np.float32)
    _, J, _ = res.reproj_se3(CAL, T, jnp.asarray(Xw), jnp.asarray(obs))

    def r_of(xi):
        Tn = lie.se3_boxplus_left(T, xi)
        r, _, _ = res.reproj_se3(CAL, Tn, jnp.asarray(Xw), jnp.asarray(obs))
        return r

    J_auto = jax.jacfwd(r_of)(jnp.zeros(6, jnp.float32))
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_auto), atol=2e-2, rtol=1e-3)


def test_reproj_xyz_jacobians():
    rng = np.random.default_rng(1)
    T = rnd_pose(rng)
    Xc = cam_scene(rng, 8)
    Xw = jnp.asarray(np.asarray(lie.se3_apply(lie.se3_inverse(T), jnp.asarray(Xc))))
    obs = res.project(CAL, jnp.asarray(Xc)) + 1.0
    _, Jp, Jx, _ = res.reproj_xyz(CAL, T, Xw, obs)

    J_auto_x = jax.jacfwd(
        lambda X: res.reproj_xyz(CAL, T, X, obs)[0]
    )(Xw)
    # extract block-diagonal (each obs depends on its own point)
    Jx_auto = np.asarray(J_auto_x)[np.arange(8), :, np.arange(8), :]
    np.testing.assert_allclose(np.asarray(Jx), Jx_auto, atol=2e-2, rtol=1e-3)


def test_reproj_right_jacobians():
    rng = np.random.default_rng(2)
    T = rnd_pose(rng)
    T_rl = SE3(lie.so3_exp(jnp.asarray([0.01, -0.005, 0.002], jnp.float32)),
               jnp.asarray([-0.11, 0.0, 0.0], jnp.float32))
    Xc = cam_scene(rng, 8)
    Xw = jnp.asarray(np.asarray(lie.se3_apply(lie.se3_inverse(T), jnp.asarray(Xc))))
    obs = jnp.zeros((8, 2), jnp.float32)
    _, Jp, Jx, _ = res.reproj_xyz_right(CAL, T_rl, T, Xw, obs)

    def r_of(xi):
        Tn = lie.se3_boxplus_left(T, xi)
        return res.reproj_xyz_right(CAL, T_rl, Tn, Xw, obs)[0]

    J_auto = jax.jacfwd(r_of)(jnp.zeros(6, jnp.float32))
    np.testing.assert_allclose(np.asarray(Jp), np.asarray(J_auto), atol=2e-2, rtol=1e-3)


def test_anch_invdepth_jacobians():
    rng = np.random.default_rng(3)
    T_anchor = rnd_pose(rng)            # anchor world-to-cam
    T_obs = rnd_pose(rng)               # observer world-to-cam
    n = 6
    Xa = cam_scene(rng, n)              # in anchor cam frame
    lam = (1.0 / Xa[:, 2]).astype(np.float32)
    b_a = (Xa / Xa[:, 2:]).astype(np.float32)
    T_wa = lie.se3_inverse(T_anchor)
    obs = jnp.zeros((n, 2), jnp.float32)

    r0, J_obs, J_anc_wa, J_lam, _ = res.reproj_anch_invdepth(
        CAL, T_wa, T_obs, jnp.asarray(b_a), jnp.asarray(lam), obs)

    # lam jacobian via autodiff
    def r_of_lam(l):
        r, *_ = res.reproj_anch_invdepth(CAL, T_wa, T_obs, jnp.asarray(b_a), l, obs)
        return r
    Jl_auto = jax.jacfwd(r_of_lam)(jnp.asarray(lam))
    Jl_diag = np.asarray(Jl_auto)[np.arange(n), :, np.arange(n)]
    np.testing.assert_allclose(np.asarray(J_lam)[..., 0], Jl_diag, atol=2e-2, rtol=1e-3)

    # observer pose jacobian
    def r_of_obs(xi):
        Tn = lie.se3_boxplus_left(T_obs, xi)
        r, *_ = res.reproj_anch_invdepth(CAL, T_wa, Tn, jnp.asarray(b_a), jnp.asarray(lam), obs)
        return r
    Jo_auto = jax.jacfwd(r_of_obs)(jnp.zeros(6, jnp.float32))
    np.testing.assert_allclose(np.asarray(J_obs), np.asarray(Jo_auto), atol=2e-2, rtol=1e-3)


def test_relpose_factor():
    rng = np.random.default_rng(4)
    Ta = rnd_pose(rng)
    Tb = rnd_pose(rng)
    meas = lie.se3_compose(Ta, lie.se3_inverse(Tb))
    r = res.relpose_residual(Ta, Tb, meas)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-5)
    r2, Ja, Jb = res.relpose_jacobians(Ta, Tb, meas)
    assert np.asarray(Ja).shape == (6, 6)
    # perturb and check first-order prediction
    eps = (rng.normal(size=6) * 1e-3).astype(np.float32)
    Ta2 = lie.se3_boxplus_left(Ta, jnp.asarray(eps))
    r3 = res.relpose_residual(Ta2, Tb, meas)
    np.testing.assert_allclose(np.asarray(r3), np.asarray(Ja) @ eps, atol=1e-5)


# ---------------------------------------------------------------------------
# PnP
# ---------------------------------------------------------------------------

def test_pnp_converges_with_outliers():
    rng = np.random.default_rng(5)
    T_gt = rnd_pose(rng, wscale=0.8)
    Xc = cam_scene(rng, 120)
    Xw = np.asarray(lie.se3_apply(lie.se3_inverse(T_gt), jnp.asarray(Xc)))
    obs = np.array(res.project(CAL, jnp.asarray(Xc)))
    obs += rng.normal(0, 0.4, obs.shape)
    out = rng.choice(120, 25, replace=False)
    obs[out] += rng.uniform(15, 60, (25, 2)) * np.sign(rng.normal(size=(25, 2)))

    # init: perturbed pose
    T0 = lie.se3_boxplus_left(T_gt, jnp.asarray(
        (rng.normal(size=6) * np.array([0.05]*3 + [0.02]*3)).astype(np.float32)))
    out_res = pnp_mod.pnp_robust_then_l2(
        CAL, T0, jnp.asarray(Xw.astype(np.float32)), jnp.asarray(obs.astype(np.float32)),
        jnp.ones(120, bool))
    dR = np.linalg.norm(np.asarray(lie.so3_log(
        jnp.asarray(np.asarray(out_res.T_cw.R) @ np.asarray(T_gt.R).T))))
    dt = np.linalg.norm(np.asarray(out_res.T_cw.t) - np.asarray(T_gt.t))
    assert dR < 2e-3
    assert dt < 1e-2
    is_out = np.zeros(120, bool)
    is_out[out] = True
    inl = np.asarray(out_res.inliers)
    assert inl[~is_out].mean() > 0.9
    assert inl[is_out].mean() < 0.1


# ---------------------------------------------------------------------------
# bundle adjustment
# ---------------------------------------------------------------------------

def make_ba_problem(rng, n_kf=6, n_lm=80, invdepth=True, stereo=True,
                    noise_px=0.5, pose_noise=0.02, lm_noise=0.05):
    """Synthetic windowed BA problem with known ground truth."""
    F, L = n_kf + 2, n_lm + 8           # padded capacities
    T_rl = SE3(lie.so3_exp(jnp.asarray([0.0, 0.0, 0.0], jnp.float32)),
               jnp.asarray([-0.11, 0.0, 0.0], jnp.float32))

    # ground-truth trajectory: cameras along x, looking at scene at z~6
    poses_gt = []
    for i in range(n_kf):
        w = rng.normal(size=3).astype(np.float32) * 0.01
        t = np.array([-0.3 * i, 0, 0], np.float32) + rng.normal(size=3).astype(np.float32) * 0.01
        poses_gt.append(SE3(lie.so3_exp(jnp.asarray(w)), jnp.asarray(t)))

    Xw_gt = rng.uniform(-4, 4, size=(n_lm, 3)).astype(np.float32)
    Xw_gt[:, 2] = 6.0 + rng.uniform(0, 4, size=n_lm)

    obs_kf, obs_lm, obs_px, obs_right = [], [], [], []
    anchor = np.zeros(L, np.int32)
    bearing = np.zeros((L, 3), np.float32)
    bearing[:, 2] = 1.0
    lam_init = np.ones(L, np.float32)
    first_seen = {}
    for j in range(n_lm):
        for i in range(n_kf):
            Xc = np.asarray(lie.se3_apply(poses_gt[i], jnp.asarray(Xw_gt[j])))
            if Xc[2] < 0.5:
                continue
            px = np.asarray(res.project(CAL, jnp.asarray(Xc)))
            if not (0 <= px[0] < 752 and 0 <= px[1] < 480):
                continue
            if j not in first_seen:
                first_seen[j] = i
                anchor[j] = i
                b = Xc / Xc[2]
                bearing[j] = b
                lam_init[j] = 1.0 / Xc[2]
                # anchor's own left-cam obs has zero residual -> skip (the
                # reference also only adds non-anchor observations)
            else:
                obs_kf.append(i)
                obs_lm.append(j)
                obs_px.append(px + rng.normal(0, noise_px, 2))
                obs_right.append(False)
            if stereo:
                Xr = np.asarray(lie.se3_apply(T_rl, jnp.asarray(Xc)))
                if Xr[2] > 0.5:
                    pxr = np.asarray(res.project(CAL, jnp.asarray(Xr)))
                    if 0 <= pxr[0] < 752 and 0 <= pxr[1] < 480:
                        obs_kf.append(i)
                        obs_lm.append(j)
                        obs_px.append(pxr + rng.normal(0, noise_px, 2))
                        obs_right.append(True)

    O = len(obs_kf) + 32
    pad = O - len(obs_kf)
    obs_kf = np.asarray(obs_kf + [0] * pad, np.int32)
    obs_lm = np.asarray(obs_lm + [0] * pad, np.int32)
    obs_px = np.asarray(obs_px + [[0, 0]] * pad, np.float32)
    obs_right = np.asarray(obs_right + [False] * pad, bool)
    obs_valid = np.asarray([True] * (O - pad) + [False] * pad, bool)

    # noisy initial state: first two poses fixed at gt (gauge)
    R0 = np.zeros((F, 3, 3), np.float32)
    t0 = np.zeros((F, 3), np.float32)
    pose_opt = np.zeros(F, bool)
    for i in range(n_kf):
        T = poses_gt[i]
        if i >= 2:
            xi = rng.normal(size=6).astype(np.float32) * pose_noise
            T = lie.se3_boxplus_left(T, jnp.asarray(xi))
            pose_opt[i] = True
        R0[i] = np.asarray(T.R)
        t0[i] = np.asarray(T.t)
    R0[n_kf:] = np.eye(3)

    lam_noisy = lam_init * (1 + rng.normal(size=L).astype(np.float32) * lm_noise)
    Xw0 = np.zeros((L, 3), np.float32)
    Xw0[:n_lm] = Xw_gt * (1 + rng.normal(size=(n_lm, 3)).astype(np.float32) * lm_noise)
    lm_valid = np.zeros(L, bool)
    lm_valid[:n_lm] = True

    prob = ba_mod.BAProblem(
        R=jnp.asarray(R0), t=jnp.asarray(t0), pose_opt=jnp.asarray(pose_opt),
        Xw=jnp.asarray(Xw0), anchor=jnp.asarray(anchor),
        bearing=jnp.asarray(bearing), lam=jnp.asarray(lam_noisy),
        lm_valid=jnp.asarray(lm_valid),
        obs_kf=jnp.asarray(obs_kf), obs_lm=jnp.asarray(obs_lm),
        obs_px=jnp.asarray(obs_px), obs_right=jnp.asarray(obs_right),
        obs_valid=jnp.asarray(obs_valid),
        calib_l=CAL, calib_r=CAL, T_rl=T_rl,
    )
    return prob, poses_gt, Xw_gt, n_kf, n_lm


def _pose_err(R, t, poses_gt, n_kf):
    errs = []
    for i in range(n_kf):
        dR = np.asarray(lie.so3_log(jnp.asarray(
            np.asarray(R[i]) @ np.asarray(poses_gt[i].R).T)))
        dt = np.asarray(t[i]) - np.asarray(poses_gt[i].t)
        errs.append(np.linalg.norm(np.concatenate([dR, dt])))
    return np.asarray(errs)


def test_ba_invdepth_converges():
    rng = np.random.default_rng(7)
    prob, poses_gt, Xw_gt, n_kf, n_lm = make_ba_problem(rng, invdepth=True)
    out = ba_mod.solve_ba(prob, invdepth=True, max_iters=12)
    assert float(out.cost) < float(out.cost0) * 0.1
    errs = _pose_err(out.R, out.t, poses_gt, n_kf)
    assert errs.max() < 1e-2
    lm_err = np.linalg.norm(np.asarray(out.Xw)[:n_lm] - Xw_gt, axis=-1)
    assert np.median(lm_err) < 0.05


def test_ba_xyz_converges():
    rng = np.random.default_rng(8)
    prob, poses_gt, Xw_gt, n_kf, n_lm = make_ba_problem(rng, invdepth=False)
    out = ba_mod.solve_ba(prob, invdepth=False, max_iters=12)
    assert float(out.cost) < float(out.cost0) * 0.1
    errs = _pose_err(out.R, out.t, poses_gt, n_kf)
    assert errs.max() < 2e-2


def test_ba_rejects_outlier_observations():
    rng = np.random.default_rng(9)
    prob, poses_gt, Xw_gt, n_kf, n_lm = make_ba_problem(rng, noise_px=0.3)
    # corrupt 10% of observations
    obs_px = np.array(prob.obs_px)
    nobs = int(np.asarray(prob.obs_valid).sum())
    bad = rng.choice(nobs, nobs // 10, replace=False)
    obs_px[bad] += rng.uniform(20, 60, (len(bad), 2))
    prob = prob._replace(obs_px=jnp.asarray(obs_px))
    out = ba_mod.solve_ba(prob, invdepth=True, max_iters=8)
    inl = np.asarray(out.obs_inlier)
    is_bad = np.zeros(len(inl), bool)
    is_bad[bad] = True
    assert inl[is_bad].mean() < 0.1
    assert inl[~is_bad & np.asarray(prob.obs_valid)].mean() > 0.9
    errs = _pose_err(out.R, out.t, poses_gt, n_kf)
    assert errs.max() < 1e-2


def test_ba_structure_only():
    rng = np.random.default_rng(10)
    prob, poses_gt, Xw_gt, n_kf, n_lm = make_ba_problem(
        rng, pose_noise=0.0, lm_noise=0.1)
    # all poses constant (at gt), only landmarks move
    prob = prob._replace(pose_opt=jnp.zeros_like(prob.pose_opt))
    out = ba_mod.solve_ba(prob, invdepth=True, max_iters=8)
    lm_err = np.linalg.norm(np.asarray(out.Xw)[:n_lm] - Xw_gt, axis=-1)
    assert np.median(lm_err) < 0.03


def test_ba_gauge_poses_fixed():
    rng = np.random.default_rng(11)
    prob, poses_gt, _, n_kf, _ = make_ba_problem(rng)
    out = ba_mod.solve_ba(prob, invdepth=True, max_iters=5)
    # the two gauge poses must be bit-identical to their input
    np.testing.assert_array_equal(np.asarray(out.R[:2]), np.asarray(prob.R[:2]))
    np.testing.assert_array_equal(np.asarray(out.t[:2]), np.asarray(prob.t[:2]))


def test_ba_dogleg_converges_like_lm():
    """use_dogleg parity (optimizer.cpp:448-456): the Powell dogleg trust
    region must reach the same basin as LM on both landmark
    parameterizations."""
    for seed, invdepth in ((7, True), (8, False)):
        rng = np.random.default_rng(seed)
        prob, poses_gt, Xw_gt, n_kf, n_lm = make_ba_problem(
            rng, invdepth=invdepth)
        out = ba_mod.solve_ba(prob, invdepth=invdepth, max_iters=12,
                              method="dogleg")
        assert float(out.cost) < float(out.cost0) * 0.1
        errs = _pose_err(out.R, out.t, poses_gt, n_kf)
        assert errs.max() < 2e-2
        lm = ba_mod.solve_ba(prob, invdepth=invdepth, max_iters=12)
        assert float(out.cost) < 2.0 * float(lm.cost) + 1e-6
