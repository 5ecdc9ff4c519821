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
    R, t, Xw, lam, cost0, cost = sharded.solve_ba_sharded(
        prob, mesh, invdepth=True, max_iters=6)
    assert float(cost) < float(cost0) * 0.2
    errs = _pose_err(np.asarray(R), np.asarray(t), poses_gt, n_kf)
    assert errs.max() < 1e-2


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
