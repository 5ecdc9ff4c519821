"""Multi-chip sharding: data-parallel BA and hypothesis-parallel RANSAC.

The reference is single-node multithreaded (no distributed layer; SURVEY
§2.3). The TPU-native equivalents added here scale the two dominant batched
workloads over a `jax.sharding.Mesh` via `shard_map` + XLA collectives:

* **solve_ba_sharded** — residual/observation-parallel bundle adjustment:
  each device builds normal-equation contributions from its observation
  shard, `psum` over ICI accumulates (Hpp, bp, Hll, bl, W), and every device
  runs the identical Schur solve on the reduced camera system (replicated —
  it is tiny). This is the "training step" of the SLAM system.
* **essential_ransac_sharded** — RANSAC hypotheses sharded across devices;
  inlier counts are argmax-reduced globally.

Both run unchanged on a virtual CPU mesh (tests) and a real TPU slice.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ov2slam_tpu.core import lie
from ov2slam_tpu.core.lie import SE3
from ov2slam_tpu.opt import ba as ba_mod
from ov2slam_tpu.opt import residuals as res
from ov2slam_tpu.ops import mvg


def make_mesh(n_devices: int = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    if len(devs) < n:
        raise ValueError(
            f"make_mesh({n}) but only {len(devs)} devices are available "
            f"({devs[0].platform}); for a virtual CPU mesh set "
            "jax.config.update('jax_num_cpu_devices', n) before backend init")
    return Mesh(np.asarray(devs[:n]), (axis,))


def _shard_obs(p: ba_mod.BAProblem, mesh: Mesh, axis: str) -> ba_mod.BAProblem:
    """Place observation arrays sharded over the mesh, the rest replicated."""
    sh_obs = NamedSharding(mesh, P(axis))
    sh_obs2 = NamedSharding(mesh, P(axis, None))
    rep = NamedSharding(mesh, P())

    def put(x, s):
        return jax.device_put(x, s)

    return p._replace(
        R=put(p.R, rep), t=put(p.t, rep), pose_opt=put(p.pose_opt, rep),
        Xw=put(p.Xw, rep), anchor=put(p.anchor, rep),
        bearing=put(p.bearing, rep), lam=put(p.lam, rep),
        lm_valid=put(p.lm_valid, rep),
        obs_kf=put(p.obs_kf, sh_obs), obs_lm=put(p.obs_lm, sh_obs),
        obs_px=put(p.obs_px, sh_obs2), obs_right=put(p.obs_right, sh_obs),
        obs_valid=put(p.obs_valid, sh_obs),
    )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis", "invdepth", "max_iters", "robust",
                     "optimize_landmarks", "l2_refine", "l2_iters", "method"),
)
def _solve_ba_sharded_impl(
    p: ba_mod.BAProblem,
    mesh: Mesh,
    axis: str,
    invdepth: bool,
    max_iters: int,
    robust: bool,
    th2_mono: float,
    th2_stereo: float,
    optimize_landmarks: bool,
    l2_refine: bool,
    l2_iters: int,
    method: str = "lm",
):
    obs_spec = ba_mod.BAProblem(
        R=P(), t=P(), pose_opt=P(), Xw=P(), anchor=P(), bearing=P(), lam=P(),
        lm_valid=P(),
        obs_kf=P(axis), obs_lm=P(axis), obs_px=P(axis, None),
        obs_right=P(axis), obs_valid=P(axis),
        calib_l=res.Calib(P(), P(), P(), P()),
        calib_r=res.Calib(P(), P(), P(), P()),
        T_rl=SE3(P(), P()),
    )
    out_spec = ba_mod.BAResult(
        R=P(), t=P(), Xw=P(), lam=P(), obs_inlier=P(axis),
        cost0=P(), cost=P(), n_iters=P())

    def body(p_sh: ba_mod.BAProblem):
        """Every device runs the FULL single-chip LM solver (_lm_run) on its
        observation shard; normal equations / costs psum over the mesh, so
        the trust-region accept/reject, chi2 sweep, and robust->L2 re-solve
        are bit-for-bit the single-chip algorithm."""
        out = ba_mod._lm_run(
            p_sh, p_sh.R, p_sh.t, p_sh.Xw, p_sh.lam, jnp.asarray(robust),
            invdepth, max_iters, th2_mono, th2_stereo, optimize_landmarks,
            1e-4, psum_axis=axis, method=method)
        if l2_refine:
            # mirror ba_mod.solve_ba's robust->L2 composition
            p2 = p_sh._replace(obs_valid=out.obs_inlier)
            out2 = ba_mod._lm_run(
                p2, out.R, out.t, out.Xw, out.lam, jnp.asarray(False),
                invdepth, l2_iters, th2_mono, th2_stereo, optimize_landmarks,
                1e-4, psum_axis=axis)
            out = ba_mod.BAResult(
                out2.R, out2.t, out2.Xw, out2.lam,
                out2.obs_inlier & out.obs_inlier,
                out.cost0, out2.cost, out.n_iters + out2.n_iters)
        return out

    fn = jax.shard_map(
        body, mesh=mesh, in_specs=(obs_spec,), out_specs=out_spec)
    return fn(p)


def solve_ba_sharded(
    p: ba_mod.BAProblem,
    mesh: Mesh,
    axis: str = "dp",
    invdepth: bool = True,
    max_iters: int = 5,
    robust: bool = True,
    th2_mono: float = 5.9915,
    th2_stereo: float = 7.8147,
    optimize_landmarks: bool = True,
    l2_refine: bool = False,
    l2_iters: int = 5,
    method: str = "lm",
) -> ba_mod.BAResult:
    """Observation-sharded Schur-LM bundle adjustment over a device mesh —
    the same algorithm as opt.ba.solve_ba (LM accept/reject, Huber IRLS,
    chi2/depth outlier sweep, optional robust->L2 re-solve), with the
    normal-equation build distributed over observation shards and psum'd.

    Observation count must divide the mesh size (pad with obs_valid=False)."""
    p = _shard_obs(p, mesh, axis)
    return _solve_ba_sharded_impl(
        p, mesh, axis, invdepth, max_iters, robust, th2_mono, th2_stereo,
        optimize_landmarks, l2_refine, l2_iters, method)


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "n_hyps"))
def _essential_ransac_sharded_impl(bv_a, bv_b, valid, key, err_th, mesh, axis, n_hyps):
    n_dev = mesh.shape[axis]
    keys = jax.random.split(key, n_dev)

    def body(k):
        k = k[0]
        r = mvg.essential_ransac(bv_a, bv_b, valid, k, err_th, n_hyps=n_hyps)
        # pick the globally best model by inlier count
        counts = jax.lax.all_gather(r.n_inliers, axis)           # (n_dev,)
        models = jax.lax.all_gather(r.model, axis)               # (n_dev, 3, 3)
        inls = jax.lax.all_gather(r.inliers, axis)
        best = jnp.argmax(counts)
        return models[best], inls[best], counts[best], counts[best] >= 8

    fn = jax.shard_map(
        body, mesh=mesh, in_specs=(P(axis),),
        out_specs=(P(), P(), P(), P()), check_vma=False)
    return fn(keys)


def essential_ransac_sharded(
    bv_a, bv_b, valid, key, err_th, mesh: Mesh, axis: str = "dp",
    n_hyps_per_device: int = 256,
) -> mvg.RansacResult:
    """Hypothesis-parallel essential RANSAC: each device draws its own
    hypothesis batch; the best model is argmax-reduced over the mesh."""
    rep = NamedSharding(mesh, P())
    bv_a = jax.device_put(bv_a, rep)
    bv_b = jax.device_put(bv_b, rep)
    valid = jax.device_put(valid, rep)
    m, i, c, s = _essential_ransac_sharded_impl(
        bv_a, bv_b, valid, key, err_th, mesh, axis, n_hyps_per_device)
    return mvg.RansacResult(m, i, c, s)
