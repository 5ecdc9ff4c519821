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
    static_argnames=("mesh", "axis", "invdepth", "max_iters"),
)
def _solve_ba_sharded_impl(
    p: ba_mod.BAProblem,
    mesh: Mesh,
    axis: str,
    invdepth: bool,
    max_iters: int,
    th2_mono: float,
    th2_stereo: float,
):
    dt = p.t.dtype
    F = p.R.shape[0]
    L = p.lam.shape[0]
    nl = 1 if invdepth else 3
    pose_w = p.pose_opt.astype(dt)
    lm_w = p.lm_valid.astype(dt)

    obs_spec = ba_mod.BAProblem(
        R=P(), t=P(), pose_opt=P(), Xw=P(), anchor=P(), bearing=P(), lam=P(),
        lm_valid=P(),
        obs_kf=P(axis), obs_lm=P(axis), obs_px=P(axis, None),
        obs_right=P(axis), obs_valid=P(axis),
        calib_l=res.Calib(P(), P(), P(), P()),
        calib_r=res.Calib(P(), P(), P(), P()),
        T_rl=SE3(P(), P()),
    )

    def body(p_sh: ba_mod.BAProblem):
        """Runs on every device with its local observation shard."""

        def build(R, t, Xw, lam):
            r, J_obs, J_anc, J_lm, pos = ba_mod._residuals_all(
                p_sh, R, t, Xw, lam, invdepth)
            if invdepth:
                J_anc = ba_mod._anchor_jacobian_fix(p_sh, R, t, lam, J_anc)
            chi2 = jnp.sum(r * r, axis=-1)
            th2 = jnp.where(p_sh.obs_right, th2_stereo, th2_mono)
            sw = res.huber_weight(chi2, th2)
            w = p_sh.obs_valid.astype(dt) * sw
            anc_idx = p_sh.anchor[p_sh.obs_lm] if invdepth else p_sh.obs_kf
            Jo = J_obs * (w * pose_w[p_sh.obs_kf])[:, None, None]
            Ja = J_anc * (w * pose_w[anc_idx])[:, None, None]
            Jl = J_lm * (w * lm_w[p_sh.obs_lm])[:, None, None]
            rw = r * w[:, None]

            Hpp = jnp.zeros((F, F, 6, 6), dt)
            Hpp = Hpp.at[p_sh.obs_kf, p_sh.obs_kf].add(
                jnp.einsum("oij,oik->ojk", Jo, Jo))
            bp = jnp.zeros((F, 6), dt).at[p_sh.obs_kf].add(
                jnp.einsum("oij,oi->oj", Jo, rw))
            if invdepth:
                Hpp = Hpp.at[anc_idx, anc_idx].add(jnp.einsum("oij,oik->ojk", Ja, Ja))
                Hpp = Hpp.at[p_sh.obs_kf, anc_idx].add(jnp.einsum("oij,oik->ojk", Jo, Ja))
                Hpp = Hpp.at[anc_idx, p_sh.obs_kf].add(jnp.einsum("oij,oik->ojk", Ja, Jo))
                bp = bp.at[anc_idx].add(jnp.einsum("oij,oi->oj", Ja, rw))
            Hll = jnp.zeros((L, nl, nl), dt).at[p_sh.obs_lm].add(
                jnp.einsum("oij,oik->ojk", Jl, Jl))
            bl = jnp.zeros((L, nl), dt).at[p_sh.obs_lm].add(
                jnp.einsum("oij,oi->oj", Jl, rw))
            W = jnp.zeros((L, F, 6, nl), dt).at[p_sh.obs_lm, p_sh.obs_kf].add(
                jnp.einsum("oij,oik->ojk", Jo, Jl))
            if invdepth:
                W = W.at[p_sh.obs_lm, anc_idx].add(jnp.einsum("oij,oik->ojk", Ja, Jl))

            th = jnp.sqrt(th2)
            rho = jnp.where(chi2 <= th2, chi2, 2.0 * th * jnp.sqrt(chi2) - th2)
            cost = jnp.sum(rho * p_sh.obs_valid.astype(dt))

            # --- the collective: accumulate over the observation shards ---
            return jax.tree.map(
                lambda x: jax.lax.psum(x, axis),
                (Hpp, bp, Hll, bl, W, cost))

        def solve_step(Hpp, bp, Hll, bl, W, damp):
            eyeL = jnp.eye(nl, dtype=dt)
            diag_ok = jnp.diagonal(Hll, axis1=-2, axis2=-1).sum(-1) > 1e-10
            Hll_d = Hll + damp * eyeL * jnp.maximum(
                jnp.abs(jnp.diagonal(Hll, axis1=-2, axis2=-1))[..., None], 1e-6)
            Hll_inv = jnp.linalg.inv(Hll_d + (~diag_ok)[:, None, None] * eyeL)
            Hll_inv = Hll_inv * diag_ok[:, None, None]
            WHinv = jnp.einsum("lfin,lnm->lfim", W, Hll_inv)
            S = Hpp - jnp.einsum("lfim,lgjm->fgij", WHinv, W)
            b_red = bp - jnp.einsum("lfim,lm->fi", WHinv, bl)
            Sf = S.transpose(0, 2, 1, 3).reshape(F * 6, F * 6)
            Sf = Sf + jnp.diag(damp * jnp.maximum(jnp.abs(jnp.diag(Sf)), 1e-6))
            Sf = Sf + jnp.diag(jnp.repeat(1.0 - pose_w, 6))
            bf = b_red.reshape(F * 6) * jnp.repeat(pose_w, 6)
            dxp = -jnp.linalg.solve(Sf, bf).reshape(F, 6) * pose_w[:, None]
            Wt_dx = jnp.einsum("lfim,fi->lm", W, dxp)
            dl = jnp.einsum("lnm,lm->ln", Hll_inv, -bl - Wt_dx) * lm_w[:, None]
            return dxp, dl

        R, t, Xw, lam = p_sh.R, p_sh.t, p_sh.Xw, p_sh.lam
        damp = jnp.asarray(1e-4, dt)
        cost0 = None
        for _ in range(max_iters):
            Hpp, bp, Hll, bl, W, cost = build(R, t, Xw, lam)
            if cost0 is None:
                cost0 = cost
            dxp, dl = solve_step(Hpp, bp, Hll, bl, W, damp)
            T = lie.se3_boxplus_left(SE3(R, t), dxp)
            R, t = T.R, T.t
            if invdepth:
                lam = lam + dl[:, 0]
            else:
                Xw = Xw + dl
        _, _, _, _, _, cost_f = build(R, t, Xw, lam)
        return R, t, Xw, lam, cost0, cost_f

    fn = jax.shard_map(
        body, mesh=mesh, in_specs=(obs_spec,),
        out_specs=(P(), P(), P(), P(), P(), P()))
    return fn(p)


def solve_ba_sharded(
    p: ba_mod.BAProblem,
    mesh: Mesh,
    axis: str = "dp",
    invdepth: bool = True,
    max_iters: int = 5,
    th2_mono: float = 5.9915,
    th2_stereo: float = 7.8147,
):
    """Observation-sharded Gauss-Newton BA over a device mesh.

    Observation count must divide the mesh size (pad with obs_valid=False)."""
    p = _shard_obs(p, mesh, axis)
    return _solve_ba_sharded_impl(
        p, mesh, axis, invdepth, max_iters, th2_mono, th2_stereo)


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
