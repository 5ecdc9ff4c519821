"""At the first mono-init attempt, break down which temporal-triangulation
gate rejects each essential-inlier match (round-4 fast_mono diagnosis)."""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from ov2slam_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from hard_bench import tier_configs, render_cache
from ov2slam_tpu.config import SlamParams
from ov2slam_tpu.slam.manager import SlamSystem
from ov2slam_tpu.core import lie, camera as cam_mod
from ov2slam_tpu.core.lie import SE3
from ov2slam_tpu.ops import mvg
from ov2slam_tpu.utils import fetch_np

tier = sys.argv[1] if len(sys.argv) > 1 else "fast_mono"
cfg = tier_configs()[tier]
for k in ("__frames__", "__cam__", "__preset__", "__traj__", "__dist__"):
    cfg.pop(k, None)
L, R, GT = render_cache(1000, "/tmp/ov2slam_hard_seq")

params = SlamParams.from_dict(cfg)
slam = SlamSystem(params)

orig_init = SlamSystem._try_mono_init


def wrapped(self, time):
    m = self.map
    kf0 = m.keyframes.get(self.cur_kfid)
    kp_lmid, kp_valid, kp_bv, kp_unpx = fetch_np(
        self.kps.lmid, self.kps.valid, self.kps.bv, self.kps.unpx)
    K = self.kp_cap
    bv0 = np.zeros((K, 3), np.float32)
    bv0[:, 2] = 1.0
    ok = np.zeros(K, bool)
    for s in np.nonzero(kp_valid & (kp_lmid >= 0))[0]:
        slot0 = kf0.kp_slot_of(int(kp_lmid[s]))
        if slot0 >= 0:
            b = kf0.bv[slot0]
            bv0[s] = b / max(b[2], 1e-9)
            ok[s] = True
    res = mvg.essential_ransac(
        jnp.asarray(bv0), jnp.asarray(kp_bv), jnp.asarray(ok),
        self._key(self.frame_id),
        err_th=self.params.fransac_err / float(
            0.5 * (self.cam_l.fx + self.cam_l.fy)), n_hyps=512)
    T_rel = mvg.decompose_essential(
        res.model, jnp.asarray(bv0), jnp.asarray(kp_bv), res.inliers)
    R_wc = np.asarray(T_rel.R)
    t_wc = np.asarray(T_rel.t) * 0.25
    T_wc = np.eye(4, dtype=np.float32)
    T_wc[:3, :3] = R_wc
    T_wc[:3, 3] = t_wc
    T_cw = (np.linalg.inv(T_wc.astype(np.float64))
            @ kf0.T_cw.astype(np.float64)).astype(np.float32)

    # replicate triangulate_temporal gates for the inlier matches
    inl = np.asarray(res.inliers) & ok
    anc_T = kf0.T_cw
    T_cur = SE3(jnp.asarray(T_cw[:3, :3]), jnp.asarray(T_cw[:3, 3]))
    T_anc = SE3(jnp.asarray(np.tile(anc_T[:3, :3], (K, 1, 1))),
                jnp.asarray(np.tile(anc_T[:3, 3], (K, 1))))
    T_ca = lie.se3_compose(T_cur, lie.se3_inverse(T_anc))
    T_ac = lie.se3_inverse(T_ca)

    def tri_one(Tac_R, Tac_t, b_a, b_c):
        return mvg.triangulate_midpoint(SE3(Tac_R, Tac_t), b_a, b_c)

    Xa = np.asarray(jax.vmap(tri_one)(
        T_ac.R, T_ac.t, jnp.asarray(bv0), jnp.asarray(kp_bv)))
    depth_a = Xa[:, 2]
    Xc = np.asarray(lie.se3_apply(T_ca, jnp.asarray(Xa)))
    depth_c = Xc[:, 2]
    cam = self.cam_l
    focal = 0.5 * (float(cam.fx) + float(cam.fy))
    b_rot = np.einsum("nij,nj->ni", np.asarray(T_ca.R), bv0)
    rot_px = np.asarray(cam_mod.project_cam_to_image(cam, jnp.asarray(b_rot)))
    parallax = np.linalg.norm(kp_unpx - rot_px, axis=-1)
    reproj = np.asarray(cam_mod.project_cam_to_image(cam, jnp.asarray(Xc)))
    err = np.linalg.norm(reproj - kp_unpx, axis=-1)

    n = inl.sum()
    g_par = parallax > 10.0
    g_chir = (depth_a > 0.05) & (depth_c > 0.05)
    g_depth = depth_a < 200.0
    g_rep = err < 3.0
    print(f"[init@{time/0.05:.0f}] inl={n} "
          f"pass_parallax={int((inl & g_par).sum())} "
          f"pass_chir={int((inl & g_chir).sum())} "
          f"pass_depth={int((inl & g_depth).sum())} "
          f"pass_reproj={int((inl & g_rep).sum())} "
          f"pass_all={int((inl & g_par & g_chir & g_depth & g_rep).sum())}",
          flush=True)
    q = inl & g_chir
    print(f"   parallax med={np.median(parallax[q]):.1f} "
          f"p25={np.percentile(parallax[q], 25):.1f} "
          f"reproj med={np.median(err[q]):.2f} "
          f"p75={np.percentile(err[q], 75):.2f} "
          f"depth_a med={np.median(depth_a[q] / 0.25):.1f} (gt-ish units)",
          flush=True)
    return orig_init(self, time)


SlamSystem._try_mono_init = wrapped

for i in range(40):
    slam.process_mono(L[i].astype(np.float32), time=i * 0.05)
    if slam.initialized:
        print(f"INITIALIZED at {i}")
        break
