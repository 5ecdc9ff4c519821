"""Instrument the monocular bootstrap on the fast_mono tier: why does
_try_mono_init fail repeatedly (round-4 diagnosis)?"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

from ov2slam_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from hard_bench import tier_configs, render_cache
from ov2slam_tpu.config import SlamParams
from ov2slam_tpu.slam.manager import SlamSystem
from ov2slam_tpu.ops import mvg
from ov2slam_tpu.utils import fetch_np
import jax.numpy as jnp

tier = sys.argv[sys.argv.index("--tier") + 1] if "--tier" in sys.argv \
    else "fast_mono"
cfg = tier_configs()[tier]
for a in sys.argv:
    if "=" in a and not a.startswith("-"):
        k, v = a.split("=", 1)
        try:
            v = float(v) if "." in v else int(v)
        except ValueError:
            pass
        cfg[k] = v
cfg.pop("__frames__", None)
cfg.pop("__cam__", None)
cfg.pop("__preset__", None)
cfg.pop("__traj__", None)
cfg.pop("__dist__", None)
L, R, gt = render_cache(1000, "/tmp/ov2slam_hard_seq")

params = SlamParams.from_dict(cfg)
slam = SlamSystem(params)

orig_init = SlamSystem._try_mono_init


def wrapped(self, time):
    # replicate the observability of the internals
    m = self.map
    kf0 = m.keyframes.get(self.cur_kfid)
    kp_lmid, kp_valid, kp_bv = fetch_np(
        self.kps.lmid, self.kps.valid, self.kps.bv)
    K = self.kp_cap
    bv0 = np.zeros((K, 3), np.float32)
    bv0[:, 2] = 1.0
    ok = np.zeros(K, bool)
    if kf0 is not None:
        for s in np.nonzero(kp_valid & (kp_lmid >= 0))[0]:
            slot0 = kf0.kp_slot_of(int(kp_lmid[s]))
            if slot0 >= 0:
                bv0[s] = kf0.bv[slot0]
                ok[s] = True
    n_matches = int(ok.sum())
    ess_inl = -1
    if n_matches >= 30:
        import jax
        res = mvg.essential_ransac(
            jnp.asarray(bv0), jnp.asarray(kp_bv), jnp.asarray(ok),
            self._key(self.frame_id),
            err_th=self.params.fransac_err / float(
                0.5 * (self.cam_l.fx + self.cam_l.fy)),
            n_hyps=512)
        ess_inl = int(res.n_inliers) if bool(res.success) else 0

    n3d_log = []
    real_reset = slam_reset

    def record_reset():
        n3d_log.append(m.n_3d())
        real_reset()
    self.reset = record_reset
    try:
        okflag = orig_init(self, time)
    finally:
        self.reset = real_reset
    print(f"[init@{time/0.05:.0f}] matches={n_matches} ess_inl={ess_inl} "
          f"ok={okflag} n3d_at_reset={n3d_log}", flush=True)
    return okflag


slam_reset = slam.reset
SlamSystem._try_mono_init = wrapped

n = 320
for i in range(n):
    slam.process_mono(L[i].astype(np.float32), time=i * 0.05)
    if slam.initialized:
        print(f"INITIALIZED at frame {i}: n3d={slam.map.n_3d()}")
        break
