"""Per-component device-time profile of the per-frame tracking path.

Warm-runs the full SlamSystem on the synthetic sequence to build realistic
state (landmarks, keypoints, pyramids), then times amortized dispatch chains:
  - frame_step (the fused per-frame call)
  - fb_klt_tracking alone
  - pnp_robust_then_l2 alone (2 vmapped starts, as track_frame runs it)
  - essential_ransac alone
  - preprocess+gradients alone

Amortized timing: N dispatches chained, one block at the end — measures
device throughput, not tunnel round-trip latency (see memory: tunnel RTT is
1-30 ms and would swamp per-call timings).

Run ALONE (never concurrently with another TPU process).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import synthetic as syn
from ov2slam_tpu.config import SlamParams
from ov2slam_tpu.slam.manager import SlamSystem
from ov2slam_tpu.slam import frontend as fe_mod
from ov2slam_tpu.ops import klt as klt_mod
from ov2slam_tpu.ops import mvg
from ov2slam_tpu.opt import pnp as pnp_mod
from ov2slam_tpu.core import lie
from ov2slam_tpu.core.lie import SE3
from ov2slam_tpu.utils import enable_compilation_cache


def timeit(fn, n=30, inner_block=False):
    """fn() must return a jax array (or pytree); chained amortized timing."""
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
        if inner_block:
            jax.block_until_ready(out)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    enable_compilation_cache()
    n_frames = 50
    frames_l, frames_r, poses_gt = syn.render_sequence(
        n_frames=n_frames, step=0.03, yaw_rate=0.0015)
    d = syn.slam_params_dict()
    d["force_realtime"] = 1
    params = SlamParams.from_dict(d)
    slam = SlamSystem(params)
    for i in range(45):
        slam.process_stereo(frames_l[i], frames_r[i], time=i * 0.05)
    slam.flush()
    print(f"warm: kfs={len(slam.map.keyframes)} lm3d={slam.map.n_3d()}",
          flush=True)

    p = params
    state = slam.fe_state
    lm_pos, lm_is3d = slam.map.device_landmarks()
    cam = slam.cam_l
    imgs = [jnp.asarray(np.ascontiguousarray(frames_l[i]), jnp.uint8)
            for i in (45, 46, 47, 48)]
    kw = dict(levels=p.nklt_pyr_lvl, use_clahe=p.use_clahe,
              clahe_clip=p.fclahe_val, nklt_win=p.nklt_win_size,
              nmax_iter=p.nmax_iter, fmax_px_precision=p.fmax_px_precision,
              fmax_fbklt_dist=p.fmax_fbklt_dist, klt_err=p.nklt_err,
              do_epipolar=p.doepipolar, fransac_err=p.fransac_err,
              robust_th2=p.robust_mono_th,
              n_ransac_hyps=fe_mod.ransac_hyps_of(p), dop3p=p.dop3p,
              track_from_kf=p.btrack_keyframetoframe)

    # ---- full frame_step (chained, donated state) ----
    st = {"s": state}

    def step():
        st["s"], stats = fe_mod.frame_step(
            st["s"], imgs[np.random.randint(4)], lm_pos, lm_is3d, cam, **kw)
        return stats

    ms_frame = timeit(step, n=60)
    print(f"frame_step            {ms_frame:7.2f} ms", flush=True)
    state = st["s"]

    # ---- components ----
    pyr = fe_mod.preprocess(imgs[0], p.nklt_pyr_lvl, p.use_clahe, p.fclahe_val)
    gx, gy = fe_mod._grad_pyrs(pyr)
    pyr2 = fe_mod.preprocess(imgs[1], p.nklt_pyr_lvl, p.use_clahe, p.fclahe_val)
    gx2, gy2 = fe_mod._grad_pyrs(pyr2)
    kps = state.kps

    import functools

    @functools.partial(jax.jit, static_argnames=("lv", "uc"))
    def _pre_jit(img, lv, uc, cc):
        q = fe_mod.preprocess(img, lv, uc, cc)
        g = fe_mod._grad_pyrs(q)
        return g[0][0]

    def pre():
        return _pre_jit(imgs[np.random.randint(4)], p.nklt_pyr_lvl,
                        p.use_clahe, p.fclahe_val)

    print(f"preprocess+grads      {timeit(pre, n=60):7.2f} ms", flush=True)

    def klt(nc=3):
        return klt_mod.fb_klt_tracking(
            pyr, pyr2, kps.px, kps.px, kps.valid,
            nlevels=p.nklt_pyr_lvl, win=p.nklt_win_size, max_iters=p.nmax_iter,
            eps=p.fmax_px_precision, max_fb_dist=p.fmax_fbklt_dist,
            max_err=p.nklt_err,
            prev_grad_pyr=tuple(zip(gx, gy)),
            next_grad_pyr=tuple(zip(gx2, gy2)), n_chunks=nc).points

    print(f"fb_klt (3 chunks)     {timeit(klt, n=60):7.2f} ms", flush=True)
    print(f"fb_klt (2 chunks)     {timeit(lambda: klt(2), n=60):7.2f} ms",
          flush=True)
    print(f"fb_klt (1 chunk)      {timeit(lambda: klt(1), n=60):7.2f} ms",
          flush=True)

    slot = jnp.clip(kps.lmid, 0, lm_pos.shape[0] - 1)
    Xw = lm_pos[slot]
    kp3d = kps.valid & kps.is3d & lm_is3d[slot]
    cal = fe_mod.calib_of(cam)
    R = state.R_cw
    t = state.t_cw

    @jax.jit
    def _pnp2_jit(R, t, Xw, unpx, kp3d):
        res = jax.vmap(
            lambda R0, t0, m: pnp_mod.pnp_robust_then_l2(
                cal, SE3(R0, t0), Xw, unpx, m,
                robust_th2=p.robust_mono_th)
        )(jnp.stack([R, R]), jnp.stack([t, t]), jnp.stack([kp3d, kp3d]))
        return res.cost

    def pnp2():
        return _pnp2_jit(R, t, Xw, kps.unpx, kp3d)

    print(f"pnp x2 starts         {timeit(pnp2, n=60):7.2f} ms", flush=True)

    key = jax.random.PRNGKey(0)
    focal = float(0.5 * (cam.fx + cam.cy))

    def ess():
        r = mvg.essential_ransac(
            kps.bv, kps.bv, kps.valid, key,
            err_th=p.fransac_err / focal,
            n_hyps=fe_mod.ransac_hyps_of(p))
        return r.n_inliers

    print(f"essential_ransac      {timeit(ess, n=30):7.2f} ms", flush=True)

    n3d = int(jnp.sum(kp3d))
    nv = int(jnp.sum(kps.valid))
    print(f"(n_valid={nv} n_3d={n3d} cap={kps.px.shape[0]} "
          f"hyps={fe_mod.ransac_hyps_of(p)})", flush=True)


if __name__ == "__main__":
    main()
