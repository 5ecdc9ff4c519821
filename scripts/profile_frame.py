"""Sub-kernel device-time profile of the per-frame tracking hot path.

Breaks frame_step's ~7 ms (round-4: preprocess 0.69 / fb_klt 3.73 /
pnp+ransac 2.35) into individually timed device dispatches so the
bandwidth/latency attack (VERDICT r4 weak #2) targets the real hog:

  - preprocess (CLAHE + pyramid) and Scharr gradient pyramids
  - window extraction alone (the vmapped dynamic_slice gather)
  - the Pallas LK iteration kernel alone
  - one full fb_klt_tracking call
  - essential RANSAC (8pt vs 5pt) and the multi-start PnP
  - full frame_step, plus XLA cost-analysis bytes/flops per op category

Run on the real TPU with nothing else on the host core:
    python scripts/profile_frame.py [--n 512]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def timeit(fn, n=50):
    import jax
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--frames", type=int, default=40)
    args = ap.parse_args()

    from ov2slam_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import synthetic as syn
    from ov2slam_tpu.config import SlamParams
    from ov2slam_tpu.slam.manager import SlamSystem
    from ov2slam_tpu.slam import frontend as fe_mod
    from ov2slam_tpu.ops import klt as klt_mod
    from ov2slam_tpu.ops import mvg

    print("backend:", jax.devices()[0])
    frames_l, frames_r, _ = syn.render_sequence(
        n_frames=args.frames, step=0.03, yaw_rate=0.0015)
    d = syn.slam_params_dict()
    d["force_realtime"] = 1
    p = SlamParams.from_dict(d)
    slam = SlamSystem(p)
    for i in range(min(16, args.frames)):
        slam.process_stereo(frames_l[i], frames_r[i], time=i * 0.05)
    slam.flush()

    state = slam.fe_state
    lm_pos, lm_is3d = slam.map.device_landmarks()
    cam = slam.cam_l
    imgs = [jnp.asarray(np.ascontiguousarray(f), jnp.uint8)
            for f in frames_l[-4:]]

    r = args.reps
    # ---- preprocess + gradients ----
    import functools

    @functools.partial(jax.jit, static_argnames=("lv", "uc"))
    def pre_only(img, lv, uc, cc):
        return fe_mod.preprocess(img, lv, uc, cc)[0]

    @functools.partial(jax.jit, static_argnames=("lv", "uc"))
    def pre_grads(img, lv, uc, cc):
        q = fe_mod.preprocess(img, lv, uc, cc)
        return fe_mod._grad_pyrs(q)[0][0]

    ms_pre = timeit(lambda: pre_only(imgs[0], p.nklt_pyr_lvl, p.use_clahe,
                                     p.fclahe_val), r)
    ms_pre_g = timeit(lambda: pre_grads(imgs[0], p.nklt_pyr_lvl, p.use_clahe,
                                        p.fclahe_val), r)
    print(f"preprocess only           {ms_pre:7.3f} ms")
    print(f"preprocess + grad pyrs    {ms_pre_g:7.3f} ms")

    kps = state.kps
    pyr, gx, gy = state.pyr, state.gx, state.gy
    N = kps.px.shape[0]
    win = p.nklt_win_size
    ws = win + 11

    # ---- window extraction alone (level 0, 3-channel template form) ----
    @jax.jit
    def extract3(px):
        o = jnp.round(px).astype(jnp.int32) - ws // 2
        H, W = pyr[0].shape
        o = jnp.stack([jnp.clip(o[:, 0], 0, W - ws),
                       jnp.clip(o[:, 1], 0, H - ws)], -1)
        return klt_mod._extract_windows(
            jnp.stack([pyr[0], gx[0], gy[0]]), o, ws)

    @jax.jit
    def extract1(px):
        o = jnp.round(px).astype(jnp.int32) - ws // 2
        H, W = pyr[0].shape
        o = jnp.stack([jnp.clip(o[:, 0], 0, W - ws),
                       jnp.clip(o[:, 1], 0, H - ws)], -1)
        return klt_mod._extract_windows(pyr[0][None], o, ws)

    ms_ex3 = timeit(lambda: extract3(kps.px), r)
    ms_ex1 = timeit(lambda: extract1(kps.px), r)
    print(f"window extract 3ch (N={N}) {ms_ex3:7.3f} ms")
    print(f"window extract 1ch        {ms_ex1:7.3f} ms")

    # ---- pallas kernel alone (10 iterations) ----
    from ov2slam_tpu.ops import pallas_lk
    nwin = extract1(kps.px)[0]
    tw = extract3(kps.px)
    from ov2slam_tpu.ops.klt import _sample_in_windows
    o = jnp.round(kps.px).astype(jnp.int32) - ws // 2
    pos = kps.px - o.astype(jnp.float32)
    tmpl, gxp, gyp = _sample_in_windows(tw, pos, win)
    gxx = jnp.sum(gxp * gxp, -1)
    gxy = jnp.sum(gxp * gyp, -1)
    gyy = jnp.sum(gyp * gyp, -1)
    invd = 1.0 / jnp.maximum(gxx * gyy - gxy * gxy, 1e-12)
    ctr = o.astype(jnp.float32) + ws // 2

    def pk():
        return pallas_lk.lk_iterate(
            nwin, tmpl, gxp, gyp, gxx, gxy, gyy, invd, o, ctr,
            kps.px, kps.valid, win=win, n_iters=10, eps=0.01,
            margin=4.0)[0]

    ms_pk = timeit(pk, r)
    print(f"pallas LK 10 iters        {ms_pk:7.3f} ms")

    # ---- full fb-KLT ----
    def klt():
        return klt_mod.fb_klt_tracking(
            pyr, pyr, kps.px, kps.px, kps.valid,
            nlevels=p.nklt_pyr_lvl, win=win,
            max_iters=p.nmax_iter, eps=p.fmax_px_precision,
            max_fb_dist=p.fmax_fbklt_dist, max_err=p.nklt_err,
            prev_grad_pyr=tuple(zip(gx, gy)),
            next_grad_pyr=tuple(zip(gx, gy))).points

    ms_klt = timeit(klt, r)
    print(f"fb_klt_tracking           {ms_klt:7.3f} ms")

    # ---- essential ransac, both solvers; p3p; pnp ----
    key = jax.random.PRNGKey(0)
    nh = fe_mod.ransac_hyps_of(p)
    focal = 0.5 * (cam.fx + cam.fy)
    for solver in ("8pt", "nister"):
        ms = timeit(lambda: mvg.essential_ransac(
            kps.bv, kps.bv, kps.valid, key, err_th=p.fransac_err / focal,
            n_hyps=nh, solver=solver).n_inliers, r)
        print(f"essential_ransac {solver:<7} {ms:7.3f} ms  (n_hyps={nh})")

    from ov2slam_tpu.opt import pnp as pnp_mod
    from ov2slam_tpu.core.lie import SE3
    slot = jnp.clip(kps.lmid, 0, lm_pos.shape[0] - 1)
    Xw = lm_pos[slot]
    m3 = kps.valid & kps.is3d & lm_is3d[slot] & (kps.lmid >= 0)
    cal = fe_mod.calib_of(cam)
    R0 = jnp.asarray(slam.T_cw[:3, :3])
    t0 = jnp.asarray(slam.T_cw[:3, 3])

    def pnp2():
        res = jax.vmap(
            lambda R, t, m: pnp_mod.pnp_robust_then_l2(
                cal, SE3(R, t), Xw, kps.unpx, m,
                robust_th2=p.robust_mono_th)
        )(jnp.stack([R0, R0]), jnp.stack([t0, t0]), jnp.stack([m3, m3]))
        return res.n_inliers

    ms_pnp = timeit(pnp2, r)
    print(f"pnp 2-start vmap          {ms_pnp:7.3f} ms")

    ms_p3p = timeit(lambda: mvg.p3p_ransac(
        Xw, kps.bv, m3, key, err_th_norm=p.fransac_err / focal,
        n_hyps=nh)[2], r)
    print(f"p3p_ransac                {ms_p3p:7.3f} ms  (n_hyps={nh})")

    # ---- full frame_step ----
    kw = dict(levels=p.nklt_pyr_lvl, use_clahe=p.use_clahe,
              clahe_clip=p.fclahe_val, nklt_win=win,
              nmax_iter=p.nmax_iter, fmax_px_precision=p.fmax_px_precision,
              fmax_fbklt_dist=p.fmax_fbklt_dist, klt_err=p.nklt_err,
              do_epipolar=p.doepipolar, fransac_err=p.fransac_err,
              robust_th2=p.robust_mono_th,
              n_ransac_hyps=nh, dop3p=p.dop3p,
              track_from_kf=p.btrack_keyframetoframe)
    st = {"s": state, "i": 0}

    def step():
        st["i"] += 1
        st["s"], stats = fe_mod.frame_step(
            st["s"], imgs[st["i"] % 4], lm_pos, lm_is3d, cam, **kw)
        return stats

    ms_frame = timeit(step, r)
    print(f"frame_step (fused)        {ms_frame:7.3f} ms  "
          f"=> {1e3 / ms_frame:.1f} fps ceiling")

    try:
        cost = fe_mod.frame_step.lower(
            st["s"], imgs[0], lm_pos, lm_is3d, cam, **kw
        ).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        print(f"cost_analysis: flops={cost.get('flops'):.3e} "
              f"bytes={cost.get('bytes accessed'):.3e}")
        # per-category byte attribution when the backend provides it
        for k in sorted(cost):
            if k.startswith("bytes accessed") and k != "bytes accessed":
                v = cost[k]
                if v > 1e7:
                    print(f"  {k}: {v:.3e}")
    except Exception as e:
        print("cost_analysis failed:", e)


if __name__ == "__main__":
    main()
