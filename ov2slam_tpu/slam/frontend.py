"""Visual front end: frame-rate camera tracking.

Replaces the reference's VisualFrontEnd (reference: src/visual_front_end.cpp):
CLAHE + pyramid preprocessing, constant-velocity motion model, two-stage KLT
(3D keypoints from projected priors at 1 pyramid level, the rest over the
full pyramid), epipolar 2d-2d outlier filtering, motion-only PnP, and the
keyframe-need heuristics.

TPU-first: the entire tracking math — both KLT stages, the essential-matrix
RANSAC and the PnP solve — is one jitted device function per frame
(`track_frame`); only scalars (keypoint counts, parallax, pose) come back to
the host, which runs the motion model and the KF decision.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ov2slam_tpu.config import SlamParams
from ov2slam_tpu.core import camera as cam_mod
from ov2slam_tpu.core import lie
from ov2slam_tpu.core.camera import Camera
from ov2slam_tpu.core.lie import SE3
from ov2slam_tpu.ops import image as im
from ov2slam_tpu.ops import klt as klt_mod
from ov2slam_tpu.ops import mvg
from ov2slam_tpu.opt import pnp as pnp_mod
from ov2slam_tpu.opt.residuals import Calib
from ov2slam_tpu.slam import frame as frame_mod
from ov2slam_tpu.slam.frame import FrameKps


class TrackResult(NamedTuple):
    kps: FrameKps
    T_cw_R: jnp.ndarray
    T_cw_t: jnp.ndarray
    pose_ok: jnp.ndarray       # bool — enough PnP inliers
    n_tracked: jnp.ndarray
    n_3d: jnp.ndarray
    n_inliers: jnp.ndarray
    parallax_med: jnp.ndarray  # median rotation-compensated parallax (px)


def calib_of(cam: Camera) -> Calib:
    return Calib(cam.fx, cam.fy, cam.cx, cam.cy)


def ransac_hyps_of(params: SlamParams) -> int:
    """Map the reference's nransac_iter (sequential adaptive iterations) to a
    batched hypothesis count: 2x, rounded up to a power of two (a batched
    evaluator has no early exit, so it needs the full-budget count), floor
    128. nransac_iter=100 (all reference presets) => 256."""
    return max(128, 1 << (2 * max(int(params.nransac_iter), 1) - 1).bit_length())


@functools.partial(
    jax.jit,
    static_argnames=("nklt_pyr_lvl", "nklt_win", "nmax_iter", "do_epipolar",
                     "n_ransac_hyps", "dop3p", "track_from_kf"),
)
def track_frame(
    prev_pyr: Tuple[jnp.ndarray, ...],
    cur_pyr: Tuple[jnp.ndarray, ...],
    kps: FrameKps,
    lm_pos: jnp.ndarray,       # (L, 3) landmark arena
    lm_is3d: jnp.ndarray,      # (L,)
    cam: Camera,
    R_prior: jnp.ndarray,      # (3, 3) motion-model world-to-cam
    t_prior: jnp.ndarray,      # (3,)
    R_prev: jnp.ndarray,
    t_prev: jnp.ndarray,
    key: jnp.ndarray,
    R_kf: jnp.ndarray = None,   # rotation of the last KF (parallax ref)
    nklt_pyr_lvl: int = 3,
    nklt_win: int = 9,
    nmax_iter: int = 30,
    fmax_px_precision: float = 0.01,
    fmax_fbklt_dist: float = 0.5,
    klt_err: float = 30.0,
    do_epipolar: bool = True,
    fransac_err: float = 3.0,
    robust_th2: float = 5.9915,
    min_pnp_inliers: int = 5,
    n_ransac_hyps: int = 256,
    dop3p: bool = False,
    prev_gpyr=None,
    cur_gpyr=None,
    track_from_kf: bool = False,
) -> TrackResult:
    """One full tracking step (the device side of visualTracking/trackMono,
    visual_front_end.cpp:40-128).

    With track_from_kf (btrack_keyframetoframe,
    visual_front_end.cpp:278-442) the KLT template is the LAST KEYFRAME
    image at the keypoints' KF positions instead of the previous frame —
    drift-free tracking at the cost of a larger search displacement; the
    caller passes the keyframe pyramids via prev_pyr/prev_gpyr."""
    if R_kf is None:
        R_kf = R_prev
    T_prior = SE3(R_prior, t_prior)
    slot = jnp.clip(kps.lmid, 0, lm_pos.shape[0] - 1)
    Xw = lm_pos[slot]
    kp_is3d = kps.valid & kps.is3d & lm_is3d[slot] & (kps.lmid >= 0)

    # ---- fused KLT: ONE full-pyramid pass over all keypoints with per-kp
    # priors (3D kps seed at their projected position, the rest at their
    # previous position). The reference splits this into a cheap 1-level
    # prior-seeded pass for 3D kps plus a full-pyramid pass for the rest
    # (visual_front_end.cpp:132-275) — a CPU cost optimization; on TPU both
    # passes have identical padded shapes, so a single pass costs the same
    # as the reference's second pass alone and gives the 3D kps the full
    # coarse-to-fine treatment on top of their priors. ----
    proj = cam_mod.project_cam_to_image_dist(cam, lie.se3_apply(T_prior, Xw))
    prior_ok = kp_is3d & cam_mod.in_image(cam, proj, border=nklt_win)
    prior = jnp.where(prior_ok[:, None], proj, kps.px)
    tmpl_px = kps.kf_px if track_from_kf else kps.px
    st = klt_mod.fb_klt_tracking(
        prev_pyr, cur_pyr, tmpl_px, prior,
        kps.valid, nlevels=nklt_pyr_lvl, win=nklt_win, max_iters=nmax_iter,
        eps=fmax_px_precision, max_fb_dist=fmax_fbklt_dist, max_err=klt_err,
        prev_grad_pyr=prev_gpyr, next_grad_pyr=cur_gpyr)
    new_px = st.points
    ok = kps.valid & st.status

    prev_bv = kps.kf_bv if track_from_kf else kps.bv
    kps2 = frame_mod.update_positions(kps, cam, new_px, ok)
    n_tracked = jnp.sum(kps2.valid)

    # ---- epipolar 2d-2d filter (visual_front_end.cpp:446-656) ----
    if do_epipolar:
        focal = 0.5 * (cam.fx + cam.fy)
        # rotation-compensated parallax gate: with little parallax the
        # essential matrix is degenerate (pure rotation) and RANSAC inlier
        # classification is destructive — the reference skips the filter
        # below 2*fransac_err px (visual_front_end.cpp:530-537)
        R_rel_prior = R_prior @ (R_kf.T if track_from_kf else R_prev.T)
        bv_rot_p = jnp.einsum("ij,nj->ni", R_rel_prior, prev_bv)
        rot_px_p = cam_mod.project_cam_to_image(cam, bv_rot_p)
        par_p = jnp.linalg.norm(kps2.unpx - rot_px_p, axis=-1)
        avg_par = jnp.sum(jnp.where(kps2.valid, par_p, 0.0)) / jnp.maximum(
            jnp.sum(kps2.valid), 1)
        gate = (n_tracked >= 16) & (avg_par > 2.0 * fransac_err)

        def run_ransac(_):
            eres = mvg.essential_ransac(
                prev_bv, kps2.bv, kps2.valid, key,
                err_th=fransac_err / focal, n_hyps=n_ransac_hyps)
            keep_ratio = jnp.sum(eres.inliers) / jnp.maximum(
                jnp.sum(kps2.valid), 1)
            apply = eres.success & (keep_ratio > 0.5)
            return jnp.where(apply, eres.inliers, kps2.valid)

        # the RANSAC (256 batched 9x9 SVDs) only runs when the parallax gate
        # passes — most frames skip it entirely
        keep = jax.lax.cond(
            gate, run_ransac, lambda _: kps2.valid, operand=None)
        kps2 = kps2._replace(valid=kps2.valid & keep)

    # ---- motion-only PnP on the 3D keypoints ----
    # Multi-start: the reprojection cost can be multi-modal (near-planar
    # point subsets create spurious minima ~cm away), so solve from both the
    # velocity-extrapolated prior and the previous pose (plus, with dop3p,
    # the P3P-RANSAC winner, visual_front_end.cpp:688-740) and keep the best
    # solution (more inliers, then lower cost). The starts run as ONE
    # vmapped solve — a batched LM costs the same as a single start.
    kp3d = kps2.valid & kp_is3d
    n_3d = jnp.sum(kp3d)
    cal = calib_of(cam)
    starts_R = [R_prior, R_prev]
    starts_t = [t_prior, t_prev]
    starts_mask = [kp3d, kp3d]
    starts_gate = [jnp.asarray(True), jnp.asarray(True)]
    if dop3p:
        focal3 = 0.5 * (cam.fx + cam.fy)
        key_p = jax.random.split(key, 2)[1]
        T_p3p, p3p_inl, p3p_n, p3p_ok = mvg.p3p_ransac(
            Xw, kps2.bv, kp3d, key_p,
            err_th_norm=fransac_err / focal3, n_hyps=n_ransac_hyps)
        starts_R.append(T_p3p.R)
        starts_t.append(T_p3p.t)
        starts_mask.append(kp3d & p3p_inl)
        starts_gate.append(p3p_ok)
    res_all = jax.vmap(
        lambda R0, t0, m: pnp_mod.pnp_robust_then_l2(
            cal, SE3(R0, t0), Xw, kps2.unpx, m, robust_th2=robust_th2)
    )(jnp.stack(starts_R), jnp.stack(starts_t), jnp.stack(starts_mask))
    gate = jnp.stack(starts_gate)
    # lexicographic pick: most inliers, then lowest cost (exact two-stage
    # select; a single fused score loses the cost tie-break to f32 rounding)
    inl = jnp.where(gate, res_all.n_inliers, -1)
    is_best_inl = inl == jnp.max(inl)
    best = jnp.argmin(jnp.where(is_best_inl, res_all.cost, jnp.inf))
    pnp = jax.tree_util.tree_map(lambda x: x[best], res_all)
    pose_ok = pnp.n_inliers >= min_pnp_inliers
    R_out = jnp.where(pose_ok, pnp.T_cw.R, R_prior)
    t_out = jnp.where(pose_ok, pnp.T_cw.t, t_prior)

    # drop PnP outliers among the 3D kps — only when the solve succeeded
    # (reference removes them from the frame + MP obs after a valid pose,
    # visual_front_end.cpp:806-831; on failure it keeps the frame intact and
    # requests a reset instead)
    kps2 = kps2._replace(
        valid=kps2.valid & jnp.where(pose_ok & kp3d, pnp.inliers, True))

    # ---- rotation-compensated median parallax vs the LAST KEYFRAME
    # (visual_front_end.cpp:1064-1141: parallax accumulates since the KF,
    # driving both the KF decision and the mono-init trigger) ----
    R_rel = R_out @ R_kf.T        # cur-from-KF rotation
    bv_rot = jnp.einsum("ij,nj->ni", R_rel, kps2.kf_bv)
    rot_px = cam_mod.project_cam_to_image(cam, bv_rot)
    par = jnp.linalg.norm(kps2.unpx - rot_px, axis=-1)
    par = jnp.where(kps2.valid, par, jnp.nan)
    parallax_med = jnp.nanmedian(par)

    return TrackResult(
        kps=kps2, T_cw_R=R_out, T_cw_t=t_out, pose_ok=pose_ok,
        n_tracked=n_tracked, n_3d=n_3d, n_inliers=pnp.n_inliers,
        parallax_med=parallax_med)


@functools.partial(jax.jit, static_argnames=("levels", "use_clahe"))
def preprocess(img: jnp.ndarray, levels: int, use_clahe: bool, clahe_clip: float):
    """CLAHE + optical-flow pyramid (visual_front_end.cpp:1143-1177)."""
    img = img.astype(jnp.float32)
    if use_clahe:
        img = im.clahe(img, clip_limit=clahe_clip)
    return tuple(im.build_pyramid(img, levels))


def check_new_kf(
    params: SlamParams,
    n_tracked: int,
    n_3d: int,
    parallax_med: float,
    frames_since_kf: int,
    n3d_at_kf: int,
    pose_ok: bool,
    time_since_kf: float = 0.0,
) -> bool:
    """Keyframe-need heuristics — the reference's exact rule set
    (checkNewKfReq, visual_front_end.cpp:986-1061). The reference gates some
    conditions on blocalba_is_on_ (BA concurrently running); our BA runs
    synchronously at KF rate, so that flag is always False here."""
    nbmax = params.nbmaxkps
    med = 0.0 if np.isnan(parallax_med) else float(parallax_med)
    nbimfromkf = frames_since_kf

    if not pose_ok:
        return n_tracked > 10 and nbimfromkf >= 2

    if n_tracked < 0.33 * nbmax and nbimfromkf >= 5:
        return True
    if n_3d < 20 and nbimfromkf >= 2:
        return True
    if n_3d > 0.5 * nbmax and nbimfromkf < 2:
        return False
    if params.stereo and time_since_kf > 1.0:
        return True

    cx = (med >= params.finit_parallax / 2.0
          or (params.stereo and nbimfromkf > 2))
    c0 = med >= params.finit_parallax
    c1 = n_3d < 0.75 * max(n3d_at_kf, 1)
    c2 = (n_tracked < 0.5 * nbmax
          and n_3d < 0.85 * max(n3d_at_kf, 1))
    return (c0 or c1 or c2) and cx


# ---------------------------------------------------------------------------
# Fused per-frame step with device-resident state
# ---------------------------------------------------------------------------
#
# The tunneled-TPU environment has ~30 ms latency per blocking host<->device
# round trip, so the per-frame path is ONE jitted call: uint8 image in,
# preprocessed pyramids + Scharr gradient pyramids computed once and carried
# in device state, motion model evaluated on device, and a single packed
# stats vector out (fetched with copy_to_host_async so the round trip hides
# behind the next dispatch).

# Pyramid / gradient storage dtype for the device-resident state: float16
# halves every KLT window gather's streamed bytes and the donated-state
# carry; all math runs f32 after window extraction (ops/klt.py). f16 keeps
# 10 mantissa bits (quantization ≈ ±0.06 at intensity 255 — an order below
# the GN convergence epsilon's sensitivity); bf16's 8 bits would not.
PYR_DT = jnp.float16


def _cast_pyr(pyr):
    return tuple(a.astype(PYR_DT) for a in pyr)


class FEState(NamedTuple):
    pyr: Tuple[jnp.ndarray, ...]       # previous frame pyramid (PYR_DT)
    gx: Tuple[jnp.ndarray, ...]        # Scharr gradient pyramids of prev
    gy: Tuple[jnp.ndarray, ...]
    kps: FrameKps
    R_cw: jnp.ndarray                  # (3, 3) current pose
    t_cw: jnp.ndarray                  # (3,)
    R_vel: jnp.ndarray                 # constant-velocity relative step
    t_vel: jnp.ndarray
    has_vel: jnp.ndarray               # bool
    R_kf: jnp.ndarray                  # rotation of the last keyframe
    key: jnp.ndarray
    # last-keyframe image pyramids: KLT templates for the KF-to-frame
    # tracking mode (btrack_keyframetoframe, visual_front_end.cpp:278-442)
    kf_pyr: Tuple[jnp.ndarray, ...] = None
    kf_gx: Tuple[jnp.ndarray, ...] = None
    kf_gy: Tuple[jnp.ndarray, ...] = None


def init_fe_state(img_u8: np.ndarray, kp_cap: int, levels: int,
                  use_clahe: bool, clahe_clip: float, seed: int = 0) -> FEState:
    pyr = preprocess(jnp.asarray(img_u8), levels, use_clahe, clahe_clip)
    gx, gy = _grad_pyrs(pyr)
    pyr, gx, gy = _cast_pyr(pyr), _cast_pyr(gx), _cast_pyr(gy)
    return FEState(
        pyr=pyr, gx=gx, gy=gy,
        kps=FrameKps.empty(kp_cap),
        R_cw=jnp.eye(3, dtype=jnp.float32),
        t_cw=jnp.zeros(3, jnp.float32),
        R_vel=jnp.eye(3, dtype=jnp.float32),
        t_vel=jnp.zeros(3, jnp.float32),
        has_vel=jnp.asarray(False),
        R_kf=jnp.eye(3, dtype=jnp.float32),
        key=jax.random.PRNGKey(seed),
        # copies, not aliases: the pytree is donated whole to frame_step and
        # a buffer referenced by two donated leaves is an error
        kf_pyr=tuple(jnp.copy(a) for a in pyr),
        kf_gx=tuple(jnp.copy(a) for a in gx),
        kf_gy=tuple(jnp.copy(a) for a in gy),
    )


def _grad_pyrs(pyr):
    gx, gy = [], []
    for lvl in pyr:
        a, b = im.scharr_gradients(lvl)
        gx.append(a)
        gy.append(b)
    return tuple(gx), tuple(gy)


def _frame_step_impl(
    state: FEState,
    img_u8: jnp.ndarray,
    lm_pos: jnp.ndarray,
    lm_is3d: jnp.ndarray,
    cam: Camera,
    levels: int = 3,
    use_clahe: bool = True,
    clahe_clip: float = 3.0,
    nklt_win: int = 9,
    nmax_iter: int = 30,
    fmax_px_precision: float = 0.01,
    fmax_fbklt_dist: float = 0.5,
    klt_err: float = 30.0,
    do_epipolar: bool = True,
    fransac_err: float = 3.0,
    robust_th2: float = 5.9915,
    n_ransac_hyps: int = 256,
    dop3p: bool = False,
    track_from_kf: bool = False,
):
    """One frame: preprocess + motion model + track + pose + stats.

    Returns (new_state, stats) where stats is a packed (12,) f32 vector:
    [pose_ok, n_tracked, n_3d, n_inliers, parallax_med, tx, ty, tz,
     qx, qy, qz, qw] — the full pose rides along so the host never has to
    fetch anything else at frame rate.
    """
    cur_pyr = preprocess(img_u8, levels, use_clahe, clahe_clip)
    cur_gx, cur_gy = _grad_pyrs(cur_pyr)
    # storage + gather dtype (see PYR_DT): the full-image preprocess ran f32;
    # everything downstream gathers small windows and computes f32 on them
    cur_pyr, cur_gx, cur_gy = (_cast_pyr(cur_pyr), _cast_pyr(cur_gx),
                               _cast_pyr(cur_gy))

    # motion model on device: T_prior = vel ∘ T_prev (constant velocity)
    T_prev = SE3(state.R_cw, state.t_cw)
    T_pred = lie.se3_compose(SE3(state.R_vel, state.t_vel), T_prev)
    R_prior = jnp.where(state.has_vel, T_pred.R, T_prev.R)
    t_prior = jnp.where(state.has_vel, T_pred.t, T_prev.t)

    key, sub = jax.random.split(state.key)
    use_kf_tmpl = track_from_kf and state.kf_pyr is not None
    tmpl_pyr = state.kf_pyr if use_kf_tmpl else state.pyr
    tmpl_g = (tuple(zip(state.kf_gx, state.kf_gy)) if use_kf_tmpl
              else tuple(zip(state.gx, state.gy)))
    res = track_frame(
        tmpl_pyr, cur_pyr, state.kps, lm_pos, lm_is3d, cam,
        R_prior, t_prior, state.R_cw, state.t_cw, sub,
        R_kf=state.R_kf,
        nklt_pyr_lvl=levels, nklt_win=nklt_win, nmax_iter=nmax_iter,
        fmax_px_precision=fmax_px_precision,
        fmax_fbklt_dist=fmax_fbklt_dist, klt_err=klt_err,
        do_epipolar=do_epipolar, fransac_err=fransac_err,
        robust_th2=robust_th2,
        n_ransac_hyps=n_ransac_hyps, dop3p=dop3p,
        prev_gpyr=tmpl_g,
        cur_gpyr=tuple(zip(cur_gx, cur_gy)),
        track_from_kf=use_kf_tmpl)

    # velocity update: vel = T_new ∘ T_prev^-1
    T_new = SE3(res.T_cw_R, res.T_cw_t)
    vel = lie.se3_compose(T_new, lie.se3_inverse(T_prev))

    new_state = FEState(
        pyr=cur_pyr, gx=cur_gx, gy=cur_gy, kps=res.kps,
        R_cw=res.T_cw_R, t_cw=res.T_cw_t,
        R_vel=vel.R, t_vel=vel.t, has_vel=jnp.asarray(True),
        R_kf=state.R_kf, key=key,
        kf_pyr=state.kf_pyr, kf_gx=state.kf_gx, kf_gy=state.kf_gy)
    stats = jnp.concatenate([
        jnp.stack([
            res.pose_ok.astype(jnp.float32),
            res.n_tracked.astype(jnp.float32),
            res.n_3d.astype(jnp.float32),
            res.n_inliers.astype(jnp.float32),
            res.parallax_med.astype(jnp.float32)]),
        res.T_cw_t,
        lie.quat_from_mat(res.T_cw_R)])
    return new_state, stats


frame_step = functools.partial(
    jax.jit,
    static_argnames=("levels", "use_clahe", "nklt_win", "nmax_iter",
                     "do_epipolar", "n_ransac_hyps", "dop3p",
                     "track_from_kf"),
    donate_argnums=(0,),
)(_frame_step_impl)


@functools.partial(
    jax.jit,
    static_argnames=("levels", "use_clahe", "nklt_win", "nmax_iter",
                     "do_epipolar", "n_ransac_hyps", "dop3p",
                     "track_from_kf"),
    donate_argnums=(0,),
)
def frame_chunk_step(
    state: FEState,
    imgs_u8: jnp.ndarray,          # (N, H, W) uint8
    lm_pos: jnp.ndarray,
    lm_is3d: jnp.ndarray,
    cam: Camera,
    levels: int = 3,
    use_clahe: bool = True,
    clahe_clip: float = 3.0,
    nklt_win: int = 9,
    nmax_iter: int = 30,
    fmax_px_precision: float = 0.01,
    fmax_fbklt_dist: float = 0.5,
    klt_err: float = 30.0,
    do_epipolar: bool = True,
    fransac_err: float = 3.0,
    robust_th2: float = 5.9915,
    n_ransac_hyps: int = 256,
    dop3p: bool = False,
    track_from_kf: bool = False,
):
    """Track N consecutive frames in ONE dispatch (lax.scan over the fused
    per-frame step): the host round trip amortizes over the chunk. Keyframe
    decisions quantize to chunk boundaries — the offline/throughput mode."""

    def body(st, img):
        st2, stats = _frame_step_impl(
            st, img, lm_pos, lm_is3d, cam, levels, use_clahe, clahe_clip,
            nklt_win, nmax_iter, fmax_px_precision, fmax_fbklt_dist,
            klt_err, do_epipolar, fransac_err, robust_th2,
            n_ransac_hyps, dop3p, track_from_kf)
        return st2, stats

    state2, stats = jax.lax.scan(body, state, imgs_u8)
    return state2, stats          # stats (N, 12)
