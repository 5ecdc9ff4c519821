"""Keyframe-rate mapping: detection, description, stereo matching,
triangulation.

Replaces the reference's Mapper + the detection/stereo side of MapManager
(reference: src/mapper.cpp, src/map_manager.cpp:286-611): on each keyframe —
detect new keypoints in free grid cells, BRIEF-describe everything, KLT-match
left->right with depth-based priors + epipolar gating, triangulate stereo
matches, and temporally triangulate leftover 2D keypoints against their
first-observing keyframe.

All compute is batched device code; the host only assembles anchor data and
commits results into the map store.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ov2slam_tpu.core import camera as cam_mod
from ov2slam_tpu.core import lie
from ov2slam_tpu.core.camera import Camera
from ov2slam_tpu.core.lie import SE3
from ov2slam_tpu.ops import detect as det_mod
from ov2slam_tpu.ops import describe as desc_mod
from ov2slam_tpu.ops import klt as klt_mod
from ov2slam_tpu.ops import mvg
from ov2slam_tpu.slam.frame import FrameKps


class StereoMatchResult(NamedTuple):
    rpx: jnp.ndarray        # (K, 2) right-image positions
    ok: jnp.ndarray         # (K,) bool — tracked + epipolar-consistent
    disp: jnp.ndarray       # (K,) disparity proxy (left.x - right.x)


@functools.partial(jax.jit, static_argnames=("cellsize", "detector", "fast_th"))
def detect_keypoints(
    img: jnp.ndarray,
    kps: FrameKps,
    cellsize: int,
    quality_th: jnp.ndarray,
    detector: str = "singlescale",
    fast_th: int = 10,
) -> det_mod.GridDetection:
    """Grid detection masked by current keypoints (MapManager::
    extractKeypoints, map_manager.cpp:286-341). detector selects the response
    map: "singlescale"/"gftt" = Shi-Tomasi min-eig (detectSingleScale /
    detectGFTT), "fast" = FAST-9 score (detectGridFAST)."""
    img = img.astype(jnp.float32)   # response math overflows in f16 storage
    if detector == "fast":
        resp = det_mod.fast_score(img, float(fast_th))
    else:
        resp = det_mod.min_eig_response(img)
    return det_mod.grid_select(resp, kps.px, kps.valid, cellsize, quality_th)


@functools.partial(
    jax.jit, static_argnames=("win", "max_disp"))
def sad_line_prior(
    left_img: jnp.ndarray,
    right_img: jnp.ndarray,
    px: jnp.ndarray,          # (N, 2)
    win: int = 9,
    max_disp: int = 128,
):
    """Best-SAD disparity along the rectified epipolar row, batched
    (FeatureTracker::getLineMinSAD, feature_tracker.cpp:140-206: the
    reference slides a window leftward pixel by pixel per keypoint; here
    ONE strip extraction per keypoint + max_disp+1 shifted window SADs run
    as dense device math).

    Returns (x_prior (N,), sad_min (N,)) — the right-image x coordinate of
    the best window and its mean L1 error."""
    H, W = left_img.shape
    half = win // 2
    ix = jnp.clip(jnp.round(px[:, 0]).astype(jnp.int32), half, W - 1 - half)
    iy = jnp.clip(jnp.round(px[:, 1]).astype(jnp.int32), half, H - 1 - half)

    def slice_l(x, y):
        return jax.lax.dynamic_slice(
            left_img, (y - half, x - half), (win, win))

    tmpl = jax.vmap(slice_l)(ix, iy).astype(jnp.float32)  # (N, win, win)
    SW = win + max_disp
    sx = jnp.clip(ix - max_disp - half, 0, W - SW)

    def slice_r(x, y):
        return jax.lax.dynamic_slice(right_img, (y - half, x), (win, SW))

    strip = jax.vmap(slice_r)(sx, iy).astype(jnp.float32)  # (N, win, SW)
    sads = jnp.stack(
        [jnp.mean(jnp.abs(strip[:, :, s:s + win] - tmpl), axis=(1, 2))
         for s in range(max_disp + 1)], axis=1)          # (N, max_disp+1)
    # a window centered right of the keypoint's x means negative disparity —
    # the reference's leftward-only scan (feature_tracker.cpp:140-206) never
    # produces one, and KLT can lock onto it near the left border where sx
    # clamps to 0 (advisor r2 #4); mask those shifts out of the argmin
    centers = sx[:, None] + jnp.arange(max_disp + 1)[None, :] + half
    sads = jnp.where(centers <= ix[:, None], sads, jnp.inf)
    best = jnp.argmin(sads, axis=1)
    x_best = (sx + best + half).astype(jnp.float32)
    return x_best, jnp.min(sads, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("nlevels", "win", "max_iters", "use_sad_prior"))
def stereo_match(
    left_pyr: Tuple[jnp.ndarray, ...],
    right_pyr: Tuple[jnp.ndarray, ...],
    kps: FrameKps,
    lm_pos: jnp.ndarray,
    lm_is3d: jnp.ndarray,
    cam_l: Camera,
    cam_r: Camera,
    R_cw: jnp.ndarray,
    t_cw: jnp.ndarray,
    R_rl: jnp.ndarray,
    t_rl: jnp.ndarray,
    depth_prior: jnp.ndarray,     # scalar — median scene depth for 2D kps
    nlevels: int = 3,
    win: int = 9,
    max_iters: int = 30,
    fb_dist: float = 0.5,
    klt_err: float = 30.0,
    epi_th_px: float = 2.0,
    use_sad_prior: bool = False,
) -> StereoMatchResult:
    """Left->right KLT with depth-based priors + epipolar gate
    (MapManager::stereoMatching, map_manager.cpp:367-611). The reference
    seeds rectified pairs with the SAD row scan and unrectified ones from
    3D projection; with use_sad_prior (rows aligned) the 2D keypoints get
    the batched SAD disparity prior, 3D keypoints keep the projection."""
    T_rl = SE3(R_rl, t_rl)
    T_cw = SE3(R_cw, t_cw)

    # prior: project each keypoint's 3D ray at its (known or guessed) depth
    slot = jnp.clip(kps.lmid, 0, lm_pos.shape[0] - 1)
    kp3d = kps.valid & kps.is3d & lm_is3d[slot]
    Xw = lm_pos[slot]
    Xl_3d = lie.se3_apply(T_cw, Xw)
    Xl_guess = kps.bv * (depth_prior / jnp.maximum(kps.bv[:, 2], 1e-6))[:, None]
    Xl = jnp.where(kp3d[:, None], Xl_3d, Xl_guess)
    prior = cam_mod.project_cam_to_image_dist(cam_r, lie.se3_apply(T_rl, Xl))
    prior_ok = cam_mod.in_image(cam_r, prior, border=win)
    prior = jnp.where(prior_ok[:, None], prior, kps.px)
    if use_sad_prior:
        x_sad, _ = sad_line_prior(left_pyr[0], right_pyr[0], kps.px, win=win)
        sad_prior = jnp.stack([x_sad, kps.px[:, 1]], axis=-1)
        prior = jnp.where(kp3d[:, None], prior, sad_prior)

    res = klt_mod.fb_klt_tracking(
        left_pyr, right_pyr, kps.px, prior, kps.valid,
        nlevels=nlevels, win=win, max_iters=max_iters,
        eps=0.01, max_fb_dist=fb_dist, max_err=klt_err)

    # epipolar consistency under the known extrinsics
    unpx_r = cam_mod.undistort_px(cam_r, res.points)
    bv_r = cam_mod.bearing_from_undist_px(cam_r, unpx_r)
    E_lr = mvg.essential_from_pose(lie.se3_inverse(T_rl))  # b_l^T E b_r = 0
    focal = 0.5 * (cam_l.fx + cam_l.fy)
    epi = mvg.epipolar_line_dist(E_lr, kps.bv, bv_r) * focal
    ok = res.status & (epi < epi_th_px) & cam_mod.in_image(cam_r, res.points)
    disp = kps.px[:, 0] - res.points[:, 0]
    return StereoMatchResult(rpx=res.points, ok=ok, disp=disp)


class StereoTriResult(NamedTuple):
    Xw: jnp.ndarray         # (K, 3) world positions
    depth: jnp.ndarray      # (K,) left-cam depth
    ok: jnp.ndarray         # (K,)


@jax.jit
def triangulate_stereo(
    kps: FrameKps,
    rpx: jnp.ndarray,
    match_ok: jnp.ndarray,
    cam_r: Camera,
    R_cw: jnp.ndarray,
    t_cw: jnp.ndarray,
    R_rl: jnp.ndarray,
    t_rl: jnp.ndarray,
    max_depth: float = 200.0,
    min_depth: float = 0.05,
) -> StereoTriResult:
    """Stereo triangulation (Mapper::triangulateStereo, mapper.cpp:346-461):
    midpoint triangulation of left/right bearings, chirality + range gates,
    output in world frame."""
    T_rl = SE3(R_rl, t_rl)
    T_lr = lie.se3_inverse(T_rl)
    T_wc = lie.se3_inverse(SE3(R_cw, t_cw))
    unpx_r = cam_mod.undistort_px(cam_r, rpx)
    bv_r = cam_mod.bearing_from_undist_px(cam_r, unpx_r)
    Xl = mvg.triangulate_midpoint(T_lr, kps.bv, bv_r)
    depth = Xl[:, 2]
    Xr = lie.se3_apply(T_rl, Xl)
    ok = match_ok & (depth > min_depth) & (depth < max_depth) & (Xr[:, 2] > 0)
    Xw = lie.se3_apply(T_wc, Xl)
    return StereoTriResult(Xw=Xw, depth=depth, ok=ok)


class TemporalTriResult(NamedTuple):
    Xw: jnp.ndarray
    depth_anchor: jnp.ndarray
    ok: jnp.ndarray


@jax.jit
def triangulate_temporal(
    kps: FrameKps,
    R_cw: jnp.ndarray, t_cw: jnp.ndarray,          # current KF world-to-cam
    anc_R_cw: jnp.ndarray, anc_t_cw: jnp.ndarray,  # (K, 3, 3), (K, 3) per-kp anchor poses
    anc_bv: jnp.ndarray,                           # (K, 3) bearing at anchor
    anc_ok: jnp.ndarray,                           # (K,) has valid anchor data
    cam: Camera,
    min_trans: jnp.ndarray = 0.0,                  # stereo: skip if |t| < 1 cm
    max_reproj_px: float = 3.0,
    max_depth: float = 200.0,
) -> TemporalTriResult:
    """Two-view temporal triangulation against the first observing keyframe
    (Mapper::triangulateTemporal, mapper.cpp:191-344). Gates mirror the
    reference EXACTLY: chirality (z > 0.1 in both views) and reprojection
    error < fmax_reproj_err in BOTH views — there is no minimum-parallax
    gate (round-3 bug: an invented 10 px parallax gate starved the
    monocular bootstrap into a reset loop; the reference only uses parallax
    to decide whether a failed candidate's observation is removed,
    mapper.cpp:306-330). In stereo mode candidates with < 1 cm baseline are
    skipped (mapper.cpp:287-289)."""
    T_cur = SE3(R_cw, t_cw)
    T_anc = SE3(anc_R_cw, anc_t_cw)
    # anchor-to-current transform per keypoint
    T_ca = lie.se3_compose(T_cur, lie.se3_inverse(T_anc))   # batched
    # triangulate in anchor frame: rays anc_bv (anchor), kps.bv (current)
    T_ac = lie.se3_inverse(T_ca)

    def tri_one(Tac_R, Tac_t, b_a, b_c):
        return mvg.triangulate_midpoint(SE3(Tac_R, Tac_t), b_a, b_c)

    Xa = jax.vmap(tri_one)(T_ac.R, T_ac.t, anc_bv, kps.bv)  # (K, 3) anchor frame
    depth_a = Xa[:, 2]
    Xc = lie.se3_apply(T_ca, Xa)
    depth_c = Xc[:, 2]

    # reprojection error in BOTH views (mapper.cpp:317-325)
    reproj_c = cam_mod.project_cam_to_image(cam, Xc)
    err_c = jnp.linalg.norm(reproj_c - kps.unpx, axis=-1)
    reproj_a = cam_mod.project_cam_to_image(cam, Xa)
    anc_unpx = cam_mod.project_cam_to_image(cam, anc_bv)
    err_a = jnp.linalg.norm(reproj_a - anc_unpx, axis=-1)

    ok = (
        anc_ok & kps.valid
        & (jnp.linalg.norm(T_ca.t, axis=-1) >= min_trans)
        & (depth_a > 0.1) & (depth_c > 0.1)
        & (depth_a < max_depth)
        & (err_c < max_reproj_px) & (err_a < max_reproj_px)
    )
    T_wa = lie.se3_inverse(T_anc)
    Xw = lie.se3_apply(T_wa, Xa)
    return TemporalTriResult(Xw=Xw, depth_anchor=depth_a, ok=ok)


def describe_frame(img: jnp.ndarray, kps: FrameKps):
    """BRIEF for every valid keypoint (map_manager.cpp:286-341)."""
    return desc_mod.describe_brief(img, kps.px, kps.valid)


class LocalMapMatchResult(NamedTuple):
    kp_slot: jnp.ndarray     # (M,) int32 matched keypoint slot (-1 = none)
    ok: jnp.ndarray          # (M,) bool


@jax.jit
def match_to_local_map(
    kps: FrameKps,
    kp_desc: jnp.ndarray,        # (K, 8) uint32 current-frame descriptors
    kp_desc_ok: jnp.ndarray,     # (K,)
    kp_matchable: jnp.ndarray,   # (K,) bool — kps eligible to be merged
    cand_pos: jnp.ndarray,       # (M, 3) local-map landmark positions
    cand_desc: jnp.ndarray,      # (M, 8) uint32
    cand_valid: jnp.ndarray,     # (M,)
    cam: Camera,
    R_cw: jnp.ndarray,
    t_cw: jnp.ndarray,
    max_px_dist: float = 2.0,
    max_desc_dist: float = 0.2,
    ratio: float = 0.9,
) -> LocalMapMatchResult:
    """Match unobserved local-map landmarks to this keyframe's keypoints
    (Mapper::matchToMap, mapper.cpp:576-774): project each candidate, gate by
    pixel distance, descriptor distance + two-best ratio test.

    All-pairs (M, K) on device; the Hamming matrix is one XOR+popcount pass.
    """
    T_cw = SE3(R_cw, t_cw)
    Xc = lie.se3_apply(T_cw, cand_pos)
    proj = cam_mod.project_cam_to_image_dist(cam, Xc)
    vis = cand_valid & (Xc[:, 2] > 0.1) & cam_mod.in_image(cam, proj)

    # pixel distance gate (M, K)
    d_px = jnp.linalg.norm(proj[:, None, :] - kps.px[None, :, :], axis=-1)
    kp_ok = kps.valid & kp_desc_ok & kp_matchable
    gate = (d_px <= max_px_dist) & kp_ok[None, :] & vis[:, None]

    # descriptor distances
    d_h = desc_mod.hamming_matrix(cand_desc, kp_desc).astype(jnp.float32)
    BIG = 1e9
    d = jnp.where(gate, d_h, BIG)
    best = jnp.argmin(d, axis=1)
    bestd = jnp.min(d, axis=1)
    d2 = d.at[jnp.arange(d.shape[0]), best].set(BIG)
    secondd = jnp.min(d2, axis=1)

    th = max_desc_dist * 256.0
    ok = vis & (bestd <= th) & (bestd <= ratio * secondd)
    return LocalMapMatchResult(
        kp_slot=jnp.where(ok, best.astype(jnp.int32), -1), ok=ok)


class KFStepResult(NamedTuple):
    """Everything the host needs from one keyframe's device work."""
    kps: FrameKps            # updated keypoint table (new detections, stereo)
    desc: jnp.ndarray        # (K, 8) uint32
    desc_ok: jnp.ndarray     # (K,)
    tri_ok: jnp.ndarray      # (K,) stereo-triangulation success
    tri_Xw: jnp.ndarray      # (K, 3)
    tri_depth: jnp.ndarray   # (K,)
    med_depth: jnp.ndarray   # scalar — median stereo depth (prior update)
    # extra place-recognition corners outside the keypoint mask (the
    # reference adds <=300 FAST/BRIEF features for the BoW vocabulary,
    # loop_closer.cpp:89-140)
    extra_desc: jnp.ndarray  # (C, 8) uint32
    extra_ok: jnp.ndarray    # (C,)
    # temporal triangulation vs each kp's first-observing keyframe
    tt_ok: jnp.ndarray       # (K,)
    tt_Xw: jnp.ndarray       # (K, 3)
    tt_depth_anchor: jnp.ndarray  # (K,)


@functools.partial(
    jax.jit,
    static_argnames=("cellsize", "detector", "fast_th", "nlevels", "win",
                     "max_iters", "stereo", "use_sad_prior"),
    donate_argnums=(2,),
)
def kf_step(
    left_pyr: Tuple[jnp.ndarray, ...],
    right_pyr: Tuple[jnp.ndarray, ...],
    kps: FrameKps,
    lm_pos: jnp.ndarray,
    lm_is3d: jnp.ndarray,
    cam_l: Camera,
    cam_r: Camera,
    R_cw: jnp.ndarray,
    t_cw: jnp.ndarray,
    R_rl: jnp.ndarray,
    t_rl: jnp.ndarray,
    quality_th: jnp.ndarray,
    cand_lmids: jnp.ndarray,      # (C,) fresh landmark ids, one per grid cell
    depth_prior: jnp.ndarray,
    # temporal-triangulation anchor data, host-assembled from the previous
    # keyframe's record (valid only while the slot still holds anc_lmid)
    anc_R: jnp.ndarray,           # (K, 3, 3) anchor world-to-cam
    anc_t: jnp.ndarray,           # (K, 3)
    anc_bv: jnp.ndarray,          # (K, 3) anchor-frame bearing
    anc_lmid: jnp.ndarray,        # (K,) landmark the anchor data refers to
    anc_ok: jnp.ndarray,          # (K,)
    cellsize: int,
    detector: str = "singlescale",
    fast_th: int = 10,
    nlevels: int = 3,
    win: int = 9,
    max_iters: int = 30,
    fb_dist: float = 0.5,
    klt_err: float = 30.0,
    epi_th_px: float = 2.0,
    stereo: bool = True,
    use_sad_prior: bool = False,
) -> KFStepResult:
    """The whole device side of keyframe creation in ONE dispatch:
    grid detection -> keypoint insertion -> BRIEF description -> stereo
    matching -> stereo triangulation. The host commits the results to the
    map registry from a single overlapped fetch (the KF path previously had
    ~6 separate dispatch+fetch groups; each blocking round trip costs ~30 ms
    on the tunneled TPU)."""
    # pyramids may be stored f16 (frontend.PYR_DT); detection responses /
    # descriptors / subpix run f32 (min-eig squares overflow f16)
    img = left_pyr[0].astype(jnp.float32)

    # ---- detect + insert ----
    # "singlescale" = per-cell min-eig max (detectSingleScale,
    # feature_extractor.cpp:288-440); "fast" = per-cell FAST-9 best
    # (detectGridFAST, :443-570); "gftt" (use_shi_tomasi) = min-eig grid +
    # cornerSubPix refinement (detectGFTT, :104-221 — its two-pass
    # quality-halving is covered by the host's adaptive quality state).
    if detector == "fast":
        resp = det_mod.fast_score(img, float(fast_th))
    else:
        resp = det_mod.min_eig_response(img)
    # confine detection to the camera's valid ROI (after stereo
    # rectification the image has extrapolated border bands whose smeared
    # edges attract corners; reference: camera_calibration.cpp:72-75 ROI
    # masks). No-op when the ROI is the full image.
    ys = jnp.arange(img.shape[0], dtype=img.dtype)[:, None]
    xs = jnp.arange(img.shape[1], dtype=img.dtype)[None, :]
    roi = ((xs >= cam_l.roi_x0) & (xs < cam_l.roi_x1)
           & (ys >= cam_l.roi_y0) & (ys < cam_l.roi_y1))
    resp = jnp.where(roi, resp, 0.0)
    det = det_mod.grid_select(resp, kps.px, kps.valid, cellsize, quality_th)
    if detector == "gftt":
        det = det._replace(
            points=det_mod.corner_subpix(img, det.points, det.valid))
    from ov2slam_tpu.slam import frame as frame_mod
    kps2 = frame_mod.insert_keypoints(
        kps, cam_l, det.points, det.valid, cand_lmids)

    # ---- describe ----
    desc, desc_ok = desc_mod.describe_brief(img, kps2.px, kps2.valid)

    # ---- extra corners for place recognition: secondary per-cell peaks
    # (outside the occupied discs by construction) ----
    extra_desc, extra_ok = desc_mod.describe_brief(
        img, det.points2, det.valid2)

    def temporal(kpsX):
        guard = (anc_ok & (kpsX.lmid == anc_lmid) & kpsX.valid
                 & ~kpsX.is3d & (kpsX.lmid >= 0))
        tt = triangulate_temporal(
            kpsX._replace(valid=guard), R_cw, t_cw,
            anc_R, anc_t, anc_bv, guard, cam_l,
            min_trans=0.01 if stereo else 0.0)
        kpsY = kpsX._replace(is3d=kpsX.is3d | (tt.ok & kpsX.valid))
        return kpsY, tt

    if not stereo:
        z = jnp.zeros(kps2.cap, img.dtype)
        kps2b, tt = temporal(kps2)
        return KFStepResult(
            kps=kps2b, desc=desc, desc_ok=desc_ok,
            tri_ok=jnp.zeros(kps2.cap, bool),
            tri_Xw=jnp.zeros((kps2.cap, 3), img.dtype), tri_depth=z,
            med_depth=depth_prior, extra_desc=extra_desc, extra_ok=extra_ok,
            tt_ok=tt.ok, tt_Xw=tt.Xw, tt_depth_anchor=tt.depth_anchor)

    # ---- stereo match + triangulate ----
    sm = stereo_match(
        left_pyr, right_pyr, kps2, lm_pos, lm_is3d, cam_l, cam_r,
        R_cw, t_cw, R_rl, t_rl, depth_prior,
        nlevels=nlevels, win=win, max_iters=max_iters, fb_dist=fb_dist,
        klt_err=klt_err, epi_th_px=epi_th_px, use_sad_prior=use_sad_prior)
    tri = triangulate_stereo(kps2, sm.rpx, sm.ok, cam_r, R_cw, t_cw, R_rl, t_rl)

    good = tri.ok & kps2.valid
    med = jnp.nanmedian(jnp.where(good, tri.depth, jnp.nan))
    med = jnp.where(jnp.isfinite(med) & (jnp.sum(good) > 5), med, depth_prior)

    slot = jnp.clip(kps2.lmid, 0, lm_pos.shape[0] - 1)
    newly = tri.ok & kps2.valid & (kps2.lmid >= 0) & ~(kps2.is3d & lm_is3d[slot])
    unrpx = cam_mod.undistort_px(cam_r, sm.rpx)
    has_right = sm.ok & kps2.valid
    kps3 = kps2._replace(
        is3d=kps2.valid & (kps2.is3d | newly),
        rpx=jnp.where(has_right[:, None], unrpx, 0.0).astype(unrpx.dtype),
        has_right=has_right)
    kps4, tt = temporal(kps3)
    return KFStepResult(
        kps=kps4, desc=desc, desc_ok=desc_ok, tri_ok=tri.ok,
        tri_Xw=tri.Xw, tri_depth=tri.depth, med_depth=med,
        extra_desc=extra_desc, extra_ok=extra_ok,
        tt_ok=tt.ok, tt_Xw=tt.Xw, tt_depth_anchor=tt.depth_anchor)
