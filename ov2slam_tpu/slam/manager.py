"""SlamSystem: the orchestrator wiring front end, mapper, estimator.

Replaces the reference's SlamManager (reference: src/ov2slam.cpp:33-237):
calibration setup, the per-frame loop (tracking -> KF decision -> keyframe
processing -> local BA), reset, and results writing.

The reference's 4-thread mutex/queue pipeline becomes a host control loop
issuing ONE fused device call per frame (frontend.frame_step) against
device-resident state. The environment's host<->device link has ~30 ms
latency per blocking round trip, so the design rule is: at frame rate, one
dispatch + one small async-copied stats vector; everything else (keyframe
processing, BA, registry bookkeeping) happens at keyframe rate.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ov2slam_tpu.config import SlamParams
from ov2slam_tpu.core import camera as cam_mod
from ov2slam_tpu.core import lie
from ov2slam_tpu.core.camera import Camera
from ov2slam_tpu.core.lie import SE3
from ov2slam_tpu.io.profiler import Profiler
from ov2slam_tpu.io.trajectories import TrajectoryLogger
from ov2slam_tpu.ops import detect as det_mod
from ov2slam_tpu.slam import frame as frame_mod
from ov2slam_tpu.slam import frontend as fe_mod
from ov2slam_tpu.slam import mapper as mapper_mod
from ov2slam_tpu.slam.estimator import Estimator
from ov2slam_tpu.slam.loopcloser import LoopCloser
from ov2slam_tpu.slam.frame import FrameKps
from ov2slam_tpu.slam.map import KeyframeRecord, MapStore
from ov2slam_tpu.utils import fetch_np


@jax.jit
def _refresh_flags_dev(lmid, valid, lm_valid, lm_is3d):
    slot = jnp.clip(lmid, 0, lm_valid.shape[0] - 1)
    alive = lm_valid[slot] & (lmid >= 0)
    return valid & alive, valid & alive & lm_is3d[slot]


def _with_rect_roi(cam, grid) -> "Camera":
    """Camera with its ROI set to the inner rectangle of remap-grid source
    coords that land inside the raw image (cv::stereoRectify validPixROI /
    the reference's ROI masks, camera_calibration.cpp:72-75)."""
    import dataclasses
    g = np.asarray(grid)
    Hs, Ws = g.shape[:2]
    v = ((g[..., 0] >= 0) & (g[..., 0] <= cam.width - 1)
         & (g[..., 1] >= 0) & (g[..., 1] <= cam.height - 1))
    rows = np.where(v.mean(axis=1) > 0.5)[0]
    if len(rows) == 0:
        return cam
    y0, y1 = int(rows[0]), int(rows[-1]) + 1
    sub = v[y0:y1]
    first = np.argmax(sub, axis=1)
    last = sub.shape[1] - 1 - np.argmax(sub[:, ::-1], axis=1)
    x0, x1 = int(first.max()), int(last.min()) + 1
    fully = v[:, x0:x1].all(axis=1) if x1 > x0 else np.zeros(Hs, bool)
    ys = np.where(fully)[0]
    if len(ys):
        y0, y1 = int(ys[0]), int(ys[-1]) + 1
    dt = cam.fx.dtype
    return dataclasses.replace(
        cam,
        roi_x0=jnp.asarray(float(x0), dt), roi_y0=jnp.asarray(float(y0), dt),
        roi_x1=jnp.asarray(float(x1), dt), roi_y1=jnp.asarray(float(y1), dt))


def _to_device_u8(img) -> jnp.ndarray:
    """Image (host float/uint8 OR device array, e.g. a rectified frame kept
    on device) -> device uint8, without a host round trip."""
    if isinstance(img, jnp.ndarray):
        return img.astype(jnp.uint8)
    return jax.device_put(np.ascontiguousarray(img).astype(np.uint8))


def _mat_from_quat_np(q: np.ndarray) -> np.ndarray:
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], np.float32)


class SlamSystem:
    """Stereo (and later mono) SLAM pipeline."""

    def __init__(self, params: SlamParams):
        self.params = params
        p = params
        # f32 geometry on the MXU needs full-precision passes (see
        # SlamParams.matmul_precision); image-heavy kernels that tolerate
        # bf16 opt back down locally.
        jax.config.update("jax_default_matmul_precision", p.matmul_precision)

        self.cam_l = Camera.make(
            p.cam_left_model, p.fxl, p.fyl, p.cxl, p.cyl,
            np.array([p.k1l, p.k2l, p.p1l, p.p2l], np.float32),
            p.img_left_w, p.img_left_h)
        self.cam_r = Camera.make(
            p.cam_right_model, p.fxr, p.fyr, p.cxr, p.cyr,
            np.array([p.k1r, p.k2r, p.p1r, p.p2r], np.float32),
            p.img_right_w, p.img_right_h)
        # T_left_right maps right-cam coords into left-cam coords
        # (slam_params.cpp:86); we keep T_rl = right-from-left.
        if p.T_left_right is not None:
            T_lr = np.asarray(p.T_left_right, np.float32)
            self.T_rl = lie.se3_inverse(
                SE3(jnp.asarray(T_lr[:3, :3]), jnp.asarray(T_lr[:3, 3])))
        else:
            self.T_rl = SE3.identity()

        # optional stereo rectification (bdo_stereo_rect): precompute remap
        # grids once (camera_calibration.cpp setUndistStereoMap semantics);
        # after rectification both cameras share K_new and zero distortion,
        # and the extrinsic becomes a pure x-baseline.
        self.rect_maps = None
        if p.bdo_stereo_rect and p.stereo and (
                np.abs([p.k1l, p.k2l, p.k1r, p.k2r]).max() > 1e-9
                or p.T_left_right is not None
                and np.abs(np.asarray(p.T_left_right)[:3, :3] - np.eye(3)).max() > 1e-6):
            R1, R2, K_new, fb = cam_mod.stereo_rectify(
                self.cam_l, self.cam_r, self.T_rl, alpha=p.alpha)
            g_l = cam_mod.compute_undist_rect_map(
                self.cam_l, R_rect=R1, K_new=jnp.asarray(K_new, jnp.float32))
            g_r = cam_mod.compute_undist_rect_map(
                self.cam_r, R_rect=R2, K_new=jnp.asarray(K_new, jnp.float32))
            self.rect_maps = (jnp.asarray(g_l), jnp.asarray(g_r))
            self.cam_l = cam_mod.camera_with_intrinsics(self.cam_l, K_new, zero_dist=True)
            self.cam_r = cam_mod.camera_with_intrinsics(self.cam_r, K_new, zero_dist=True)
            # valid-pixel ROI of the rectified view (the reference's ROI
            # masks, camera_calibration.cpp:72-75): outside it the remap
            # extrapolates border bands that corrupt detection/tracking
            self.cam_l = _with_rect_roi(self.cam_l, g_l)
            self.cam_r = _with_rect_roi(self.cam_r, g_r)
            baseline = float(np.linalg.norm(np.asarray(self.T_rl.t)))
            self.T_rl = SE3(jnp.eye(3, dtype=jnp.float32),
                            jnp.asarray([-baseline, 0.0, 0.0], jnp.float32))

        # bdo_undist: undistort-remap incoming images (reference applies
        # rectifyImage at image intake when bdo_undist and no stereo rect,
        # ov2slam.cpp:66-71, :241-259); afterwards both cameras are treated
        # as distortion-free with their original K
        self._undistorted = False
        if (self.rect_maps is None and p.bdo_undist
                and np.abs([p.k1l, p.k2l, p.p1l, p.p2l,
                            p.k1r, p.k2r, p.p1r, p.p2r]).max() > 1e-12):
            g_l = cam_mod.compute_undist_rect_map(self.cam_l)
            if p.stereo:
                g_r = cam_mod.compute_undist_rect_map(self.cam_r)
                self.rect_maps = (jnp.asarray(g_l), jnp.asarray(g_r))
            else:
                self.rect_maps = (jnp.asarray(g_l),)
            self.cam_l = cam_mod.camera_with_intrinsics(
                self.cam_l, np.asarray(self.cam_l.K), zero_dist=True)
            if p.stereo:
                self.cam_r = cam_mod.camera_with_intrinsics(
                    self.cam_r, np.asarray(self.cam_r.K), zero_dist=True)
            self.cam_l = _with_rect_roi(self.cam_l, g_l)
            if p.stereo:
                self.cam_r = _with_rect_roi(self.cam_r, g_r)
            self._undistorted = True

        # rectified-row geometry? (rectification performed, or the input is
        # born-rectified: zero distortion + pure x-baseline extrinsics) —
        # gates the SAD line-search stereo prior, which the reference uses
        # exactly when bdo_stereo_rect (map_manager.cpp:439-470)
        pure_baseline = (
            np.abs(np.asarray(self.T_rl.R) - np.eye(3)).max() < 1e-6
            and np.abs(np.asarray(self.T_rl.t)[1:]).max() < 1e-6)
        zero_dist = (self._undistorted
                     or np.abs([p.k1l, p.k2l, p.k1r, p.k2r]).max() < 1e-9)
        rectified = self.rect_maps is not None and not self._undistorted
        self._rows_aligned = bool(p.stereo and (
            rectified or (pure_baseline and zero_dist)))

        import warnings
        if p.use_subspace_dogleg and not p.use_dogleg:
            warnings.warn(
                "use_subspace_dogleg runs the plain Powell dogleg (the "
                "two-segment subspace restriction, not Ceres's full 2D "
                "subspace minimization)", stacklevel=2)
        if not p.do_klt or not p.klt_use_prior:
            warnings.warn(
                "do_klt=0 / klt_use_prior=0 are not supported: the fused "
                "tracking step always runs prior-seeded forward-backward KLT "
                "(reference: visual_front_end.cpp:161-187); the flags are "
                "ignored", stacklevel=2)
        if p.use_nonmonotic_step:
            warnings.warn(
                "use_nonmonotic_step is not implemented in the device LM "
                "solver (monotone accept/reject only); the flag is ignored",
                stacklevel=2)
        if not p.use_brief:
            warnings.warn(
                "use_brief=0 (the ORB descriptor fallback, "
                "feature_extractor.cpp:245-248) is not supported: no shipped "
                "reference preset enables it, so only BRIEF-256 is built; "
                "the flag is ignored", stacklevel=2)

        # multi-chip mesh for sharded BA (n_devices > 1); the mesh is built
        # once and shared by every Estimator the resets create
        self.mesh = None
        if p.n_devices and p.n_devices > 1:
            from ov2slam_tpu.parallel import sharded
            self.mesh = sharded.make_mesh(p.n_devices)

        self.kp_cap = p.kp_cap
        self.logger = TrajectoryLogger()
        self.prof = Profiler.instance()
        self.prof.enabled = p.log_timings
        self.reset()
        # background ahead-of-time compile of the keyframe-rate / loop-
        # closure jit families (round-5: a loop closure's first-encounter
        # trace+compile stalled the live pipeline for tens of seconds on the
        # tunneled TPU). XLA compilation releases the GIL, so this overlaps
        # tracking; jit caches are per-function, so warming with dummy
        # problems warms the live path regardless of later reset()s.
        self._prewarm_thread = None
        # CPU backend: compilation happens on the (often single) host core,
        # so a background prewarm thread steals exactly the resource the
        # pipeline needs AND races the main thread inside the XLA CPU
        # compiler (observed SIGSEGV under pytest); prewarm only pays off
        # when compilation targets a remote accelerator.
        if p.prewarm and jax.default_backend() != "cpu":
            import threading
            self._prewarm_thread = threading.Thread(
                target=self._prewarm, daemon=True)
            self._prewarm_thread.start()

    # ------------------------------------------------------------------
    def _prewarm(self):
        p = self.params
        try:
            self.estimator.prewarm()
        except Exception as e:       # pragma: no cover - never sink tracking
            import logging
            logging.getLogger("ov2slam_tpu").warning("BA prewarm failed: %r", e)
        if self.loopcloser is not None:
            try:
                n_cells = ((self.cam_l.height // p.nmaxdist)
                           * (self.cam_l.width // p.nmaxdist))
                self.loopcloser.prewarm(self.kp_cap, int(n_cells))
            except Exception as e:   # pragma: no cover
                import logging
                logging.getLogger("ov2slam_tpu").warning(
                    "LC prewarm failed: %r", e)

    # ------------------------------------------------------------------
    def reset(self):
        """Full pipeline reset (reference: SlamManager::reset,
        ov2slam.cpp:427-454)."""
        p = self.params
        self.map = MapStore(p.lm_capacity, kf_capacity=p.kf_capacity)
        # 3 workers: per-frame stats fetches must not queue behind the big
        # keyframe-bundle / BA-result fetches (each can wait tens of ms on
        # the in-order device queue)
        from concurrent.futures import ThreadPoolExecutor
        self._fetcher = ThreadPoolExecutor(max_workers=8)
        self.estimator = Estimator(
            p, fe_mod.calib_of(self.cam_l), fe_mod.calib_of(self.cam_r),
            self.T_rl, fetcher=self._fetcher, mesh=self.mesh)
        self.loopcloser = (LoopCloser(p, self.cam_l, self.estimator)
                           if p.buse_loop_closer else None)
        self.last_loop_event = None
        # cumulative across resets (observability for multi-loop benches)
        self.loop_events = getattr(self, "loop_events", [])
        self.fe_state: Optional[fe_mod.FEState] = None
        self.T_cw = np.eye(4, dtype=np.float32)
        self.initialized = False
        self.frame_id = -1
        self.frames_since_kf = 0
        self.n_kps_at_kf = 0
        self.n3d_at_kf = 0
        self.kf_time = 0.0
        self.cur_kfid = -1
        self.detector_quality = p.dmaxquality
        self.median_depth = 5.0
        # pipelined (force_realtime) mode: a FIFO of in-flight frames whose
        # stats transfers were started at dispatch (copy_to_host_async);
        # frame i-k is finalized when frame i arrives, so the ~30 ms
        # host<->device round trip hides behind k frames of device work.
        # The reference gets the same effect from its free-running threads +
        # frame dropping (ov2slam.cpp:291-298). BA is likewise dispatched at
        # one KF and written back at the next.
        from collections import deque
        self._inflight = deque()
        # cumulative world-frame pose correction (right factor on T_cw).
        # World-side right factors commute with camera-side tracking
        # increments (T_rel @ (T_cw @ dC) = (T_rel @ T_cw) @ dC), so a
        # correction that lands while frames are in flight can be applied
        # exactly at finalize time: each in-flight entry records the
        # cumulative factor at dispatch, and finalize right-multiplies the
        # stats pose by corr_at_dispatch^-1 @ corr_now. Without this, the
        # logged poses of up to pipeline_depth frames after every BA
        # writeback / loop closure silently lose the correction.
        self._corr_cw = np.eye(4, dtype=np.float64)
        self._pending_ba = None
        # staged keyframe commit (deferred mode): the kf_step fetch bundle
        # commits KF_COMMIT_LAG frames after dispatch, the local-map match one
        # frame later, BA writeback after BA_LAG frames — each stage's device
        # work + transfers overlap the tracking frames in between.
        self._pending_kf = None
        self._pending_lmm = None
        self._ba_age = 0
        self._lost_frames = 0
        # tracking-chain generation: bumped by relocalization, whose pose
        # jump CANNOT be folded into _corr_cw (the pre-loss chain is garbage,
        # not off by a right factor). In-flight frames dispatched under an
        # older generation skip their pose write at finalize so they can't
        # regress the relocalized pose (advisor r4 #2).
        self._chain_gen = 0
        self._last_imr = None

    # ------------------------------------------------------------------
    @property
    def kps(self) -> FrameKps:
        return self.fe_state.kps

    def _set_kps(self, kps: FrameKps):
        self.fe_state = self.fe_state._replace(kps=kps)

    def _cur_pyr(self):
        return self.fe_state.pyr

    def _key(self, i: int):
        """RANSAC PRNG key. bdo_random=0 pins every draw to a fixed key
        (the reference passes bdo_random into OpenGV's RANSAC to choose
        randomized vs deterministic sampling, multi_view_geometry.cpp:207)."""
        return jax.random.PRNGKey(i if self.params.bdo_random else 0)

    def _sync_pose_to_device(self):
        """Push the host pose (after BA writeback) into device state."""
        self.fe_state = self.fe_state._replace(
            R_cw=jnp.asarray(self.T_cw[:3, :3]),
            t_cw=jnp.asarray(self.T_cw[:3, 3]))

    def _late_corrected(self, T_cw: np.ndarray, corr) -> np.ndarray:
        """Fold corrections that landed after this frame's dispatch into its
        stats pose: T' = T @ (corr_at_dispatch^-1 @ corr_now)."""
        if corr is None or corr is self._corr_cw:
            return T_cw
        delta = np.linalg.inv(corr) @ self._corr_cw
        if np.abs(delta - np.eye(4)).max() < 1e-12:
            return T_cw
        return (T_cw.astype(np.float64) @ delta).astype(np.float32)

    def _apply_pose_correction(self, T_old: np.ndarray, T_new: np.ndarray):
        """Apply a keyframe pose correction (BA / loop closure) to the live
        pose as a RELATIVE update — the live frame may have tracked past the
        corrected keyframe in pipelined mode: T_cw' = T_cw @ T_old^-1 @ T_new.
        The device-side pose chain gets the same right-multiplied correction
        so future dispatches carry it without rewinding tracking."""
        dT = (np.linalg.inv(T_old.astype(np.float64))
              @ T_new.astype(np.float64))
        if np.abs(dT - np.eye(4)).max() < 1e-9:
            return
        self._corr_cw = self._corr_cw @ dT
        self.T_cw = (self.T_cw.astype(np.float64) @ dT).astype(np.float32)
        if self.fe_state is not None:
            dR = jnp.asarray(dT[:3, :3].astype(np.float32))
            dt = jnp.asarray(dT[:3, 3].astype(np.float32))
            self.fe_state = self.fe_state._replace(
                R_cw=self.fe_state.R_cw @ dR,
                t_cw=self.fe_state.R_cw @ dt + self.fe_state.t_cw)

    # ------------------------------------------------------------------
    def process_stereo(self, iml: np.ndarray, imr: np.ndarray, time: float
                       ) -> np.ndarray:
        """One stereo frame in, camera-to-world pose out (the per-frame body
        of SlamManager::run, ov2slam.cpp:116-237)."""
        p = self.params
        self.frame_id += 1
        if self.rect_maps is not None:
            iml = self._rectify(iml, 0)
            imr = self._rectify(imr, 1)
        self._last_imr = imr
        img_u8 = _to_device_u8(iml)

        with self.prof.scope("0.Full-Front_End"):
            if self.fe_state is None:
                self.fe_state = fe_mod.init_fe_state(
                    img_u8, self.kp_cap, p.nklt_pyr_lvl,
                    p.use_clahe, p.fclahe_val)
                self._initialize_stereo(iml, imr, time)
                self._log_pose(time, True)
                return self.T_wc()

            lm_pos, lm_is3d = self.map.device_landmarks()
            self.fe_state, stats = fe_mod.frame_step(
                self.fe_state, img_u8, lm_pos, lm_is3d, self.cam_l,
                levels=p.nklt_pyr_lvl, use_clahe=p.use_clahe,
                clahe_clip=p.fclahe_val, nklt_win=p.nklt_win_size,
                nmax_iter=p.nmax_iter,
                fmax_px_precision=p.fmax_px_precision,
                fmax_fbklt_dist=p.fmax_fbklt_dist, klt_err=p.nklt_err,
                do_epipolar=p.doepipolar, fransac_err=p.fransac_err,
                robust_th2=p.robust_mono_th,
                n_ransac_hyps=fe_mod.ransac_hyps_of(p), dop3p=p.dop3p,
                track_from_kf=p.btrack_keyframetoframe)
            try:
                stats.copy_to_host_async()
            except AttributeError:
                pass

        if p.force_realtime and self.initialized:
            # enqueue; finalize frame i-k so its stats transfer has had k
            # frames of wall time to complete. The blocking device->host
            # fetch costs a full link round trip (~13 ms p50 on the tunneled
            # TPU even for a 12-float vector) even with copy_to_host_async,
            # so a single fetcher thread pays it off the critical path (the
            # fetch releases the GIL) and finalize reads the ready result.
            self._inflight.append(
                (self._fetcher.submit(np.asarray, stats), iml, imr, time,
                 self._corr_cw, self._chain_gen))
            while len(self._inflight) > max(1, p.pipeline_depth):
                self._finalize_frame(*self._inflight.popleft())
            # advance at most one staged KF-commit step per frame
            self._advance_kf_pipeline()
            return self.T_wc()

        self._finalize_frame(stats, iml, imr, time)
        return self.T_wc()

    # ------------------------------------------------------------------
    def _log_pose(self, time, is_kf: bool):
        T_wkf = None
        if self.cur_kfid in self.map.keyframes:
            T_wkf = np.linalg.inv(self.map.keyframes[self.cur_kfid].T_cw)
        elif (self._pending_kf is not None
              and self._pending_kf["kfid"] == self.cur_kfid):
            # the KF record commits KF_COMMIT_LAG frames after dispatch; use
            # its snapshot pose so frames finalized inside the lag window log
            # a real rel-to-KF pose instead of identity (advisor r2 #3)
            T_wkf = np.linalg.inv(self._pending_kf["T_cw"].astype(np.float64))
        self.logger.add(time, self.T_wc(), is_kf, self.cur_kfid, T_wkf)

    def _finalize_frame(self, stats, iml, imr, time, corr=None, gen=None,
                        allow_kf=True, force_kf=False):
        """Blocking half of frame processing: read the stats vector, update
        the pose/log, decide + run keyframe processing. `corr` is the
        cumulative world-frame correction factor at dispatch time; any
        corrections applied since (BA writeback, loop closure) are folded
        into the stats pose here (exact: right factors commute with the
        tracking chain)."""
        p = self.params
        if hasattr(stats, "result"):        # prefetched on the fetcher thread
            stats = stats.result()
        if gen is not None and gen != self._chain_gen:
            # dispatched under a pre-relocalization tracking chain: the
            # stats pose is garbage relative to the relocalized chain (no
            # right factor relates them) — log the current pose and skip
            # every pose/KF/recovery decision
            self._log_pose(time, False)
            self.frames_since_kf += 1
            return
        stats_np = np.asarray(stats)
        pose_ok = stats_np[0] > 0.5
        n_tracked = int(stats_np[1])
        n_3d = int(stats_np[2])
        parallax = float(stats_np[4])
        if pose_ok:
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = _mat_from_quat_np(stats_np[8:12])
            T[:3, 3] = stats_np[5:8]
            self.T_cw = self._late_corrected(T, corr)
        elif n_3d >= 10 and self.initialized:
            # P3P-RANSAC recovery when the prior-seeded PnP failed
            # (reference: p3pRansac path, visual_front_end.cpp:659-851)
            pose_ok = self._try_p3p_recovery()

        if pose_ok:
            self._lost_frames = 0
        else:
            self._lost_frames += 1
            if (self._lost_frames >= 3 and self.initialized
                    and self.loopcloser is not None):
                # total tracking loss: relocalize against the place index
                if self._try_relocalize(iml, time):
                    pose_ok = True
                    self._lost_frames = 0

        need_kf = allow_kf and fe_mod.check_new_kf(
            p, n_tracked, n_3d, parallax,
            self.frames_since_kf, self.n3d_at_kf, pose_ok,
            time_since_kf=time - self.kf_time)

        if need_kf and self._inflight:
            # the device state has advanced past this frame; log this frame
            # normally, drain the newer in-flight frames, and create the
            # keyframe on the NEWEST frame (the reference under realtime
            # load likewise tracks only the newest frame and drops stale
            # ones, ov2slam.cpp:291-298)
            self.frames_since_kf += 1
            self._log_pose(time, False)
            while len(self._inflight) > 1:
                self._finalize_frame(*self._inflight.popleft(), allow_kf=False)
            self._finalize_frame(*self._inflight.popleft(), allow_kf=False,
                                 force_kf=True)
            return

        if need_kf or force_kf:
            with self.prof.scope("1.KF_Processing"):
                self._create_keyframe(iml, imr, time)
        else:
            self.frames_since_kf += 1
        self._log_pose(time, need_kf or force_kf)

    def process_stereo_chunk(self, frames):
        """Throughput mode: track a list of (iml, imr, t) frames in one
        device dispatch (lax.scan). Keyframe decisions quantize to the chunk
        boundary — appropriate for offline replay / benchmarking (the
        realtime reference drops frames under load for the same reason).

        Falls back to per-frame processing until the map is initialized."""
        p = self.params
        if not self.initialized or len(frames) < 2:
            T = None
            for iml, imr, t in frames:
                T = self.process_stereo(iml, imr, t)
            return T

        # finalize anything pending from single-frame mode
        self.flush()
        self.frame_id += len(frames)
        if self.rect_maps is not None:
            imgs = jnp.stack([self._rectify(f[0], 0) for f in frames]
                             ).astype(jnp.uint8)
            # the right image is only consumed at keyframes; rectify the last
            # one (the KF candidate) so stereo matching sees the same geometry
            # as the per-frame path (advisor finding r1 #1)
            imr_last = self._rectify(frames[-1][1], 1).astype(jnp.uint8)
        else:
            imgs = jnp.stack([_to_device_u8(f[0]) for f in frames])
            imr_last = _to_device_u8(frames[-1][1])
        self._last_imr = imr_last
        lm_pos, lm_is3d = self.map.device_landmarks()
        with self.prof.scope("0.Full-Front_End"):
            self.fe_state, stats = fe_mod.frame_chunk_step(
                self.fe_state, imgs, lm_pos, lm_is3d,
                self.cam_l,
                levels=p.nklt_pyr_lvl, use_clahe=p.use_clahe,
                clahe_clip=p.fclahe_val, nklt_win=p.nklt_win_size,
                nmax_iter=p.nmax_iter,
                fmax_px_precision=p.fmax_px_precision,
                fmax_fbklt_dist=p.fmax_fbklt_dist, klt_err=p.nklt_err,
                do_epipolar=p.doepipolar, fransac_err=p.fransac_err,
                robust_th2=p.robust_mono_th,
                n_ransac_hyps=fe_mod.ransac_hyps_of(p), dop3p=p.dop3p,
                track_from_kf=p.btrack_keyframetoframe)
            stats_np = np.asarray(stats)        # (N, 12)

        need_kf = False
        for j, (iml, imr, t) in enumerate(frames):
            row = stats_np[j]
            pose_ok = row[0] > 0.5
            if pose_ok:
                T = np.eye(4, dtype=np.float32)
                T[:3, :3] = _mat_from_quat_np(row[8:12])
                T[:3, 3] = row[5:8]
                self.T_cw = T
            # evaluate the KF heuristics with the pre-increment counter to
            # match per-frame semantics (_finalize_frame decides first,
            # increments only when no KF is created)
            need_kf = need_kf or fe_mod.check_new_kf(
                p, int(row[1]), int(row[2]), float(row[4]),
                self.frames_since_kf, self.n3d_at_kf, pose_ok,
                time_since_kf=t - self.kf_time)
            is_last = j == len(frames) - 1
            if is_last and need_kf:
                with self.prof.scope("1.KF_Processing"):
                    self._create_keyframe(iml, imr_last, t, defer=False)
            else:
                self.frames_since_kf += 1
            self._log_pose(t, is_last and need_kf)
        return self.T_wc()

    def flush(self):
        """Finalize all in-flight frames, staged KF commits and pending BA
        (pipelined mode)."""
        fin = self._finalize_mono if self.params.mono else self._finalize_frame
        while self._inflight:
            fin(*self._inflight.popleft())
        self._drain_kf_pipeline()
        self._finalize_pending_ba()

    def _finalize_pending_ba(self):
        if self._pending_ba is None:
            return
        pend, self._pending_ba = self._pending_ba, None
        # apply the BA correction of its newest KF to the live pose as a
        # RELATIVE update (the live frame has tracked on since the solve):
        # T_cw_live' = T_cw_live @ T_cw_kf^-1 @ T_cw_kf'
        kf_list = pend[1]
        rec = self.map.keyframes.get(kf_list[0]) if kf_list else None
        T_old = rec.T_cw.copy() if rec is not None else None
        self.estimator.finalize_local_ba(self.map, pend)
        if rec is not None:
            self._apply_pose_correction(T_old, rec.T_cw)
        self._refresh_kp_3d_flags()

    def _rectify(self, img, cam_idx: int):
        """Rectify on device and KEEP the result there (a per-frame
        device->host image download costs a 1.4 MB transfer + host churn;
        every consumer accepts device arrays). Bicubic taps — a deliberate
        upgrade over the reference's INTER_LINEAR remap
        (camera_calibration.cpp:238): bilinear resampling low-passes the
        image and costs KLT/detector subpixel accuracy, the round-3
        rect-tier ATE penalty."""
        from ov2slam_tpu.ops import image as im_mod
        return im_mod.remap_bicubic(
            jnp.asarray(img, jnp.float32), self.rect_maps[cam_idx])

    def T_wc(self) -> np.ndarray:
        return np.linalg.inv(self.T_cw.astype(np.float64)).astype(np.float32)

    # ------------------------------------------------------------------
    def _try_relocalize(self, iml, time: float) -> bool:
        """Query the BoW index with the lost frame, verify with P3P + PnP,
        reset the pose, and rebuild the keypoint table via a forced keyframe
        (local-map matching then re-associates landmarks)."""
        from ov2slam_tpu.slam import mapper as mp
        from ov2slam_tpu.ops import detect as dmod, describe as dsmod
        img = self.fe_state.pyr[0].astype(jnp.float32)  # state stores PYR_DT
        # fresh corners + descriptors (the current table may be empty)
        resp = dmod.min_eig_response(img)
        det = dmod.grid_select(resp, jnp.zeros((8, 2), jnp.float32),
                               jnp.zeros(8, bool), self.params.nmaxdist,
                               jnp.asarray(np.float32(1e-4)))
        desc, ok = dsmod.describe_brief(img, det.points, det.valid)
        unpx = cam_mod.undistort_px(self.cam_l, det.points)
        bv = cam_mod.bearing_from_undist_px(self.cam_l, unpx)
        desc_np, ok_np, unpx_np, bv_np = fetch_np(desc, ok, unpx, bv)
        res = self.loopcloser.relocalize(
            self.map, desc_np, ok_np, bv_np, unpx_np)
        if res is None:
            return False
        T, cand_kf = res
        self.T_cw = T
        # invalidate in-flight frames from the lost chain: their stats poses
        # bear no relation to the relocalized pose (advisor r4 #2)
        self._chain_gen += 1
        self._sync_pose_to_device()
        # reset velocity (the old one is meaningless after the jump)
        self.fe_state = self.fe_state._replace(
            R_vel=jnp.eye(3, dtype=jnp.float32),
            t_vel=jnp.zeros(3, jnp.float32))
        # drop the stale keypoint table and rebuild from a forced keyframe
        # (with the lost frame's real timestamp so KF cadence + the KF
        # trajectory log stay correct)
        self._set_kps(frame_mod.FrameKps.empty(self.kp_cap))
        self._create_keyframe(
            None, self._last_imr, time, run_ba=False,
            stereo=self.params.stereo and self._last_imr is not None,
            defer=False)
        return True

    # ------------------------------------------------------------------
    def _try_p3p_recovery(self) -> bool:
        """Pose recovery via P3P-RANSAC + robust PnP against the current 3D
        keypoints when prior-seeded PnP failed."""
        from ov2slam_tpu.ops import mvg
        from ov2slam_tpu.opt import pnp as pnp_mod
        lm_pos, lm_is3d = self.map.device_landmarks()
        kps = self.kps
        slot = jnp.clip(kps.lmid, 0, self.map.cap - 1)
        mask = kps.valid & kps.is3d & lm_is3d[slot] & (kps.lmid >= 0)
        Xw = lm_pos[slot]
        focal = float(self.cam_l.fx + self.cam_l.fy) * 0.5
        T_est, inl, n_in, okflag = mvg.p3p_ransac(
            Xw, kps.bv, mask, self._key(self.frame_id),
            err_th_norm=self.params.fransac_err / focal, n_hyps=512)
        pnp = pnp_mod.pnp_robust_then_l2(
            fe_mod.calib_of(self.cam_l), T_est, Xw, kps.unpx, inl,
            robust_th2=self.params.robust_mono_th)
        ok, R_np, t_np, n_inl = fetch_np(
            okflag, pnp.T_cw.R, pnp.T_cw.t, pnp.n_inliers)
        if not bool(ok) or int(n_inl) < 5:
            return False
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R_np
        T[:3, 3] = t_np
        self.T_cw = T
        self._sync_pose_to_device()
        return True

    # ------------------------------------------------------------------
    def process_mono(self, im: np.ndarray, time: float) -> np.ndarray:
        """Monocular pipeline (reference: trackMono + mono init,
        visual_front_end.cpp:65-128, :855-984): 2D KLT tracking until enough
        parallax, then 5-pt/8-pt essential bootstrap at arbitrary scale 0.25,
        temporal triangulation, and PnP tracking thereafter."""
        p = self.params
        self.frame_id += 1
        if self.rect_maps is not None:     # bdo_undist mono remap path
            im = self._rectify(im, 0)
        img_u8 = _to_device_u8(im)

        with self.prof.scope("0.Full-Front_End"):
            if self.fe_state is None:
                self.fe_state = fe_mod.init_fe_state(
                    np.asarray(im).astype(np.uint8), self.kp_cap,
                    p.nklt_pyr_lvl, p.use_clahe, p.fclahe_val)
                self._create_keyframe(im, None, time, run_ba=False, stereo=False)
                self.logger.add(time, self.T_wc(), True, self.cur_kfid, None)
                return self.T_wc()

            lm_pos, lm_is3d = self.map.device_landmarks()
            self.fe_state, stats = fe_mod.frame_step(
                self.fe_state, img_u8, lm_pos, lm_is3d, self.cam_l,
                levels=p.nklt_pyr_lvl, use_clahe=p.use_clahe,
                clahe_clip=p.fclahe_val, nklt_win=p.nklt_win_size,
                nmax_iter=p.nmax_iter,
                fmax_px_precision=p.fmax_px_precision,
                fmax_fbklt_dist=p.fmax_fbklt_dist, klt_err=p.nklt_err,
                do_epipolar=p.doepipolar, fransac_err=p.fransac_err,
                robust_th2=p.robust_mono_th,
                n_ransac_hyps=fe_mod.ransac_hyps_of(p), dop3p=p.dop3p,
                track_from_kf=p.btrack_keyframetoframe)

        if p.force_realtime and self.initialized:
            # pipelined mono (same structure as stereo): the blocking stats
            # read lags pipeline_depth frames behind the dispatch
            self._inflight.append(
                (self._fetcher.submit(np.asarray, stats), im, None, time,
                 self._corr_cw, self._chain_gen))
            while len(self._inflight) > max(1, p.pipeline_depth):
                self._finalize_mono(*self._inflight.popleft())
            self._advance_kf_pipeline()
            return self.T_wc()

        stats_np = np.asarray(stats)
        if not self.initialized:
            pose_ok = stats_np[0] > 0.5
            n_tracked = int(stats_np[1])
            parallax = float(stats_np[4])
            if pose_ok:
                T = np.eye(4, dtype=np.float32)
                T[:3, :3] = _mat_from_quat_np(stats_np[8:12])
                T[:3, 3] = stats_np[5:8]
                self.T_cw = T
            # tracking-loss pre-init => reset — the reference's ABSOLUTE
            # threshold (nb2dkps_ < 50, visual_front_end.cpp:99-101); the
            # old relative 0.3*n_kps_at_kf rule fired later than 50 under
            # small detection budgets (VERDICT r4 weak #5)
            if n_tracked < 50:
                self.reset()
                self.logger.add(time, np.eye(4, dtype=np.float32), False, -1, None)
                return np.eye(4, dtype=np.float32)
            need_kf = False
            if parallax > p.finit_parallax:
                if self._try_mono_init(time):
                    need_kf = False      # init created the KF itself
            if not need_kf:
                self.frames_since_kf += 1
            self._log_pose(time, need_kf)
            return self.T_wc()

        self._finalize_mono(stats_np, im, None, time)
        return self.T_wc()

    # ------------------------------------------------------------------
    def _finalize_mono(self, stats, im, _imr, time, corr=None, gen=None,
                       allow_kf=True, force_kf=False):
        """Blocking half of initialized mono frame processing (mirrors
        _finalize_frame; in pipelined mode keyframes are created on the
        NEWEST in-flight frame, like the reference under frame dropping)."""
        p = self.params
        if hasattr(stats, "result"):
            stats = stats.result()
        if gen is not None and gen != self._chain_gen:
            # pre-relocalization chain (see _finalize_frame)
            self._log_pose(time, False)
            self.frames_since_kf += 1
            return
        stats_np = np.asarray(stats)
        pose_ok = stats_np[0] > 0.5
        n_tracked = int(stats_np[1])
        n_3d = int(stats_np[2])
        parallax = float(stats_np[4])
        if pose_ok:
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = _mat_from_quat_np(stats_np[8:12])
            T[:3, 3] = stats_np[5:8]
            self.T_cw = self._late_corrected(T, corr)
        elif n_3d >= 10:
            # the reference's computePose P3P recovery applies in mono too
            # (visual_front_end.cpp:659-851 — trackMono shares computePose)
            pose_ok = self._try_p3p_recovery()

        if pose_ok:
            self._lost_frames = 0
        else:
            self._lost_frames += 1
            if self._lost_frames >= 3 and self.loopcloser is not None:
                # total mono tracking loss: BoW relocalization (same
                # machinery as the stereo path, _finalize_frame)
                if self._try_relocalize(im, time):
                    pose_ok = True
                    self._lost_frames = 0

        need_kf = allow_kf and fe_mod.check_new_kf(
            p, n_tracked, n_3d, parallax,
            self.frames_since_kf, self.n3d_at_kf, pose_ok,
            time_since_kf=time - self.kf_time)
        if need_kf and self._inflight:
            self.frames_since_kf += 1
            self._log_pose(time, False)
            while len(self._inflight) > 1:
                self._finalize_mono(*self._inflight.popleft(), allow_kf=False)
            self._finalize_mono(*self._inflight.popleft(), allow_kf=False,
                                force_kf=True)
            return
        if need_kf or force_kf:
            with self.prof.scope("1.KF_Processing"):
                self._create_keyframe(im, None, time, stereo=False,
                                      defer=False)
        else:
            self.frames_since_kf += 1
        self._log_pose(time, need_kf or force_kf)

    # ------------------------------------------------------------------
    def _try_mono_init(self, time) -> bool:
        """Essential-matrix bootstrap at arbitrary 0.25 m scale
        (visual_front_end.cpp:855-984)."""
        from ov2slam_tpu.ops import mvg
        m = self.map
        kf0 = m.keyframes.get(self.cur_kfid)
        if kf0 is None:
            return False
        kp_lmid, kp_valid, kp_bv = fetch_np(
            self.kps.lmid, self.kps.valid, self.kps.bv)
        K = self.kp_cap
        bv0 = np.zeros((K, 3), np.float32)
        bv0[:, 2] = 1.0
        ok = np.zeros(K, bool)
        for s in np.nonzero(kp_valid & (kp_lmid >= 0))[0]:
            slot0 = kf0.kp_slot_of(int(kp_lmid[s]))
            if slot0 >= 0:
                bv0[s] = kf0.bv[slot0]
                ok[s] = True
        if ok.sum() < 30:
            return False
        res = mvg.essential_ransac(
            jnp.asarray(bv0), jnp.asarray(kp_bv), jnp.asarray(ok),
            self._key(self.frame_id),
            err_th=self.params.fransac_err / float(0.5 * (self.cam_l.fx + self.cam_l.fy)),
            n_hyps=512)
        if not bool(res.success) or int(res.n_inliers) < 0.5 * ok.sum():
            return False
        T_rel = mvg.decompose_essential(
            res.model, jnp.asarray(bv0), jnp.asarray(kp_bv), res.inliers)
        # T_rel: cur-cam-to-KF0-cam with |t| = 1; set arbitrary 0.25 scale
        R_wc = np.asarray(T_rel.R)
        t_wc = np.asarray(T_rel.t) * 0.25
        T_wc = np.eye(4, dtype=np.float32)
        T_wc[:3, :3] = R_wc
        T_wc[:3, 3] = t_wc
        # T_wc is the current cam pose in KF0's frame; chain through KF0's
        # own (usually identity) world pose: T_cw_cur = T_cw_rel @ T_cw_kf0
        self.T_cw = (
            np.linalg.inv(T_wc.astype(np.float64)) @ kf0.T_cw.astype(np.float64)
        ).astype(np.float32)
        self._sync_pose_to_device()
        # KF + temporal triangulation against KF0 gives the initial map
        self._create_keyframe(None, None, time, run_ba=False, stereo=False)
        n3d = m.n_3d()
        if n3d > 30:
            self.initialized = True
            return True
        # bad init -> full reset (mapper.cpp:129-144)
        self.reset()
        return False

    # ------------------------------------------------------------------
    def _initialize_stereo(self, iml, imr, time):
        """First keyframe: detect + stereo triangulate (the stereo init path;
        the reference marks bvision_init_ once kps are triangulated)."""
        self._create_keyframe(iml, imr, time, run_ba=False)
        if self.map.n_3d() > 20:
            self.initialized = True

    # ------------------------------------------------------------------
    # Keyframe creation: device dispatch now, host commit staged over the
    # following frames (deferred mode) or inline (offline mode). Mirrors the
    # reference's thread split: the front end creates the KF synchronously,
    # while Mapper/Estimator/LoopCloser work concurrently with tracking
    # (mapper.cpp:44-170, estimator.cpp:32-98).
    # ------------------------------------------------------------------

    KF_COMMIT_LAG = 4     # frames between kf_step dispatch and registry commit
    LMM_LAG = 2           # frames between local-map-match dispatch and merge
    BA_LAG = 4            # frames between BA dispatch and writeback

    def _create_keyframe(self, iml, imr, time, run_ba=True, stereo=True,
                         defer=None):
        p = self.params
        if defer is None:
            defer = bool(p.force_realtime and self.initialized)
        # the previous keyframe must be fully committed before allocating
        # candidates / assembling anchors for this one
        self._drain_kf_pipeline()
        kfid = self.map.next_kf_id
        prev_kfid = self.cur_kfid
        self.cur_kfid = kfid
        cur_pyr = self._cur_pyr()

        # ---- the whole device side in ONE dispatch
        # (detect -> insert -> describe -> stereo match -> triangulate) ----
        with self.prof.scope("2.KF_DeviceStep"):
            nh = self.cam_l.height // p.nmaxdist
            nw = self.cam_l.width // p.nmaxdist
            n_cells = nh * nw
            cand_ids = self.map.alloc_landmarks(n_cells)
            anc = self._assemble_anchor_data(prev_kfid)
            # detector choice mirrors map_manager.cpp:300-322
            detector = ("gftt" if p.use_shi_tomasi
                        else "fast" if p.use_fast else "singlescale")
            if stereo:
                right_pyr = fe_mod._cast_pyr(fe_mod.preprocess(
                    _to_device_u8(imr),
                    p.nklt_pyr_lvl, p.use_clahe, p.fclahe_val))
            else:
                right_pyr = cur_pyr
            lm_pos, lm_is3d = self.map.device_landmarks()
            res = mapper_mod.kf_step(
                cur_pyr, right_pyr, self.kps, lm_pos, lm_is3d,
                self.cam_l, self.cam_r,
                jnp.asarray(self.T_cw[:3, :3]), jnp.asarray(self.T_cw[:3, 3]),
                self.T_rl.R, self.T_rl.t,
                jnp.asarray(np.float32(
                    self.detector_quality if detector != "fast"
                    else float(p.nfast_th))),
                jnp.asarray(cand_ids.astype(np.int32)),
                jnp.asarray(np.float32(self.median_depth)),
                jnp.asarray(anc[0]), jnp.asarray(anc[1]), jnp.asarray(anc[2]),
                jnp.asarray(anc[3]), jnp.asarray(anc[4]),
                cellsize=p.nmaxdist, detector=detector, fast_th=p.nfast_th,
                nlevels=p.nklt_pyr_lvl, win=p.nklt_win_size,
                max_iters=p.nmax_iter, fb_dist=p.fmax_fbklt_dist,
                klt_err=p.nklt_err, epi_th_px=p.fepi_th, stereo=stereo,
                use_sad_prior=self._rows_aligned)
            self._set_kps(res.kps)
            kp = res.kps
            # snapshot the kps arrays (device copies): the live table's
            # buffers are donated to the next frame_step, which would
            # invalidate a deferred fetch of the originals
            fetch = tuple(jnp.copy(a) for a in (
                kp.px, kp.unpx, kp.bv, kp.lmid, kp.valid, kp.is3d, kp.rpx,
                kp.has_right)) + (
                res.desc, res.desc_ok, res.tri_ok, res.tri_Xw,
                res.tri_depth, res.med_depth, res.extra_desc, res.extra_ok,
                res.tt_ok, res.tt_Xw, res.tt_depth_anchor)
            # the fetcher thread pays the device->host round trip off the
            # tracking thread; _commit_kf just reads the ready result
            fetch_fut = self._fetcher.submit(fetch_np, *fetch)

        # device-state updates tracking needs immediately: parallax reference
        # re-anchors to this KF, pose syncs
        self._set_kps(self.kps._replace(kf_bv=jnp.copy(self.kps.bv),
                                        kf_px=jnp.copy(self.kps.px)))
        upd = dict(R_kf=jnp.asarray(self.T_cw[:3, :3]))
        if p.btrack_keyframetoframe:
            # snapshot the KF image pyramids as the new KLT templates
            # (btrack_keyframetoframe, visual_front_end.cpp:278-442);
            # copies, not aliases — the live pyramid buffers are donated to
            # the next frame_step and a twice-donated buffer is an error
            upd.update(
                kf_pyr=tuple(jnp.copy(a) for a in self.fe_state.pyr),
                kf_gx=tuple(jnp.copy(a) for a in self.fe_state.gx),
                kf_gy=tuple(jnp.copy(a) for a in self.fe_state.gy))
        self.fe_state = self.fe_state._replace(**upd)
        self._sync_pose_to_device()
        self.frames_since_kf = 0
        self.kf_time = time

        pending = dict(
            kfid=kfid, time=time, T_cw=self.T_cw.copy(), fetch=fetch_fut,
            cand_ids=cand_ids, anc=anc, n_cells=n_cells,
            desc_dev=res.desc, desc_ok_dev=res.desc_ok,
            stereo=stereo, run_ba=run_ba, defer=defer, age=0)
        if defer:
            self._pending_kf = pending
        else:
            self._commit_kf(pending)
            self._drain_kf_pipeline()

    # ------------------------------------------------------------------
    def _advance_kf_pipeline(self):
        """Advance at most one deferred stage per frame (each stage's device
        work + transfers then overlap the next tracking frames). Stage lags
        are FIXED frame counts, never wall-clock adaptive: gating commits on
        transfer readiness was tried and makes the pipeline (and hence the
        trajectory) nondeterministic under link-latency jitter."""
        if self._pending_kf is not None:
            self._pending_kf["age"] += 1
            if self._pending_kf["age"] >= self.KF_COMMIT_LAG:
                pend, self._pending_kf = self._pending_kf, None
                with self.prof.scope("2.KF_Registry"):
                    self._commit_kf(pend)
            return
        if self._pending_lmm is not None:
            self._pending_lmm["age"] += 1
            if self._pending_lmm["age"] >= self.LMM_LAG:
                pend, self._pending_lmm = self._pending_lmm, None
                with self.prof.scope("2.KF_MatchLocalMap"):
                    self._commit_lmm(pend)
            return
        if self._pending_ba is not None:
            self._ba_age += 1
            if self._ba_age >= self.BA_LAG:
                with self.prof.scope("1.BA_localBA"):
                    self._finalize_pending_ba()

    def _drain_kf_pipeline(self):
        if self._pending_kf is not None:
            pend, self._pending_kf = self._pending_kf, None
            self._commit_kf(pend)
        if self._pending_lmm is not None:
            pend, self._pending_lmm = self._pending_lmm, None
            self._commit_lmm(pend)

    # ------------------------------------------------------------------
    def _commit_kf(self, pending):
        """Host-side keyframe commit: registry updates from the fetched
        bundle, the keyframe record, and the local-map match dispatch."""
        p = self.params
        kfid = pending["kfid"]
        stereo = pending["stereo"]
        cand_ids = pending["cand_ids"]
        anc = pending["anc"]
        with self.prof.scope("2.KF_Registry_fetch"):
            (k_px, k_unpx, k_bv, k_lmid, k_valid, k_is3d, k_rpx, k_hr,
             desc_np, desc_ok_np, tri_ok, Xw_np, depth_np, med_depth,
             xdesc_np, xok_np, tt_ok, tt_Xw, tt_da) = pending["fetch"].result()

        # candidate ids that actually landed in the table
        used = np.isin(cand_ids, k_lmid[k_valid])
        self.map.free_landmarks(cand_ids[~used])
        n_new = int(used.sum())
        if not p.use_fast:
            occupied = int(k_valid.sum()) - n_new
            self.detector_quality = det_mod.adaptive_quality_update(
                self.detector_quality, n_new,
                max(pending["n_cells"] - occupied, 1))

        if stereo:
            # newly triangulated = stereo success on a not-yet-3d landmark
            sl = np.clip(k_lmid, 0, self.map.cap - 1)
            was3d = self.map.lm_is3d[sl] & (k_lmid >= 0)
            newly = tri_ok & k_valid & (k_lmid >= 0) & ~was3d
            if newly.any():
                ids = k_lmid[newly]
                bearings = k_bv[newly] / np.maximum(k_bv[newly][:, 2:], 1e-9)
                self.map.set_positions(
                    ids, Xw_np[newly], anchor_kf=kfid, bearings=bearings,
                    lams=1.0 / np.maximum(depth_np[newly], 1e-6))
            self.median_depth = float(med_depth)

        # temporal-triangulation commits, vectorized per anchor keyframe
        # (anchor = first observing KF, host-known from the pre-dispatch
        # assembly; anc[2] holds the normalized anchor bearings)
        anc_bv, anc_first = anc[2], anc[5]
        sl = np.clip(k_lmid, 0, self.map.cap - 1)
        tnew = tt_ok & k_valid & (k_lmid >= 0) & (anc_first >= 0)
        if stereo:
            tnew &= ~self.map.lm_is3d[sl]   # stereo already did it this KF
        if tnew.any():
            slots = np.nonzero(tnew)[0]
            ids = k_lmid[slots]
            # commit only landmarks whose anchor record + keypoint slot still
            # exist (advisor r2 #2: anchoring to a dead/culled KF leaves the
            # landmark invisible to inverse-depth BA with no is3d mirror)
            keep = np.zeros(len(slots), bool)
            anchor_marks = []
            for akf in np.unique(anc_first[slots]):
                arec = self.map.keyframes.get(int(akf))
                if arec is None:
                    continue
                asel = anc_first[slots] == akf
                aslots = arec.kp_slots_of(ids[asel])
                ok2 = aslots >= 0
                keep[np.nonzero(asel)[0][ok2]] = True
                anchor_marks.append((arec, aslots[ok2]))
            if keep.any():
                ks = slots[keep]
                self.map.set_positions(
                    k_lmid[ks], tt_Xw[ks], anchor_kf=anc_first[ks],
                    bearings=anc_bv[ks],
                    lams=1.0 / np.maximum(tt_da[ks], 1e-6))
                for arec, aslots in anchor_marks:
                    arec.is3d[aslots] = True

        # ---- record keyframe ----
        sl = np.clip(k_lmid, 0, self.map.cap - 1)
        k_is3d = k_valid & (k_lmid >= 0) & self.map.lm_is3d[sl]
        rec = KeyframeRecord(
            kfid=kfid, time=pending["time"], T_cw=pending["T_cw"].copy(),
            px=k_px, unpx=k_unpx, bv=k_bv, lmid=k_lmid,
            valid=k_valid, is3d=k_is3d, rpx=k_rpx, has_right=k_hr,
            desc=desc_np, desc_ok=desc_ok_np,
            extra_desc=xdesc_np[xok_np][:300])
        self.map.add_keyframe(rec)
        dsl = np.nonzero(rec.valid & desc_ok_np & (rec.lmid >= 0))[0]
        if len(dsl):
            self.map.add_descriptors(rec.lmid[dsl], desc_np[dsl])

        self.n_kps_at_kf = int(k_valid.sum())
        self.n3d_at_kf = int((k_valid & k_is3d).sum())

        # ---- local-map descriptor matching (Mapper::matchingToLocalMap,
        # mapper.cpp:576-774): dispatch now, merge bookkeeping next stage ----
        lmm = None
        if p.bdo_track_localmap and len(self.map.keyframes) >= 3:
            with self.prof.scope("2.KF_LMM_dispatch"):
                lmm = self._dispatch_local_map_match(
                    kfid, rec, pending["desc_dev"], pending["desc_ok_dev"],
                    pending["T_cw"])
        self._pending_lmm = dict(
            kfid=kfid, rec=rec, lmm=lmm, run_ba=pending["run_ba"],
            defer=pending["defer"], age=0)
        if not pending["defer"]:
            pend, self._pending_lmm = self._pending_lmm, None
            self._commit_lmm(pend)

    # ------------------------------------------------------------------
    def _dispatch_local_map_match(self, kfid: int, rec, desc_dev, desc_ok_dev,
                                  T_cw, max_cands: int = 2048):
        m = self.map
        cur = rec.lmid[rec.valid & (rec.lmid >= 0)]
        groups = []
        for ckf in m.covisible_kfs(kfid)[:10]:
            crec = m.keyframes.get(ckf)
            if crec is not None:
                groups.append(crec.lmid[crec.valid & crec.is3d
                                        & (crec.lmid >= 0)])
        if not groups:
            return None
        ids = np.unique(np.concatenate(groups))
        good = (m.lm_valid[ids] & m.lm_is3d[ids] & m.lm_desc_ok[ids]
                & ~np.isin(ids, cur))
        ids = ids[good][:max_cands]
        if len(ids) < 1:
            return None
        M = max_cands
        idsp = np.full(M, -1, np.int64)
        idsp[:len(ids)] = ids
        pos = np.zeros((M, 3), np.float32)
        cdesc = np.zeros((M, 8), np.uint32)
        cvalid = np.zeros(M, bool)
        pos[:len(ids)] = m.lm_pos[ids]
        cdesc[:len(ids)] = m.lm_desc[ids]
        cvalid[:len(ids)] = True

        # merge targets: keypoints whose landmark is only observed here
        obs_n = np.asarray([len(m.lm_obs.get(int(l), ()))
                            for l in rec.lmid.tolist()])
        matchable = rec.valid & (rec.lmid >= 0) & (obs_n <= 1)

        # match against the KF's snapshot positions (the live table has
        # tracked on since dispatch in deferred mode)
        snap = self.kps._replace(
            px=jnp.asarray(rec.px), valid=jnp.asarray(rec.valid))
        res = mapper_mod.match_to_local_map(
            snap, desc_dev, desc_ok_dev, jnp.asarray(matchable),
            jnp.asarray(pos), jnp.asarray(cdesc), jnp.asarray(cvalid),
            self.cam_l,
            jnp.asarray(T_cw[:3, :3]), jnp.asarray(T_cw[:3, 3]),
            max_px_dist=self.params.fmax_proj_pxdist,
            max_desc_dist=self.params.fmax_desc_dist)
        return (self._fetcher.submit(fetch_np, res.ok, res.kp_slot), idsp)

    # ------------------------------------------------------------------
    def _commit_lmm(self, pending):
        """Local-map merge bookkeeping, then BA + map filtering + loop
        closing for the keyframe."""
        p = self.params
        kfid = pending["kfid"]
        rec = pending["rec"]
        if pending["lmm"] is not None:
            fut, ids = pending["lmm"]
            with self.prof.scope("2.KF_LMM_fetch"):
                ok_np, slot_np = fut.result()
            taken = set()
            m = self.map
            mdst, msrc = [], []
            for ci in np.nonzero(ok_np)[0]:
                s = int(slot_np[ci])
                if s < 0 or s in taken:
                    continue
                dst = int(ids[ci])
                src = int(rec.lmid[s])
                if dst < 0 or src < 0 or dst == src:
                    continue
                taken.add(s)
                mdst.append(dst)
                msrc.append(src)
            with self.prof.scope("2.KF_LMM_merge"):
                n_merged = m.merge_landmarks_batch(mdst, msrc)
            if n_merged:
                # sync the live keypoint table with the re-pointed slots
                m.update_covisibility(kfid)
                sl = np.clip(rec.lmid, 0, m.cap - 1)
                self._set_kps(self.kps._replace(
                    lmid=jnp.asarray(rec.lmid),
                    valid=self.kps.valid & jnp.asarray(rec.valid),
                    is3d=jnp.asarray(rec.valid & m.lm_is3d[sl]
                                     & (rec.lmid >= 0))))

        # ---- local BA + filtering (Estimator thread, estimator.cpp) ----
        if pending["run_ba"] and p.slam_mode and len(self.map.keyframes) >= 2:
            with self.prof.scope("1.BA_localBA"):
                if p.async_ba and pending["defer"]:
                    # deferred BA: finalize the previous KF's solve, dispatch
                    # this KF's, write back BA_LAG frames later
                    with self.prof.scope("1.BA_finalize_prev"):
                        self._finalize_pending_ba()
                    with self.prof.scope("1.BA_begin"):
                        self._pending_ba = self.estimator.begin_local_ba(
                            self.map, kfid)
                    self._ba_age = 0
                else:
                    T_old = rec.T_cw.copy()
                    self.estimator.local_ba(self.map, kfid)
                    # propagate optimized pose of this KF to the live frame
                    self._apply_pose_correction(T_old, rec.T_cw)
                    self._refresh_kp_3d_flags()
            with self.prof.scope("1.BA_MapFiltering"):
                self.estimator.map_filtering(self.map, kfid)

        # ---- loop closing (LoopCloser thread, loop_closer.cpp) ----
        # every KF feeds the place-recognition index, including the first
        if self.loopcloser is not None:
            T_old = rec.T_cw.copy()
            with self.prof.scope("2.LC_Process"):
                ev = self.loopcloser.process_kf(self.map, kfid)
            if ev is not None:
                self.last_loop_event = ev
                self.loop_events.append(ev)
                # discard any in-flight local BA: its solve predates the
                # loop correction and writing it back would overwrite the
                # corrected poses/landmarks of the BA window (the reference
                # aborts in-flight local BA on loop closure via
                # bstop_localba_, optimizer.cpp:2334-2344)
                self._pending_ba = None
                # the query KF pose may have been corrected
                self._apply_pose_correction(T_old, rec.T_cw)
                self._refresh_kp_3d_flags()

        # refresh the counters the KF heuristics read
        sl = np.clip(rec.lmid, 0, self.map.cap - 1)
        is3d = rec.valid & (rec.lmid >= 0) & self.map.lm_is3d[sl]
        self.n_kps_at_kf = int(rec.valid.sum())
        self.n3d_at_kf = int(is3d.sum())

        # ahead-of-time compile of the span-BA family the current map size
        # would need, so a future loop closure's loose BA finds it warm
        if self.loopcloser is not None:
            self.estimator.maybe_prewarm_span(self.map)

    # ------------------------------------------------------------------
    def _assemble_anchor_data(self, prev_kfid: int):
        """Anchor poses/bearings for temporal triangulation, assembled from
        the PREVIOUS keyframe's record (no device fetch needed: keypoint
        slots are stable between keyframes; a device-side lmid guard rejects
        slots that were re-used). Vectorized per anchor keyframe.
        Returns (R, t, bv, lmid, ok, first_kf)."""
        K = self.kp_cap
        anc_R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
        anc_t = np.zeros((K, 3), np.float32)
        anc_bv = np.zeros((K, 3), np.float32)
        anc_bv[:, 2] = 1.0
        anc_lmid = np.full(K, -1, np.int32)
        anc_ok = np.zeros(K, bool)
        anc_first = np.full(K, -1, np.int32)
        prev = self.map.keyframes.get(prev_kfid)
        if prev is not None:
            slots = np.nonzero(prev.valid & ~prev.is3d & (prev.lmid >= 0))[0]
            if len(slots):
                lmids = prev.lmid[slots]
                first = self.map.first_obs_of(lmids)
                for akf in np.unique(first[first >= 0]):
                    arec = self.map.keyframes.get(int(akf))
                    if arec is None:
                        continue
                    sel = first == akf
                    aslots = arec.kp_slots_of(lmids[sel])
                    ok2 = aslots >= 0
                    s_i = slots[sel][ok2]
                    if len(s_i) == 0:
                        continue
                    b = arec.bv[aslots[ok2]]
                    anc_R[s_i] = arec.T_cw[:3, :3]
                    anc_t[s_i] = arec.T_cw[:3, 3]
                    anc_bv[s_i] = b / np.maximum(b[:, 2:3], 1e-9)
                    anc_lmid[s_i] = lmids[sel][ok2]
                    anc_ok[s_i] = True
                    anc_first[s_i] = akf
        return anc_R, anc_t, anc_bv, anc_lmid, anc_ok, anc_first

    # ------------------------------------------------------------------
    def _refresh_kp_3d_flags(self):
        """After BA outlier removal some landmarks may be gone; sync the live
        frame's flags. One jitted device call against the cached landmark
        mirrors — no host<->device round trip."""
        _, lm_is3d = self.map.device_landmarks()
        lm_valid = self.map.device_lm_valid()
        kps = self.kps
        valid, is3d = _refresh_flags_dev(
            kps.lmid, kps.valid, lm_valid, lm_is3d)
        self._set_kps(kps._replace(valid=valid, is3d=is3d))

    # ------------------------------------------------------------------
    # ------------------------------------------------------------------
    def write_results(self, out_dir: str = "."):
        """Trajectory outputs with reference-compatible names + final passes
        (SlamManager::writeResults, ov2slam.cpp:574-621: optional fullBA,
        then the LC-corrected full trajectory via KF-anchored relatives,
        ov2slam.cpp:624-701)."""
        import os
        self.flush()
        self.logger.write_tum(os.path.join(out_dir, "ov2slam_traj.txt"))
        self.logger.write_kitti(os.path.join(out_dir, "ov2slam_traj_kitti.txt"))
        self.logger.write_tum(os.path.join(out_dir, "ov2slam_kfs_traj.txt"), kf_only=True)

        if self.params.do_full_ba:
            if len(self.map.keyframes) >= 3:
                with self.prof.scope("1.BA_fullBA"):
                    self.estimator.full_ba(self.map)
            # refined keyframe trajectory (ov2slam.cpp:606-614)
            self.logger.write_kf_poses_tum(
                os.path.join(out_dir, "ov2slam_fullba_kfs_traj.txt"),
                {k: np.linalg.inv(rec.T_cw.astype(np.float64))
                 for k, rec in self.map.keyframes.items()})

        if (self.params.buse_loop_closer or self.params.do_full_ba):
            # full trajectory with loop corrections: rigid chain rebuild from
            # corrected KF anchors (ov2slam_full_traj_wlc.txt,
            # ov2slam.cpp:624-701), then the full pose graph relaxing every
            # non-KF pose onto the corrected KF skeleton
            # (ov2slam_full_traj_wlc_opt.txt, optimizer.cpp:2783-2865)
            lg = self.logger
            kf_idx, kf_Twc = [], []
            for i in range(len(lg.times)):
                if lg.is_kf[i] and lg.kf_ids[i] in self.map.keyframes:
                    kf_idx.append(i)
                    kf_Twc.append(np.linalg.inv(
                        self.map.keyframes[lg.kf_ids[i]].T_cw.astype(np.float64)))
            if kf_idx:
                raw = np.stack([p for p in lg.poses_wc])
                with self.prof.scope("1.BA_fullPoseGraph"):
                    from ov2slam_tpu.opt import posegraph as pg_mod
                    # rigid rebuild falls out of relax as its init; recompute
                    # it standalone for the wlc (pre-relaxation) file
                    relaxed = pg_mod.relax_full_trajectory(
                        raw, np.asarray(kf_idx), np.stack(kf_Twc))
                kf_poses_wc = {
                    k: np.linalg.inv(rec.T_cw.astype(np.float64))
                    for k, rec in self.map.keyframes.items()}
                self.logger.write_full_with_kf_poses(
                    os.path.join(out_dir, "ov2slam_full_traj_wlc.txt"),
                    kf_poses_wc)
                self.logger.write_poses_tum(
                    os.path.join(out_dir, "ov2slam_full_traj_wlc_opt.txt"),
                    relaxed)
