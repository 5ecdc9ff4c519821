"""Loop closing: online place recognition + geometric verification +
pose-graph correction + map merging.

Replaces the reference's LoopCloser thread (reference: src/loop_closer.cpp):
per keyframe — feed descriptors to the BoW detector; on a candidate, reject
covisible matches, kNN-match descriptors (device Hamming), P3P-RANSAC +
robust PnP against the loop keyframe's landmarks (device), and if enough
inliers: solve the local pose graph (device LM), recompute landmark positions
from their (corrected) anchors, and merge duplicated landmarks.

Host logic stays thin: everything numeric runs in the jitted device solvers.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ov2slam_tpu.config import SlamParams
from ov2slam_tpu.core import camera as cam_mod
from ov2slam_tpu.core import lie
from ov2slam_tpu.core.camera import Camera
from ov2slam_tpu.core.lie import SE3
from ov2slam_tpu.ops import describe as desc_mod
from ov2slam_tpu.ops import mvg
from ov2slam_tpu.opt import pnp as pnp_mod
from ov2slam_tpu.opt import posegraph as pg_mod
from ov2slam_tpu.slam import bow
from ov2slam_tpu.slam import frontend as fe_mod
from ov2slam_tpu.slam.map import MapStore

LOOSE_BA_MIN_JUMP = 0.02     # reference: loop_closer.cpp:368


@dataclass
class LoopClosureEvent:
    query_kf: int
    match_kf: int
    n_inliers: int
    n_merged: int
    pose_jump: float           # |t| correction applied to the query KF
    n_pairs_init: int = 0      # matches vs the single candidate KF
    n_pairs_local: int = 0     # after loop-local-map expansion


class LoopCloser:
    def __init__(self, params: SlamParams, cam_l: Camera, estimator=None):
        self.params = params
        self.cam_l = cam_l
        self.estimator = estimator
        self.detector = bow.LCDetector()
        self.last_closure_kf = -10

    def _key(self, i: int):
        """RANSAC key; bdo_random=0 pins sampling (multi_view_geometry.cpp:207)."""
        return jax.random.PRNGKey(i if self.params.bdo_random else 0)

    # ------------------------------------------------------------------
    def prewarm(self, kp_cap: int, n_cells: int = 0):
        """Compile every jit family the loop-closure / relocalization
        cascade will dispatch, on dummy data with the run-constant shapes.

        Loop closures fire mid-run, long after the tracking warmup window;
        without this their first-encounter trace+compile (tens of seconds on
        the tunneled TPU, round-4/5 profiling) stalls the live pipeline at
        exactly the frame a loop lands. Meant to run from a background
        thread at startup (compiles release the GIL)."""
        p = self.params
        key = jax.random.PRNGKey(0)
        focal = float(self.cam_l.fx + self.cam_l.fy) * 0.5
        outs = []
        d_cap = jnp.zeros((kp_cap, 8), jnp.uint32)
        m_cap = jnp.zeros(kp_cap, bool).at[:32].set(True)
        outs += list(desc_mod.knn2_match(d_cap, m_cap, d_cap, m_cap))
        if n_cells:
            d_c = jnp.zeros((n_cells, 8), jnp.uint32)
            m_c = jnp.zeros(n_cells, bool).at[:32].set(True)
            outs += list(desc_mod.knn2_match(d_c, m_c, d_cap, m_cap))
        bv = jnp.concatenate(
            [jax.random.normal(key, (512, 2)) * 0.2, jnp.ones((512, 1))], -1)
        bv = bv / jnp.linalg.norm(bv, axis=-1, keepdims=True)
        ev = jnp.ones(512, bool)
        outs.append(mvg.essential_ransac(
            bv, bv, ev, key, err_th=p.fransac_err / focal,
            n_hyps=1024).n_inliers)
        Xw = jax.random.normal(key, (512, 3)) + jnp.asarray([0.0, 0.0, 5.0])
        T0, _, n_in, _ = mvg.p3p_ransac(
            Xw, bv, ev, key, err_th_norm=p.fransac_err / focal, n_hyps=512)
        outs.append(n_in)
        cal = fe_mod.calib_of(self.cam_l)
        unpx = jax.random.normal(key, (512, 2)) * 50 + 300
        outs.append(pnp_mod.pnp_robust_then_l2(
            cal, T0, Xw, unpx, ev, robust_th2=p.robust_mono_th).n_inliers)
        Nbig = 1 << max(9, (kp_cap - 1).bit_length())
        for N in {Nbig, kp_cap}:
            outs.append(pnp_mod.pnp_robust_then_l2(
                cal, T0, jnp.zeros((N, 3)) + jnp.asarray([0.0, 0.0, 5.0]),
                jnp.zeros((N, 2)) + 300.0, jnp.zeros(N, bool).at[:16].set(True),
                robust_th2=p.robust_mono_th).n_inliers)
        # pose graph buckets (F = next pow2 of span length)
        for F in (8, 16, 32, 64):
            E = F + 4
            prob = pg_mod.PoseGraphProblem(
                R=jnp.tile(jnp.eye(3, dtype=jnp.float32), (F, 1, 1)),
                t=jnp.zeros((F, 3), jnp.float32),
                pose_opt=jnp.zeros(F, bool).at[1:6].set(True),
                edge_i=jnp.zeros(E, jnp.int32).at[:5].set(
                    jnp.arange(1, 6, dtype=jnp.int32)),
                edge_j=jnp.zeros(E, jnp.int32).at[:5].set(
                    jnp.arange(0, 5, dtype=jnp.int32)),
                meas_R=jnp.tile(jnp.eye(3, dtype=jnp.float32), (E, 1, 1)),
                meas_t=jnp.zeros((E, 3), jnp.float32),
                edge_weight=jnp.zeros(E, jnp.float32).at[:5].set(1.0))
            outs.append(pg_mod.solve_pose_graph(prob, max_iters=10).cost)
        jax.block_until_ready(outs)

    # ------------------------------------------------------------------
    def process_kf(self, m: MapStore, kfid: int,
                   key=None) -> Optional[LoopClosureEvent]:
        """Returns an event if a loop was closed (reference run loop,
        loop_closer.cpp:65-184)."""
        rec = m.keyframes.get(kfid)
        if rec is None:
            return None
        dmask = rec.valid & rec.desc_ok & (rec.lmid >= 0)
        descs = rec.desc[dmask]
        if getattr(rec, "extra_desc", None) is not None and len(rec.extra_desc):
            descs = np.concatenate([descs, rec.extra_desc], axis=0)
        cand = self.detector.process(kfid, descs)
        if cand is None:
            return None
        if kfid - self.last_closure_kf < 5:
            return None

        # resolve the match to a surviving keyframe (culling may have
        # removed the exact id): fall back to the highest-scored SURVIVING
        # member of the winning island — every island member actually
        # received BoW votes (unlike a nearest-id substitute, which could
        # bind the loop to a KF the index never matched)
        match_kf = cand.match_kf
        if match_kf not in m.keyframes:
            alive = [(k, s) for k, s in cand.island if k in m.keyframes]
            if not alive:
                return None
            match_kf = max(alive, key=lambda t: t[1])[0]
        # covisibility rejection (loop_closer.cpp:201-209): a strongly
        # covisible "loop" is just the local map
        if m.covis.get(kfid, {}).get(match_kf, 0) > 10:
            return None

        ev = self._verify_and_close(m, kfid, match_kf, key)
        if ev is not None:
            self.last_closure_kf = kfid
        return ev

    # ------------------------------------------------------------------
    def relocalize(self, m: MapStore, descs: np.ndarray, desc_valid,
                   bvs: np.ndarray, unpxs: np.ndarray, key=None):
        """Relocalization from total tracking loss: query the place index
        with the lost frame's descriptors (without inserting), verify the
        best candidate geometrically (kNN + P3P + robust PnP), return the
        recovered world-to-cam pose or None. All arrays are fixed-shape
        padded with `desc_valid` marking live rows.

        (The reference has no global relocalization — loop closing only runs
        on keyframes; this extends the same machinery to lost frames.)"""
        if desc_valid.sum() < 20:
            return None
        hits = self.index_query(descs[desc_valid])
        for cand_kf, _score in hits[:3]:
            if cand_kf not in m.keyframes:
                continue
            T = self._match_and_pnp(m, cand_kf, descs, desc_valid, bvs,
                                    unpxs, key)
            if T is not None:
                return T, cand_kf
        return None

    def index_query(self, descs: np.ndarray):
        return self.detector.index.query(descs, max_image_id=1 << 30, topk=5)

    def _match_and_pnp(self, m: MapStore, cand_kf: int, descs, desc_valid,
                       bvs, unpxs, key):
        """descs/desc_valid/bvs/unpxs are FIXED-SHAPE padded arrays (shape
        families are per-run constants): every jit call here keeps a single
        compile signature — round-5 fix for data-dependent-shape compiles
        stalling the pipeline mid-run."""
        p = self.params
        from ov2slam_tpu.utils import fetch_np
        mrec = m.keyframes[cand_kf]
        loop_mask = mrec.valid & mrec.desc_ok & mrec.is3d & (mrec.lmid >= 0)
        if loop_mask.sum() < 20:
            return None
        best, bd, sd = fetch_np(*desc_mod.knn2_match(
            jnp.asarray(descs), jnp.asarray(desc_valid),
            jnp.asarray(mrec.desc), jnp.asarray(loop_mask)))
        good = (desc_valid & (bd <= 0.85 * sd)
                & (bd < p.fmax_desc_dist * 2.0 * 256))
        if good.sum() < 15:
            return None
        N = 512
        Xw = np.zeros((N, 3), np.float32)
        bv = np.zeros((N, 3), np.float32); bv[:, 2] = 1.0
        unpx = np.zeros((N, 2), np.float32)
        val = np.zeros(N, bool)
        j = 0
        for i in np.nonzero(good)[0]:
            lm = int(mrec.lmid[best[i]])
            if lm < 0 or not (m.lm_valid[lm] and m.lm_is3d[lm]) or j >= N:
                continue
            Xw[j] = m.lm_pos[lm]; bv[j] = bvs[i]; unpx[j] = unpxs[i]
            val[j] = True; j += 1
        if j < 15:
            return None
        if key is None:
            key = self._key(cand_kf)
        focal = float(self.cam_l.fx + self.cam_l.fy) * 0.5
        T_est, inl, n_in, okflag = mvg.p3p_ransac(
            jnp.asarray(Xw), jnp.asarray(bv), jnp.asarray(val), key,
            err_th_norm=p.fransac_err / focal, n_hyps=512)
        pnp = pnp_mod.pnp_robust_then_l2(
            fe_mod.calib_of(self.cam_l), T_est, jnp.asarray(Xw),
            jnp.asarray(unpx), inl, robust_th2=p.robust_mono_th)
        okflag, n_in, n_pnp, R_np, t_np = fetch_np(
            okflag, n_in, pnp.n_inliers, pnp.T_cw.R, pnp.T_cw.t)
        if not bool(okflag) or int(n_in) < 10 or int(n_pnp) < 30:
            return None
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R_np
        T[:3, 3] = t_np
        return T

    # ------------------------------------------------------------------
    def _verify_and_close(self, m: MapStore, kfid: int, match_kf: int, key
                          ) -> Optional[LoopClosureEvent]:
        p = self.params
        rec = m.keyframes[kfid]
        mrec = m.keyframes[match_kf]

        # ---- kNN descriptor matching cur -> loop KF (loop_closer.cpp:378).
        # Full fixed-shape tables with masks (NOT index-compacted): every
        # compile signature here is a per-run constant — round-4 profiling
        # showed the data-dependent shapes recompiling knn2_match on every
        # loop candidate, each a multi-second stall ----
        from ov2slam_tpu.utils import fetch_np
        cur_mask = rec.valid & rec.desc_ok & (rec.lmid >= 0)
        loop_mask = (mrec.valid & mrec.desc_ok & mrec.is3d
                     & (mrec.lmid >= 0))
        if cur_mask.sum() < 20 or loop_mask.sum() < 20:
            return None
        best, bd, sd = fetch_np(*desc_mod.knn2_match(
            jnp.asarray(rec.desc), jnp.asarray(cur_mask),
            jnp.asarray(mrec.desc), jnp.asarray(loop_mask)))
        good = (cur_mask & (bd <= 0.85 * sd)
                & (bd < p.fmax_desc_dist * 2.0 * 256))
        if good.sum() < 15:
            return None

        # ---- epipolar pre-filter (loop_closer.cpp:462-499): a 5-pt
        # essential RANSAC over the kNN matches rejects gross outliers
        # cheaply before the P3P + PnP cascade ----
        gi = np.nonzero(good)[0]
        Npad = 512
        bva = np.zeros((Npad, 3), np.float32); bva[:, 2] = 1.0
        bvb = np.zeros((Npad, 3), np.float32); bvb[:, 2] = 1.0
        evalid = np.zeros(Npad, bool)
        ne = min(len(gi), Npad)
        bva[:ne] = mrec.bv[best[gi[:ne]]]
        bvb[:ne] = rec.bv[gi[:ne]]
        evalid[:ne] = True
        focal_e = float(self.cam_l.fx + self.cam_l.fy) * 0.5
        eres = mvg.essential_ransac(
            jnp.asarray(bva), jnp.asarray(bvb), jnp.asarray(evalid),
            self._key(kfid ^ 0x5A5A),
            err_th=p.fransac_err / focal_e, n_hyps=1024)
        esucc, einl_np = fetch_np(eres.success, eres.inliers)
        if bool(esucc):
            einl = einl_np[:ne]
            good[gi[:ne][~einl]] = False
            if good.sum() < 15:
                return None

        # matched pairs: current kp slot s -> loop landmark id
        pairs = []
        for i in np.nonzero(good)[0]:
            lm = int(mrec.lmid[best[i]])
            if lm >= 0 and m.lm_valid[lm] and m.lm_is3d[lm]:
                pairs.append((int(i), lm))
        if len(pairs) < 15:
            return None

        # ---- P3P RANSAC + PnP on loop landmarks vs current bearings ----
        N = 512
        Xw = np.zeros((N, 3), np.float32)
        bv = np.zeros((N, 3), np.float32)
        bv[:, 2] = 1.0
        unpx = np.zeros((N, 2), np.float32)
        val = np.zeros(N, bool)
        for j, (s, lm) in enumerate(pairs[:N]):
            Xw[j] = m.lm_pos[lm]
            bv[j] = rec.bv[s]
            unpx[j] = rec.unpx[s]
            val[j] = True
        if key is None:
            key = self._key(kfid)
        focal = float(self.cam_l.fx + self.cam_l.fy) * 0.5
        T_est, inl, n_in, okflag = mvg.p3p_ransac(
            jnp.asarray(Xw), jnp.asarray(bv), jnp.asarray(val), key,
            err_th_norm=p.fransac_err / focal, n_hyps=512)
        okflag_np, n_in_np = fetch_np(okflag, n_in)
        if not bool(okflag_np) or int(n_in_np) < 10:
            return None

        # ---- loop-local-map expansion (trackLoopLocalMap,
        # loop_closer.cpp:502-583): 3D landmarks of the loop KF's covisible
        # +/-15 keyframes, projected at the P3P estimate and descriptor-
        # matched against the query KF's unmatched keypoints, grow the match
        # set before the final PnP + >=30-inlier decision ----
        n_pairs_init = len(pairs)
        pairs = self._expand_loop_matches(m, rec, match_kf, pairs, T_est)
        n_pairs_local = len(pairs)

        # fixed shape: pairs are keyed by kp slot, so the kp table capacity
        # bounds them — one compile signature per run (round-5: the old
        # 1 << bit_length(len(pairs)) shape recompiled the PnP per closure)
        N = 1 << max(9, (rec.px.shape[0] - 1).bit_length())
        Xw = np.zeros((N, 3), np.float32)
        bv = np.zeros((N, 3), np.float32)
        bv[:, 2] = 1.0
        unpx = np.zeros((N, 2), np.float32)
        val = np.zeros(N, bool)
        for j, (s, lm) in enumerate(pairs[:N]):
            Xw[j] = m.lm_pos[lm]
            bv[j] = rec.bv[s]
            unpx[j] = rec.unpx[s]
            val[j] = True
        pnp = pnp_mod.pnp_robust_then_l2(
            fe_mod.calib_of(self.cam_l), T_est, jnp.asarray(Xw),
            jnp.asarray(unpx), jnp.asarray(val), robust_th2=p.robust_mono_th)
        n_inl_np, R_np, t_np, inl_pnp_np = fetch_np(
            pnp.n_inliers, pnp.T_cw.R, pnp.T_cw.t, pnp.inliers)
        n_inl = int(n_inl_np)
        if n_inl < 30:           # reference threshold (loop_closer.cpp:304)
            return None

        # corrected pose of the query KF
        T_corr = np.eye(4, dtype=np.float32)
        T_corr[:3, :3] = R_np
        T_corr[:3, 3] = t_np
        T_old = rec.T_cw
        jump = float(np.linalg.norm(
            np.linalg.inv(T_corr)[:3, 3] - np.linalg.inv(T_old)[:3, 3]))

        # ---- local pose graph over [match_kf .. kfid] (optimizer.cpp:2346) --
        self._pose_graph_correct(m, match_kf, kfid, T_corr)

        # ---- recompute landmark positions from corrected anchors ----
        self._recompute_landmarks(m)

        # ---- merge the verified landmark pairs (map_manager.cpp:801-882),
        # batched: one vectorized re-point pass per affected keyframe ----
        from ov2slam_tpu.io.profiler import Profiler
        inl_np = inl_pnp_np
        mdst, msrc = [], []
        for j, (s, lm) in enumerate(pairs[:N]):
            if not inl_np[j]:
                continue
            src = int(rec.lmid[s])
            if src >= 0 and src != lm:
                mdst.append(lm)
                msrc.append(src)
        with Profiler.instance().scope("2.LC_MergeBookkeeping"):
            n_merged = m.merge_landmarks_batch(mdst, msrc)
            m.update_covisibility(kfid)

        # ---- structure-only refinement of EXACTLY the merged landmarks
        # (Optimizer::structureOnlyBA refines the merged lmid set with all
        # poses constant, optimizer.cpp:2594-2782; loop_closer.cpp:353) ----
        if self.estimator is not None and n_merged > 0:
            self.estimator.local_ba_with_caps(
                m, kfid, max_kfs=24, max_lms=4096, max_obs=16384,
                max_iters=3, structure_only=True,
                only_lmids={d for d in mdst if m.lm_valid[d]})

        # ---- loose BA over the loop span when the correction was large
        # (reference: looseBA, optimizer.cpp:900-1673, triggered at
        # pose error >= 0.02, loop_closer.cpp:368) ----
        if self.estimator is not None and jump >= LOOSE_BA_MIN_JUMP:
            span = sorted(k for k in m.keyframes if match_kf <= k <= kfid)
            if len(span) >= 3:
                # ONE global Schur-PCG solve over the whole [loop KF, new
                # KF] span, loop KF gauge-fixed — the reference's looseBA
                # range, optimizer.cpp:995-1024 (falls back to overlapping
                # dense-window sweeps only beyond the global capacity)
                # wall-clock-bounded like the reference's max_solver_time
                # (0.2 s local, x2 offline, optimizer.cpp:460-468) — an
                # unbounded span solve at endurance scale stalls the live
                # pipeline for the whole padded problem
                self.estimator.span_ba(
                    m, span, max_iters=6,
                    time_budget_s=p.lc_loose_ba_time_s or None)
                self._recompute_landmarks(m)

        return LoopClosureEvent(
            query_kf=kfid, match_kf=match_kf, n_inliers=n_inl,
            n_merged=n_merged, pose_jump=jump,
            n_pairs_init=n_pairs_init, n_pairs_local=n_pairs_local)

    # ------------------------------------------------------------------
    def _expand_loop_matches(self, m: MapStore, rec, match_kf: int,
                             pairs, T_est, max_cands: int = 2048):
        """Grow the (query-kp-slot, loop-landmark) match set with the loop
        KF's local map (reference: LoopCloser::trackLoopLocalMap,
        loop_closer.cpp:502-583 — covisible KFs within +/-15 ids, projected
        matching with maxdist=10 px). Returns the extended pair list."""
        p = self.params
        matched_slots = {s for s, _ in pairs}
        matched_lms = {lm for _, lm in pairs}

        groups = []
        kf_list = [match_kf] + [k for k in m.covisible_kfs(match_kf)
                                if abs(k - match_kf) <= 15]
        for ckf in kf_list:
            crec = m.keyframes.get(ckf)
            if crec is not None:
                groups.append(crec.lmid[crec.valid & crec.is3d
                                        & (crec.lmid >= 0)])
        if not groups:
            return pairs
        ids = np.unique(np.concatenate(groups))
        ids = ids[m.lm_valid[ids] & m.lm_is3d[ids]]

        # landmarks the query KF already observes join directly
        # (loop_closer.cpp:545-552)
        local_set = set(int(x) for x in ids) - matched_lms
        for s in np.nonzero(rec.valid & (rec.lmid >= 0))[0]:
            lm = int(rec.lmid[s])
            if lm in local_set and s not in matched_slots:
                pairs.append((int(s), lm))
                matched_slots.add(int(s))
                matched_lms.add(lm)
                local_set.discard(lm)

        cand = np.asarray([lm for lm in local_set
                           if m.lm_desc_ok[lm]], np.int64)[:max_cands]
        if len(cand) == 0:
            return pairs
        M = max_cands
        pos = np.zeros((M, 3), np.float32)
        cdesc = np.zeros((M, 8), np.uint32)
        cvalid = np.zeros(M, bool)
        pos[:len(cand)] = m.lm_pos[cand]
        cdesc[:len(cand)] = m.lm_desc[cand]
        cvalid[:len(cand)] = True

        matchable = rec.valid & rec.desc_ok
        matchable[list(matched_slots)] = False

        from ov2slam_tpu.slam import frame as frame_mod
        from ov2slam_tpu.slam import mapper as mapper_mod
        snap = frame_mod.FrameKps.empty(rec.px.shape[0])._replace(
            px=jnp.asarray(rec.px), valid=jnp.asarray(rec.valid))
        res = mapper_mod.match_to_local_map(
            snap, jnp.asarray(rec.desc), jnp.asarray(rec.desc_ok),
            jnp.asarray(matchable),
            jnp.asarray(pos), jnp.asarray(cdesc), jnp.asarray(cvalid),
            self.cam_l, T_est.R, T_est.t,
            max_px_dist=10.0,                       # loop_closer.cpp:269
            max_desc_dist=p.fmax_desc_dist * 1.5)
        ok_np, slot_np = np.asarray(res.ok), np.asarray(res.kp_slot)
        for ci in np.nonzero(ok_np)[0]:
            s = int(slot_np[ci])
            if s < 0 or s in matched_slots:
                continue
            pairs.append((s, int(cand[ci])))
            matched_slots.add(s)
        return pairs

    # ------------------------------------------------------------------
    def _pose_graph_correct(self, m: MapStore, loop_kf: int, new_kf: int,
                            T_corr_new: np.ndarray):
        """Chain + loop-edge pose graph; loop KF gauge-fixed; corrected poses
        written back (optimizer.cpp:2346-2592)."""
        kf_ids = sorted(k for k in m.keyframes if loop_kf <= k <= new_kf)
        if len(kf_ids) < 3:
            # trivial: apply the correction directly
            m.keyframes[new_kf].T_cw = T_corr_new.copy()
            return
        F = 1 << max(3, (len(kf_ids) - 1).bit_length())
        E = F + 4
        R = np.tile(np.eye(3, dtype=np.float32), (F, 1, 1))
        t = np.zeros((F, 3), np.float32)
        opt = np.zeros(F, bool)
        for i, k in enumerate(kf_ids):
            T = m.keyframes[k].T_cw
            R[i] = T[:3, :3]
            t[i] = T[:3, 3]
            opt[i] = (i != 0)
        ei = np.zeros(E, np.int32)
        ej = np.zeros(E, np.int32)
        mR = np.tile(np.eye(3, dtype=np.float32), (E, 1, 1))
        mt = np.zeros((E, 3), np.float32)
        w = np.zeros(E, np.float32)
        n = 0
        for i in range(1, len(kf_ids)):
            Ta = m.keyframes[kf_ids[i]].T_cw.astype(np.float64)
            Tb = m.keyframes[kf_ids[i - 1]].T_cw.astype(np.float64)
            Trel = Ta @ np.linalg.inv(Tb)
            ei[n] = i
            ej[n] = i - 1
            mR[n] = Trel[:3, :3].astype(np.float32)
            mt[n] = Trel[:3, 3].astype(np.float32)
            w[n] = 1.0
            n += 1
        # loop edge: corrected relative pose new-vs-loop
        T_loop = m.keyframes[loop_kf].T_cw.astype(np.float64)
        Trel = T_corr_new.astype(np.float64) @ np.linalg.inv(T_loop)
        ei[n] = len(kf_ids) - 1
        ej[n] = 0
        mR[n] = Trel[:3, :3].astype(np.float32)
        mt[n] = Trel[:3, 3].astype(np.float32)
        # unit weight, same as the chain edges: the reference adds the loop
        # factor with no special loss/weighting (optimizer.cpp:2420-2423);
        # the LM iterations distribute the correction along the chain
        w[n] = 1.0
        n += 1

        prob = pg_mod.PoseGraphProblem(
            R=jnp.asarray(R), t=jnp.asarray(t), pose_opt=jnp.asarray(opt),
            edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
            meas_R=jnp.asarray(mR), meas_t=jnp.asarray(mt),
            edge_weight=jnp.asarray(w))
        out = pg_mod.solve_pose_graph(prob, max_iters=10)
        R_new = np.asarray(out.R)
        t_new = np.asarray(out.t)
        for i, k in enumerate(kf_ids):
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = R_new[i]
            T[:3, 3] = t_new[i]
            m.keyframes[k].T_cw = T
        # propagate to keyframes newer than new_kf (rare; optimizer.cpp:2527)
        newer = [k for k in m.keyframes if k > new_kf]
        if newer:
            T_old = np.eye(4)
            T_old[:3, :3] = R[len(kf_ids) - 1]
            T_old[:3, 3] = t[len(kf_ids) - 1]
            corr = np.linalg.inv(T_old) @ m.keyframes[new_kf].T_cw.astype(np.float64)
            for k in newer:
                m.keyframes[k].T_cw = (
                    m.keyframes[k].T_cw.astype(np.float64) @ corr
                ).astype(np.float32)

    # ------------------------------------------------------------------
    def _recompute_landmarks(self, m: MapStore):
        """Anchored landmarks follow their anchor keyframes: rebuild world
        positions from (anchor pose, bearing, inverse depth). Vectorized —
        one pose inversion per anchor KF, one einsum over all landmarks
        (this runs at every loop closure; a per-landmark Python loop costs
        tens of host ms at map scale)."""
        ids = np.nonzero(m.lm_valid & m.lm_is3d)[0]
        if len(ids) == 0:
            return
        anchors = m.lm_anchor[ids]
        kf_ids = np.unique(anchors)
        live = np.asarray([int(k) in m.keyframes for k in kf_ids])
        T_wa = np.tile(np.eye(4), (len(kf_ids), 1, 1))
        for i in np.nonzero(live)[0]:
            T_wa[i] = np.linalg.inv(
                m.keyframes[int(kf_ids[i])].T_cw.astype(np.float64))
        idx = np.searchsorted(kf_ids, anchors)
        keep = live[idx]
        ids, idx = ids[keep], idx[keep]
        Xa = m.lm_bearing[ids] / np.maximum(m.lm_lam[ids][:, None], 1e-9)
        m.lm_pos[ids] = (
            np.einsum("nij,nj->ni", T_wa[idx, :3, :3], Xa) + T_wa[idx, :3, 3]
        ).astype(np.float32)
        m._device_dirty = True
