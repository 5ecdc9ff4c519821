"""Batched landmark merging (MapStore.merge_landmarks_batch) and the
merged-landmarks-only structure-only BA restriction
(Optimizer::structureOnlyBA semantics, reference optimizer.cpp:2594-2782)."""

import numpy as np
import jax.numpy as jnp

from ov2slam_tpu.config import SlamParams
from ov2slam_tpu.core.lie import SE3
from ov2slam_tpu.opt.residuals import Calib
from ov2slam_tpu.slam.estimator import Estimator
from ov2slam_tpu.slam.map import KeyframeRecord, MapStore


FX = FY = 450.0
CX, CY = 376.0, 240.0
BASE = 0.11


def _project(T_cw, Xw):
    Xc = Xw @ T_cw[:3, :3].T + T_cw[:3, 3]
    return np.stack([FX * Xc[:, 0] / Xc[:, 2] + CX,
                     FY * Xc[:, 1] / Xc[:, 2] + CY], axis=1), Xc


def make_map(n_kfs=4, n_lms=64, seed=0, noise=0.0):
    """Consistent synthetic map: landmarks in front of a translating camera,
    every KF observes every landmark (left + right)."""
    rng = np.random.default_rng(seed)
    m = MapStore(lm_capacity=256)
    ids = m.alloc_landmarks(n_lms)
    Xw = np.column_stack([rng.uniform(-2, 2, n_lms),
                          rng.uniform(-1.5, 1.5, n_lms),
                          rng.uniform(5, 9, n_lms)]).astype(np.float32)
    K = 128
    for k in range(n_kfs):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [-(0.15 * k), 0.0, 0.0]   # camera moves +x in world
        px, Xc = _project(T, Xw + noise * rng.normal(size=Xw.shape))
        T_r = T.copy()
        T_r[0, 3] -= BASE
        rpx, _ = _project(T_r, Xw)
        rec = KeyframeRecord(
            kfid=k, time=k * 0.5, T_cw=T,
            px=np.zeros((K, 2), np.float32), unpx=np.zeros((K, 2), np.float32),
            bv=np.zeros((K, 3), np.float32),
            lmid=np.full(K, -1, np.int64), valid=np.zeros(K, bool),
            is3d=np.zeros(K, bool), rpx=np.zeros((K, 2), np.float32),
            has_right=np.zeros(K, bool),
            desc=np.zeros((K, 8), np.uint32), desc_ok=np.zeros(K, bool))
        rec.px[:n_lms] = px
        rec.unpx[:n_lms] = px
        bv = Xc / np.linalg.norm(Xc, axis=1, keepdims=True)
        rec.bv[:n_lms] = bv
        rec.lmid[:n_lms] = ids
        rec.valid[:n_lms] = True
        rec.is3d[:n_lms] = True
        rec.rpx[:n_lms] = rpx
        rec.has_right[:n_lms] = True
        rec.desc_ok[:n_lms] = True
        rec.desc[:n_lms] = rng.integers(0, 2**32, (n_lms, 8), dtype=np.uint64
                                        ).astype(np.uint32)
        if k == 0:
            bearings = Xc / Xc[:, 2:3]
            m.set_positions(ids, Xw, anchor_kf=0, bearings=bearings,
                            lams=1.0 / Xc[:, 2])
        m.add_keyframe(rec)
        m.add_descriptors(ids, rec.desc[:n_lms])
    return m, ids, Xw


def _snapshot(m):
    return {k: getattr(m, k).copy()
            for k in ("lm_pos", "lm_lam", "lm_valid", "lm_is3d", "lm_anchor")}


def test_batch_merge_matches_sequential():
    pairs_rng = np.random.default_rng(7)
    m1, ids1, _ = make_map()
    m2, ids2, _ = make_map()
    assert (ids1 == ids2).all()
    # extra "duplicate" landmarks observed by only the last KF (fresh tracks,
    # the shape of loop-closure merges)
    extra1 = m1.alloc_landmarks(16)
    extra2 = m2.alloc_landmarks(16)
    for m, extra in ((m1, extra1), (m2, extra2)):
        rec = m.keyframes[3]
        rec.lmid[100:116] = extra
        rec.valid[100:116] = True
        for e in extra:
            m.lm_obs[int(e)].add(3)
    dsts = pairs_rng.choice(ids1, 16, replace=True).tolist()
    srcs = extra1.tolist()
    # sequential reference
    n_seq = 0
    for d, s in zip(dsts, srcs):
        if d != s and m1.lm_valid[d] and m1.lm_valid[s]:
            m1.merge_landmarks(int(d), int(s))
            n_seq += 1
    n_batch = m2.merge_landmarks_batch(dsts, srcs)
    assert n_batch == n_seq
    s1, s2 = _snapshot(m1), _snapshot(m2)
    for k in s1:
        np.testing.assert_array_equal(s1[k], s2[k], err_msg=k)
    for k in m1.keyframes:
        np.testing.assert_array_equal(m1.keyframes[k].lmid,
                                      m2.keyframes[k].lmid)
        np.testing.assert_array_equal(m1.keyframes[k].valid,
                                      m2.keyframes[k].valid)
    for lm in ids1.tolist():
        assert m1.lm_obs.get(lm, set()) == m2.lm_obs.get(lm, set())


def test_batch_merge_chain_fallback():
    """A src that is another pair's dst must behave like sequential merges."""
    m1, ids1, _ = make_map()
    m2, _, _ = make_map()
    a, b, c = int(ids1[0]), int(ids1[1]), int(ids1[2])
    # chain: b <- c then a <- b  (second merge sees b already dead)
    for m in (m1,):
        m.merge_landmarks(b, c)
        m.merge_landmarks(a, b)
    m2.merge_landmarks_batch([b, a], [c, b])
    s1, s2 = _snapshot(m1), _snapshot(m2)
    for k in s1:
        np.testing.assert_array_equal(s1[k], s2[k], err_msg=k)


def test_structure_only_ba_touches_only_given_landmarks():
    m, ids, Xw = make_map(noise=0.0)
    # perturb every landmark so a full structure-only BA WOULD move them all
    rng = np.random.default_rng(3)
    m.lm_pos[ids] += rng.normal(0, 0.05, (len(ids), 3)).astype(np.float32)
    m.lm_lam[ids] *= 1.02
    p = SlamParams.from_dict({"stereo": 1, "nmin_covscore": 1,
                              "buse_inv_depth": 0})
    cal = Calib(jnp.asarray(FX), jnp.asarray(FY),
                jnp.asarray(CX), jnp.asarray(CY))
    est = Estimator(p, cal, cal,
                    SE3(jnp.eye(3, dtype=jnp.float32),
                        jnp.asarray([-BASE, 0, 0], jnp.float32)))
    target = set(int(x) for x in ids[:10])
    before = _snapshot(m)
    out = est.local_ba_with_caps(m, 3, 8, 256, 4096, max_iters=4,
                                 structure_only=True, only_lmids=target)
    assert out.ran
    rest = np.asarray([i for i in ids if int(i) not in target])
    # untouched landmarks: bit-identical
    np.testing.assert_array_equal(m.lm_pos[rest], before["lm_pos"][rest])
    np.testing.assert_array_equal(m.lm_lam[rest], before["lm_lam"][rest])
    # poses unchanged (structure-only)
    for k, rec in m.keyframes.items():
        assert rec.T_cw[0, 3] == -(0.15 * k) * 1.0
    # the targeted landmarks moved toward the true positions
    tgt = np.asarray(sorted(target))
    err_before = np.linalg.norm(before["lm_pos"][tgt] - Xw[:10], axis=1)
    err_after = np.linalg.norm(m.lm_pos[tgt] - Xw[:10], axis=1)
    assert err_after.mean() < 0.5 * err_before.mean()
