"""Online place recognition: incremental BoW-style index + loop candidate
detection.

Replaces OBIndex2 + iBoW-LCD (reference: Thirdparty/obindex2,
Thirdparty/ibow_lcd/src/lcdetector.cc:54-160): keyframe descriptors feed an
incremental binary index; queries return vote-ranked previous keyframes;
candidates pass island grouping + temporal-consistency filtering before
geometric verification.

The index itself is native C++ (native/bow/bow_index.cpp, built on first use
and loaded via ctypes) — host-side pointer-chasing work, per SURVEY §2.2.
A pure-numpy fallback implements the same interface when no compiler exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native", "bow")


def _load_native():
    lib_path = os.path.join(_NATIVE_DIR, "libbow_index.so")
    if not os.path.exists(lib_path):
        src = os.path.join(_NATIVE_DIR, "bow_index.cpp")
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(lib_path)
        lib.bow_create.restype = ctypes.c_void_p
        lib.bow_destroy.argtypes = [ctypes.c_void_p]
        lib.bow_num_images.argtypes = [ctypes.c_void_p]
        lib.bow_num_images.restype = ctypes.c_int
        lib.bow_add_image.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
            ctypes.c_int]
        lib.bow_query.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")]
        lib.bow_query.restype = ctypes.c_int
        return lib
    except OSError:
        return None


_LIB = None
_LIB_TRIED = False


def _get_lib():
    global _LIB, _LIB_TRIED
    if not _LIB_TRIED:
        _LIB = _load_native()
        _LIB_TRIED = True
    return _LIB


class BinaryIndex:
    """Incremental image index over packed 256-bit descriptors."""

    def __init__(self, force_python: bool = False):
        self._lib = None if force_python else _get_lib()
        if self._lib is not None:
            self._h = ctypes.c_void_p(self._lib.bow_create())
        else:
            self._imgs: List[Tuple[int, np.ndarray]] = []

    @property
    def native(self) -> bool:
        return self._lib is not None

    def add_image(self, image_id: int, descs: np.ndarray):
        d = np.ascontiguousarray(descs, np.uint32)
        if self._lib is not None:
            self._lib.bow_add_image(self._h, int(image_id), d, len(d))
        else:
            self._imgs.append((int(image_id), d))

    def query(self, descs: np.ndarray, max_image_id: int, topk: int = 10
              ) -> List[Tuple[int, float]]:
        d = np.ascontiguousarray(descs, np.uint32)
        if self._lib is not None:
            ids = np.zeros(topk, np.int32)
            scores = np.zeros(topk, np.float32)
            k = self._lib.bow_query(self._h, d, len(d), int(max_image_id),
                                    topk, ids, scores)
            return [(int(ids[i]), float(scores[i])) for i in range(k)]
        # numpy fallback: brute-force hamming voting
        votes: Dict[int, float] = {}
        q = np.unpackbits(d.view(np.uint8), axis=1)            # (n, 256)
        for img_id, stored in self._imgs:
            if img_id > max_image_id or len(stored) == 0:
                continue
            s = np.unpackbits(stored.view(np.uint8), axis=1)
            ham = (q[:, None, :] != s[None, :, :]).sum(-1)     # (n, m)
            best = ham.min(axis=1)
            m = best <= 64
            if m.any():
                votes[img_id] = float((1.0 - best[m] / 256.0).sum())
        ranked = sorted(votes.items(), key=lambda kv: -kv[1])[:topk]
        return [(i, s) for i, s in ranked]


@dataclass
class LoopCandidate:
    query_kf: int
    match_kf: int
    score: float
    # every (kf, score) member of the winning island — candidates the BoW
    # actually voted for, used to re-resolve the match if match_kf was
    # culled from the map
    island: List[Tuple[int, float]] = field(default_factory=list)


@dataclass
class LCDetector:
    """iBoW-LCD-style loop candidate detection: vote query + island grouping
    + temporal consistency.

    Parameter defaults follow iBoW-LCD's LCDetectorParams (reference:
    Thirdparty/ibow_lcd/include/ibow_lcd/lcdetector.h:42-80, which ov2slam
    uses unmodified, loop_closer.cpp:48): p = 100 images (= keyframes here —
    ov2slam feeds the detector once per KF), island_size = 20,
    min_score = 0.3 on min-max-normalized scores. Deviations, documented:
    `min_consecutive` consecutive consistent islands gate geometric
    verification (the reference verifies EVERY island candidate with an
    epipolar check, lcdetector.cc:154-160 — our verification is the heavier
    device kNN+P3P pipeline, so a cheap 2-query consistency gate stands in);
    `min_score` is an optional ABSOLUTE island-vote floor, off (0.0) by
    default. Short-sequence harnesses (tests, the synthetic hard bench)
    override p_wait/min_consecutive to match their keyframe counts."""

    p_wait: int = 100          # KFs excluded before loop search (iBoW p)
    island_size: int = 20      # id radius grouping candidates into islands
    min_score: float = 0.0     # absolute island vote floor (0 = off)
    min_consecutive: int = 2   # consecutive consistent islands required
    # min-max-normalized per-candidate score cut before island grouping
    # (iBoW-LCD filterCandidates, lcdetector.cc:183-204, default 0.3)
    min_norm_score: float = 0.3
    force_python_index: bool = False

    def __post_init__(self):
        self.index = BinaryIndex(force_python=self.force_python_index)
        self._last_island: Optional[Tuple[int, int]] = None
        self._consecutive = 0

    def process(self, kf_id: int, descs: np.ndarray) -> Optional[LoopCandidate]:
        """Query then add (the reference queries before inserting,
        lcdetector.cc:54-90). Returns a candidate or None."""
        result = None
        if len(descs) > 0:
            hits = self.index.query(descs, max_image_id=kf_id - self.p_wait,
                                    topk=20)
            result = self._detect(kf_id, hits)
            self.index.add_image(kf_id, descs)
        return result

    def _detect(self, kf_id: int, hits: List[Tuple[int, float]]
                ) -> Optional[LoopCandidate]:
        if not hits:
            self._consecutive = 0
            self._last_island = None
            return None
        # min-max-normalized candidate cut (iBoW-LCD filterCandidates,
        # lcdetector.cc:183-204): weak tail candidates never join an island
        if len(hits) > 1:
            scores = [s for _, s in hits]
            hi_s, lo_s = max(scores), min(scores)
            if hi_s > lo_s:
                hits = [(k, s) for k, s in hits
                        if (s - lo_s) / (hi_s - lo_s) > self.min_norm_score]
        if not hits:
            self._consecutive = 0
            self._last_island = None
            return None
        # group hits into islands of nearby keyframe ids
        hits = sorted(hits)
        islands: List[List[Tuple[int, float]]] = []
        for kf, sc in hits:
            if islands and kf - islands[-1][-1][0] <= self.island_size:
                islands[-1].append((kf, sc))
            else:
                islands.append([(kf, sc)])
        # best island by summed score
        def island_score(isl):
            return sum(s for _, s in isl)

        best = max(islands, key=island_score)
        # prior-island preference (getPriorIslands, lcdetector.cc:124-130):
        # an island overlapping the previous query's island wins even if a
        # different island now scores higher — temporal continuity beats
        # raw score
        if self._last_island is not None:
            plo, phi = self._last_island
            for isl in islands:
                ilo, ihi = isl[0][0], isl[-1][0]
                if (ilo <= phi + self.island_size
                        and ihi >= plo - self.island_size):
                    if island_score(isl) >= self.min_score:
                        best = isl
                    break
        score = island_score(best)
        if score < self.min_score:
            self._consecutive = 0
            self._last_island = None
            return None
        lo, hi = best[0][0], best[-1][0]
        # temporal consistency with the previous query's best island
        if self._last_island is not None:
            plo, phi = self._last_island
            if lo <= phi + self.island_size and hi >= plo - self.island_size:
                self._consecutive += 1
            else:
                self._consecutive = 1
        else:
            self._consecutive = 1
        self._last_island = (lo, hi)
        if self._consecutive >= self.min_consecutive:
            kf_best = max(best, key=lambda t: t[1])[0]
            return LoopCandidate(query_kf=kf_id, match_kf=kf_best,
                                 score=score, island=list(best))
        return None
