"""Per-frame keypoint state: a fixed-capacity padded SoA table.

Replaces the reference's Frame (reference: include/frame.hpp:46-237,
src/frame.cpp): hash-map keypoint store + occupancy grid become a (K,) padded
struct-of-arrays with validity masks; the occupancy grid is derived on the
fly from pixel coords (integer cell indices) instead of being maintained
incrementally; erase = clearing the valid bit.

Landmark ids are host-assigned; ``lmid`` doubles as the landmark's arena slot
in the map store, so device code can gather landmark data directly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ov2slam_tpu.core import camera as cam_mod
from ov2slam_tpu.core.camera import Camera


class FrameKps(NamedTuple):
    """Padded keypoint table (capacity K)."""

    px: jnp.ndarray        # (K, 2) raw pixel coords
    unpx: jnp.ndarray      # (K, 2) undistorted pixel coords
    bv: jnp.ndarray        # (K, 3) unit bearing (left cam frame)
    lmid: jnp.ndarray      # (K,) int32 — landmark arena slot, -1 = empty
    valid: jnp.ndarray     # (K,) bool
    is3d: jnp.ndarray      # (K,) bool — landmark has a triangulated position
    rpx: jnp.ndarray       # (K, 2) right-cam pixel observation
    has_right: jnp.ndarray # (K,) bool
    kf_bv: jnp.ndarray     # (K, 3) bearing at the last keyframe (for the
                           # rotation-compensated parallax vs KF)
    kf_px: jnp.ndarray     # (K, 2) raw pixel coords at the last keyframe
                           # (template positions for KF-to-frame tracking,
                           # visual_front_end.cpp:278-442)

    @property
    def cap(self) -> int:
        return self.px.shape[0]

    @staticmethod
    def empty(cap: int, dtype=jnp.float32) -> "FrameKps":
        return FrameKps(
            px=jnp.zeros((cap, 2), dtype),
            unpx=jnp.zeros((cap, 2), dtype),
            bv=jnp.zeros((cap, 3), dtype),
            lmid=jnp.full((cap,), -1, jnp.int32),
            valid=jnp.zeros((cap,), bool),
            is3d=jnp.zeros((cap,), bool),
            rpx=jnp.zeros((cap, 2), dtype),
            has_right=jnp.zeros((cap,), bool),
            kf_bv=jnp.zeros((cap, 3), dtype),
            kf_px=jnp.zeros((cap, 2), dtype),
        )


def update_positions(
    kps: FrameKps, cam: Camera, new_px: jnp.ndarray, ok: jnp.ndarray
) -> FrameKps:
    """After tracking: move keypoints to new_px, drop failures, recompute
    undistorted coords + bearings (reference: frame.cpp updateKeypoint
    :246-262 — undistort + bearing = iK * unpx)."""
    valid = kps.valid & ok & cam_mod.in_image(cam, new_px)
    unpx = cam_mod.undistort_px(cam, new_px)
    bv = cam_mod.bearing_from_undist_px(cam, unpx)
    return kps._replace(
        px=jnp.where(valid[:, None], new_px, kps.px),
        unpx=jnp.where(valid[:, None], unpx, kps.unpx),
        bv=jnp.where(valid[:, None], bv, kps.bv),
        valid=valid,
        has_right=jnp.zeros_like(kps.has_right),
    )


def insert_keypoints(
    kps: FrameKps,
    cam: Camera,
    new_px: jnp.ndarray,      # (M, 2) candidate detections
    new_ok: jnp.ndarray,      # (M,) bool
    new_lmids: jnp.ndarray,   # (M,) int32 pre-assigned landmark ids
) -> FrameKps:
    """Place up to M new keypoints into free slots of the table.

    Fixed-shape compaction: free slots and accepted candidates are both
    ranked by cumsum; candidate i goes to the i-th free slot."""
    K = kps.cap
    free = ~kps.valid                                   # (K,)
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # rank among free slots
    cand_rank = jnp.cumsum(new_ok.astype(jnp.int32)) - 1
    n_free = jnp.sum(free)

    # target slot per candidate: the cand_rank-th free slot
    # build mapping rank -> slot index
    slot_of_rank = jnp.full((K + 1,), K, jnp.int32)
    slot_ids = jnp.arange(K, dtype=jnp.int32)
    slot_of_rank = slot_of_rank.at[jnp.where(free, free_rank, K)].set(slot_ids)

    accept = new_ok & (cand_rank < n_free)
    tgt = jnp.where(accept, slot_of_rank[jnp.clip(cand_rank, 0, K)], K)  # (M,)

    unpx = cam_mod.undistort_px(cam, new_px)
    bv = cam_mod.bearing_from_undist_px(cam, unpx)

    def scat(dest, src):
        return dest.at[tgt].set(src, mode="drop")

    return kps._replace(
        px=scat(kps.px, new_px),
        unpx=scat(kps.unpx, unpx),
        bv=scat(kps.bv, bv),
        lmid=scat(kps.lmid, new_lmids),
        valid=scat(kps.valid, jnp.ones_like(new_ok)),
        is3d=scat(kps.is3d, jnp.zeros_like(new_ok)),
        rpx=scat(kps.rpx, jnp.zeros_like(new_px)),
        has_right=scat(kps.has_right, jnp.zeros_like(new_ok)),
        kf_bv=scat(kps.kf_bv, bv),
        kf_px=scat(kps.kf_px, new_px),
    )


def occupancy_cells(kps: FrameKps, cellsize: int, nw: int, nh: int) -> jnp.ndarray:
    """(K,) linearized cell index per keypoint (nh*nw = out of range for
    invalid) — the device stand-in for the reference's vgridkps_."""
    ci = jnp.floor(kps.px[:, 0] / cellsize).astype(jnp.int32)
    ri = jnp.floor(kps.px[:, 1] / cellsize).astype(jnp.int32)
    inb = (ci >= 0) & (ci < nw) & (ri >= 0) & (ri < nh) & kps.valid
    return jnp.where(inb, ri * nw + ci, nh * nw)
