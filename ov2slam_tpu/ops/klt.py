"""Forward-backward pyramidal Lucas-Kanade optical flow, batched on device.

Replaces the reference's FeatureTracker::fbKltTracking wrapping
cv::calcOpticalFlowPyrLK fwd + bwd (reference: src/feature_tracker.cpp:35-137):
per level, iterative patch Gauss-Newton with min-eigenvalue gating; the
forward-backward distance check and border checks are fused into one call.

TPU-first: one shot tracks ALL keypoints at once — (N, win*win) patches,
per-keypoint 2x2 normal equations solved in closed form, `lax.fori_loop` over
iterations with per-keypoint convergence masking, Python loop over the (static)
pyramid levels. No host round trips inside the solve.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ov2slam_tpu.ops import image as im


class KLTResult(NamedTuple):
    points: jnp.ndarray   # (N, 2) tracked positions in level-0 pixels
    status: jnp.ndarray   # (N,) bool — tracked, well-conditioned, in-border
    error: jnp.ndarray    # (N,) mean |I - J| over the window (OpenCV-style)


# ---------------------------------------------------------------------------
# gather-free whole-image patch sampling
#
# TPU gathers go through the scalar pipeline and dominate the tracking cost
# if each GN iteration gathers its patch. Instead, bilinear patch sampling is
# expressed as two MXU matmuls against the WHOLE image with hat-function
# weight matrices: patch = Wy @ img @ Wx^T, where Wy (N, win, H) and
# Wx (N, win, W) have rows w[j] = max(0, 1 - |j - q|) (exactly two nonzero
# entries per row => exact bilinear interpolation). The matmul "wastes" flops
# on the mostly-zero weights, but at this problem size the MXU is otherwise
# idle and the win is eliminating every gather, window extraction, and
# re-centering chunk from the GN iteration — the whole level is one
# while_loop of dense matmuls.
# ---------------------------------------------------------------------------

_PREC = jax.lax.Precision.HIGHEST   # full-f32 MXU passes; bf16 default would
                                    # quantize image values and break subpixel
                                    # convergence


def _hat_weights(q: jnp.ndarray, size: int) -> jnp.ndarray:
    """q (N, win) absolute positions -> (N, win, size) bilinear weights."""
    j = jnp.arange(size, dtype=q.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(j[None, None, :] - q[..., None]))


def _hat_xy(pts: jnp.ndarray, win: int, H: int, W: int):
    """Hat weight matrices for win x win patches centered at pts (N, 2)."""
    r = (win - 1) / 2.0
    offs = jnp.arange(win, dtype=pts.dtype) - r
    Wx = _hat_weights(pts[:, None, 0] + offs[None, :], W)   # (N, win, W)
    Wy = _hat_weights(pts[:, None, 1] + offs[None, :], H)   # (N, win, H)
    return Wy, Wx


def _sample_patches_mm(imgs, Wy: jnp.ndarray, Wx: jnp.ndarray):
    """Sample win x win patches from one image (H, W) or a stack (C, H, W)
    via hat-weight matmuls. Returns (N, win*win) or (C, N, win*win)."""
    single = imgs.ndim == 2
    if single:
        imgs = imgs[None]
    rows = jnp.einsum("nah,chw->cnaw", Wy, imgs, precision=_PREC)
    p = jnp.einsum("cnaw,nbw->cnab", rows, Wx, precision=_PREC)
    n, win = Wy.shape[0], Wy.shape[1]
    p = p.reshape(p.shape[0], n, win * win)
    return p[0] if single else p


def _track_level(
    prev_img: jnp.ndarray,
    next_img: jnp.ndarray,
    prev_pts: jnp.ndarray,   # (N, 2) coords at this level
    guess: jnp.ndarray,      # (N, 2) current estimate at this level
    valid: jnp.ndarray,      # (N,) bool
    win: int,
    max_iters: int,
    eps: float,
    min_eig_th: float,
    prev_grad: Tuple[jnp.ndarray, jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One pyramid level of LK, gather-free. Returns (new_pts, ok, err)."""
    H, W = prev_img.shape
    half = (win - 1) / 2.0
    dt = prev_pts.dtype

    # template patches + gradients at prev_pts (fixed for all iterations),
    # sampled in ONE stacked matmul
    if prev_grad is None:
        ix_img, iy_img = im.scharr_gradients(prev_img)
    else:
        ix_img, iy_img = prev_grad
    Wy0, Wx0 = _hat_xy(prev_pts, win, H, W)
    tmpl, gx, gy = _sample_patches_mm(
        jnp.stack([prev_img, ix_img, iy_img]), Wy0, Wx0)

    # 2x2 spatial gradient matrix per keypoint
    gxx = jnp.sum(gx * gx, axis=-1)
    gxy = jnp.sum(gx * gy, axis=-1)
    gyy = jnp.sum(gy * gy, axis=-1)
    det = gxx * gyy - gxy * gxy

    # min eigenvalue of G / window-area (OpenCV minEigThreshold semantics)
    tr = gxx + gyy
    min_eig = (tr - jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0))) * 0.5
    min_eig = min_eig / (win * win)
    well_cond = min_eig > min_eig_th

    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)

    in_bounds0 = (
        (prev_pts[:, 0] >= half) & (prev_pts[:, 0] < W - half)
        & (prev_pts[:, 1] >= half) & (prev_pts[:, 1] < H - half)
    )
    track = valid & well_cond & in_bounds0

    def sample_next(p):
        Wy, Wx = _hat_xy(p, win, H, W)
        return _sample_patches_mm(next_img, Wy, Wx)

    def gn_delta(p, a):
        cur = sample_next(p)
        diff = cur - tmpl
        bx = jnp.sum(diff * gx, axis=-1)
        by = jnp.sum(diff * gy, axis=-1)
        # delta = -G^-1 b
        dx = -(gyy * bx - gxy * by) * inv_det
        dy = -(-gxy * bx + gxx * by) * inv_det
        return jnp.where(a[:, None], jnp.stack([dx, dy], axis=-1), 0.0)

    def cond(carry):
        it, p, a = carry
        return (it < max_iters) & jnp.any(a)

    def body(carry):
        it, p, a = carry
        step = gn_delta(p, a)
        new_p = p + step
        conv = jnp.sum(step * step, axis=-1) < eps * eps
        # drop points that wandered out of the image (their samples are 0)
        inb = ((new_p[:, 0] >= 0) & (new_p[:, 0] < W - 1)
               & (new_p[:, 1] >= 0) & (new_p[:, 1] < H - 1))
        return it + 1, new_p, a & ~conv & inb

    _, pts, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), guess, track))

    in_bounds1 = (
        (pts[:, 0] >= half) & (pts[:, 0] < W - half)
        & (pts[:, 1] >= half) & (pts[:, 1] < H - half)
    )
    ok = track & in_bounds1

    err = jnp.mean(jnp.abs(sample_next(pts) - tmpl), axis=-1)
    return pts, ok, err


def pyr_klt(
    prev_pyr: List[jnp.ndarray],
    next_pyr: List[jnp.ndarray],
    prev_pts: jnp.ndarray,       # (N, 2) level-0 pixels
    init_pts: jnp.ndarray,       # (N, 2) level-0 prior for the tracked pos
    valid: jnp.ndarray,          # (N,) bool
    nlevels: int,
    win: int = 9,
    max_iters: int = 30,
    eps: float = 0.01,
    min_eig_th: float = 1e-4,
    prev_grad_pyr: List[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> KLTResult:
    """Pyramidal LK from coarse to fine using `nlevels`+1 pyramid images.

    prev_grad_pyr optionally supplies precomputed Scharr gradient pyramids of
    the template frame (computed once per frame instead of once per call)."""
    scale = 2.0 ** nlevels
    guess = init_pts / scale
    ok = valid
    err = jnp.zeros(prev_pts.shape[0], prev_pts.dtype)
    for lvl in range(nlevels, -1, -1):
        s = 2.0 ** lvl
        pl = prev_pts / s
        pg = None if prev_grad_pyr is None else prev_grad_pyr[lvl]
        guess, ok_l, err = _track_level(
            prev_pyr[lvl], next_pyr[lvl], pl, guess, valid, win, max_iters,
            eps, min_eig_th, prev_grad=pg
        )
        ok = ok_l if lvl == nlevels else ok & ok_l
        if lvl > 0:
            guess = guess * 2.0
    return KLTResult(points=guess, status=ok, error=err)


@functools.partial(
    jax.jit,
    static_argnames=("nlevels", "win", "max_iters"),
)
def fb_klt_tracking(
    prev_pyr: Tuple[jnp.ndarray, ...],
    next_pyr: Tuple[jnp.ndarray, ...],
    prev_pts: jnp.ndarray,
    prior_pts: jnp.ndarray,
    valid: jnp.ndarray,
    nlevels: int = 3,
    win: int = 9,
    max_iters: int = 30,
    eps: float = 0.01,
    max_fb_dist: float = 0.5,
    max_err: float = 30.0,
    min_eig_th: float = 1e-4,
    prev_grad_pyr=None,
    next_grad_pyr=None,
) -> KLTResult:
    """Forward-backward KLT with error + FB-distance gating — the whole of the
    reference's fbKltTracking (feature_tracker.cpp:35-137) as one device call.

    prior_pts seeds the forward track (motion-model / projection priors,
    OPTFLOW_USE_INITIAL_FLOW in the reference); the backward track is seeded
    at the original positions and must return there within max_fb_dist.
    """
    prev_pyr = list(prev_pyr)
    next_pyr = list(next_pyr)
    fwd = pyr_klt(prev_pyr, next_pyr, prev_pts, prior_pts, valid,
                  nlevels, win, max_iters, eps, min_eig_th, prev_grad_pyr)
    good = fwd.status & (fwd.error < max_err)
    # backward pass: level 0 only, seeded at the original positions (the
    # reference's backward call uses maxLevel=0 + OPTFLOW_USE_INITIAL_FLOW
    # with the original kps as the initial guess, feature_tracker.cpp:113-117)
    ngp = None if next_grad_pyr is None else next_grad_pyr[:1]
    bwd = pyr_klt(next_pyr[:1], prev_pyr[:1], fwd.points, prev_pts, good,
                  0, win, max_iters, eps, min_eig_th, ngp)
    fb_dist = jnp.linalg.norm(bwd.points - prev_pts, axis=-1)
    ok = good & bwd.status & (fb_dist <= max_fb_dist)
    return KLTResult(points=fwd.points, status=ok, error=fwd.error)
