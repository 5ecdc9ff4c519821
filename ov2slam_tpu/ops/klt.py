"""Forward-backward pyramidal Lucas-Kanade optical flow, batched on device.

Replaces the reference's FeatureTracker::fbKltTracking wrapping
cv::calcOpticalFlowPyrLK fwd + bwd (reference: src/feature_tracker.cpp:35-137):
per level, iterative patch Gauss-Newton with min-eigenvalue gating; the
forward-backward distance check and border checks are fused into one call.

TPU-first: one shot tracks ALL keypoints at once — (N, win*win) patches,
per-keypoint 2x2 normal equations solved in closed form, `lax.while_loop` over
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
# windowed gather-light patch sampling
#
# Per-pixel gathers in every GN iteration would go through the TPU's scalar
# pipeline and dominate the tracking cost; resampling against the whole image
# with (N*win, H) x (H, W) hat-weight matmuls keeps everything on the MXU but
# burns ~3.3 GFLOP per iteration at 752x480 (measured 8.7 ms for 30
# iterations, the single largest chunk of the per-frame budget). The fast
# middle ground: extract one integer-aligned (ws, ws) window per keypoint per
# CHUNK of iterations (a single batched dynamic-slice, ~200k elements), then
# express bilinear sampling INSIDE the window as two small batched matmuls
# with hat-function weight matrices: patch = Wy @ window @ Wx^T with
# W[a, j] = max(0, 1 - |j - q_a|) (exactly two nonzero entries per row =>
# exact bilinear interpolation). GN iterations within a chunk run entirely on
# the VPU/MXU (~50 MFLOP for 30 iterations, 2.7x faster end to end); points
# that drift past the window margin pause and resume after the next chunk's
# re-extraction.
# ---------------------------------------------------------------------------

_PREC = jax.lax.Precision.HIGHEST   # full-f32 MXU passes; bf16 default would
                                    # quantize image values and break subpixel
                                    # convergence


def _use_pallas() -> bool:
    """The Pallas GN-loop kernel (ops/pallas_lk.py) runs the whole iteration
    chunk in one program with windows in VMEM — TPU only; the XLA while_loop
    path below is the CPU/portable fallback (and the numerical reference)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _extract_windows(imgs: jnp.ndarray, origin: jnp.ndarray, ws: int
                     ) -> jnp.ndarray:
    """imgs (C, H, W) stacked channels; origin (N, 2) int (x, y) ->
    (C, N, ws, ws) windows.

    Out-of-range origins clamp (jax dynamic_slice semantics). (A single
    flat (N*ws*ws,) gather was tried and is ~2x SLOWER on TPU than the
    vmapped dynamic_slice while-loop — scattered element gathers don't
    vectorize; keep the slice form.)"""
    C = imgs.shape[0]

    def one(o):
        return jax.lax.dynamic_slice(imgs, (0, o[1], o[0]), (C, ws, ws))

    return jnp.moveaxis(jax.vmap(one)(origin), 0, 1)


def _hat_weights(q: jnp.ndarray, size: int) -> jnp.ndarray:
    """q (N, win) continuous positions -> (N, win, size) bilinear weights."""
    j = jnp.arange(size, dtype=q.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(j[None, None, :] - q[..., None]))


def _sample_in_windows(windows: jnp.ndarray, pos_in_win: jnp.ndarray,
                       win: int) -> jnp.ndarray:
    """Bilinear win x win patches inside per-kp windows.

    windows (N, ws, ws) or (C, N, ws, ws); pos_in_win (N, 2) patch-center
    positions in window coords. Returns (N, win*win) / (C, N, win*win)."""
    single = windows.ndim == 3
    if single:
        windows = windows[None]
    ws = windows.shape[-1]
    r = (win - 1) / 2.0
    offs = jnp.arange(win, dtype=pos_in_win.dtype) - r
    Wx = _hat_weights(pos_in_win[:, None, 0] + offs[None, :], ws)
    Wy = _hat_weights(pos_in_win[:, None, 1] + offs[None, :], ws)
    p = jnp.einsum("naj,cnjk,nbk->cnab", Wy, windows, Wx, precision=_PREC)
    p = p.reshape(p.shape[0], p.shape[1], win * win)
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
    n_chunks: int = 3,
    compute_err: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One pyramid level of LK, windowed. Returns (new_pts, ok, err).

    GN iterations run in `n_chunks` chunks; per-keypoint windows are
    re-extracted at each chunk start so each chunk allows ~±4 px of motion
    (the pyramid handles larger displacements). compute_err=False skips the
    final patch resampling (callers that never read err: upper pyramid
    levels, the backward FB pass)."""
    H, W = prev_img.shape
    half = (win - 1) / 2.0
    ws = win + 11                      # patch + per-chunk motion + bilinear
    margin = (ws - win) / 2.0 - 1.5    # max in-window deviation per chunk
    hw = ws // 2
    dt = prev_pts.dtype

    # Images (and their gradient pyramids) may be stored in float16: the
    # window gathers are the dominant streamed bytes of the tracking step and
    # halve in f16, while all post-extraction math stays f32 (f16's 10
    # mantissa bits keep the quantization noise well under the subpixel
    # convergence epsilon; bf16's 8 would not).
    img_dt = prev_img.dtype

    def origins(pts):
        o = jnp.round(pts).astype(jnp.int32) - hw
        ox = jnp.clip(o[:, 0], 0, W - ws)
        oy = jnp.clip(o[:, 1], 0, H - ws)
        return jnp.stack([ox, oy], axis=-1)

    # template patches + gradients at prev_pts (fixed for all iterations),
    # extracted in ONE stacked slice + sampled in one batched matmul
    if prev_grad is None:
        ix_img, iy_img = im.scharr_gradients(prev_img.astype(jnp.float32))
    else:
        ix_img, iy_img = prev_grad
    o_prev = origins(prev_pts)
    pos_prev = prev_pts - o_prev.astype(dt)
    twin = _extract_windows(
        jnp.stack([prev_img, ix_img.astype(img_dt), iy_img.astype(img_dt)]),
        o_prev, ws).astype(dt)
    tmpl, gx, gy = _sample_in_windows(twin, pos_prev, win)

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

    iters_per_chunk = max(1, (max_iters + n_chunks - 1) // n_chunks)
    pts = guess
    active = track
    conv_total = jnp.zeros_like(track)
    nwin = None
    o_next = None
    use_pallas = _use_pallas()
    for ci in range(n_chunks):
        o_next = origins(pts)
        nwin = _extract_windows(next_img[None], o_next, ws)[0].astype(dt)
        ctr = o_next.astype(dt) + hw

        if use_pallas:
            from ov2slam_tpu.ops import pallas_lk
            pts, active, conv = pallas_lk.lk_iterate(
                nwin, tmpl, gx, gy, gxx, gxy, gyy, inv_det, o_next, ctr,
                pts, active, win=win, n_iters=iters_per_chunk, eps=eps,
                margin=margin)
        else:
            def gn_delta(p, a):
                cur = _sample_in_windows(nwin, p - o_next.astype(dt), win)
                diff = cur - tmpl
                bx = jnp.sum(diff * gx, axis=-1)
                by = jnp.sum(diff * gy, axis=-1)
                # delta = -G^-1 b
                dx = -(gyy * bx - gxy * by) * inv_det
                dy = -(-gxy * bx + gxx * by) * inv_det
                return jnp.where(a[:, None], jnp.stack([dx, dy], axis=-1), 0.0)

            def cond(carry):
                it, p, a, cv = carry
                return (it < iters_per_chunk) & jnp.any(a)

            def body(carry):
                it, p, a, cv = carry
                step = gn_delta(p, a)
                new_p = p + step
                conv = jnp.sum(step * step, axis=-1) < eps * eps
                # pause points that left the window; next chunk re-centers
                dev = jnp.max(jnp.abs(new_p - ctr), axis=-1)
                return (it + 1, new_p, a & ~conv & (dev <= margin),
                        cv | (a & conv))

            _, pts, _, conv = jax.lax.while_loop(
                cond, body,
                (jnp.asarray(0), pts, active, jnp.zeros_like(active)))
        # reactivate only margin-paused (not converged) points for the next
        # re-centered chunk — the kernel's converged mask replaces the
        # re-sampled step check the chunk glue used to run (one full patch
        # sampling per chunk saved)
        conv_total = conv_total | conv
        if ci + 1 < n_chunks:
            active = track & ~conv_total

    in_bounds1 = (
        (pts[:, 0] >= half) & (pts[:, 0] < W - half)
        & (pts[:, 1] >= half) & (pts[:, 1] < H - half)
    )
    ok = track & in_bounds1

    if compute_err:
        cur = _sample_in_windows(nwin, pts - o_next.astype(dt), win)
        err = jnp.mean(jnp.abs(cur - tmpl), axis=-1)
    else:
        err = jnp.zeros(pts.shape[0], dt)
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
    n_chunks: int = 3,
    compute_err: bool = True,
) -> KLTResult:
    """Pyramidal LK from coarse to fine using `nlevels`+1 pyramid images.

    prev_grad_pyr optionally supplies precomputed Scharr gradient pyramids of
    the template frame (computed once per frame instead of once per call).

    Chunk schedule: only the TOP level runs `n_chunks` re-centering chunks —
    it absorbs the unmodeled motion (each chunk allows ~±4 px at 1/2^nlevels
    scale). Lower levels start from the upsampled converged estimate (≤ ~1 px
    guess error) and run a single chunk with the full iteration budget; the
    error metric is sampled only at level 0 (the only level whose err the
    caller reads)."""
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
            eps, min_eig_th, prev_grad=pg,
            n_chunks=n_chunks if lvl == nlevels else 1,
            compute_err=compute_err and lvl == 0,
        )
        ok = ok_l if lvl == nlevels else ok & ok_l
        if lvl > 0:
            guess = guess * 2.0
    return KLTResult(points=guess, status=ok, error=err)


@functools.partial(
    jax.jit,
    static_argnames=("nlevels", "win", "max_iters", "n_chunks"),
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
    n_chunks: int = 3,
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
                  nlevels, win, max_iters, eps, min_eig_th, prev_grad_pyr,
                  n_chunks=n_chunks)
    good = fwd.status & (fwd.error < max_err)
    # backward pass: level 0 only, seeded at the original positions (the
    # reference's backward call uses maxLevel=0 + OPTFLOW_USE_INITIAL_FLOW
    # with the original kps as the initial guess, feature_tracker.cpp:113-117)
    ngp = None if next_grad_pyr is None else next_grad_pyr[:1]
    bwd = pyr_klt(next_pyr[:1], prev_pyr[:1], fwd.points, prev_pts, good,
                  0, win, max_iters, eps, min_eig_th, ngp,
                  n_chunks=min(n_chunks, 2), compute_err=False)
    fb_dist = jnp.linalg.norm(bwd.points - prev_pts, axis=-1)
    ok = good & bwd.status & (fb_dist <= max_fb_dist)
    return KLTResult(points=fwd.points, status=ok, error=fwd.error)
