"""Keypoint detection: Shi-Tomasi (min-eig) / Harris / FAST response maps with
per-grid-cell argmax selection and batched sub-pixel refinement.

Replaces the reference's FeatureExtractor (reference: src/feature_extractor.cpp
:288-440 detectSingleScale, :443-570 detectGridFAST, :104-221 detectGFTT).

TPU-first: the reference's "one keypoint per grid cell" design is already the
statically-shaped choice — a (n_cells,) output regardless of image content.
Response maps are computed once over the whole image (VPU-parallel convs);
cell-wise argmax is a reshape + reduce; occupancy suppression uses a disc mask
scattered around existing keypoints; the adaptive-quality update is returned
as a scalar for the host-side detector state (mirroring the reference's
mutable dmaxquality_).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ov2slam_tpu.ops import image as im


# ---------------------------------------------------------------------------
# response maps
# ---------------------------------------------------------------------------

def min_eig_response(img: jnp.ndarray, gauss_blur: bool = True) -> jnp.ndarray:
    """Shi-Tomasi min-eigenvalue response (cv::cornerMinEigenVal, blockSize=3,
    Sobel ksize=3), optionally after a 3x3 Gaussian blur like the reference
    (feature_extractor.cpp:355-356)."""
    if gauss_blur:
        k = jnp.asarray(np.array([0.25, 0.5, 0.25], np.float32), img.dtype)
        img = im._sep_conv2d(img, k, k)
    # OpenCV scales Sobel by 1/(2^(ksize*2-dx-dy-2)) = 1/8 for ksize=3, and
    # averages over the block window
    ix, iy = im.sobel_gradients(img)
    ix = ix * 0.125
    iy = iy * 0.125
    box = jnp.asarray(np.ones(3, np.float32) / 9.0, img.dtype)
    one = jnp.asarray(np.ones(3, np.float32), img.dtype)
    # 3x3 box sum normalized by count (OpenCV uses normalized box for minEig)
    sxx = im._sep_conv2d(ix * ix, box, one)
    syy = im._sep_conv2d(iy * iy, box, one)
    sxy = im._sep_conv2d(ix * iy, box, one)
    d = (sxx - syy) * 0.5
    return (sxx + syy) * 0.5 - jnp.sqrt(d * d + sxy * sxy)


def harris_response(img: jnp.ndarray, k: float = 0.04) -> jnp.ndarray:
    ix, iy = im.sobel_gradients(img)
    ix = ix * 0.125
    iy = iy * 0.125
    box = jnp.asarray(np.ones(3, np.float32), img.dtype)
    sxx = im._sep_conv2d(ix * ix, box, box)
    syy = im._sep_conv2d(iy * iy, box, box)
    sxy = im._sep_conv2d(ix * iy, box, box)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return det - k * tr * tr


_FAST_OFFS = np.array(
    [
        (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
        (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-3 + 2, -3 + 0),
    ],
    np.int32,
)
# fix the last entry: the canonical Bresenham circle of radius 3
_FAST_OFFS[15] = (-1, -3)


def fast_score(img: jnp.ndarray, threshold: float, arc: int = 9) -> jnp.ndarray:
    """FAST-N corner score map (cv::FAST semantics, N=9 contiguous of 16).

    Score is the OpenCV-style max threshold proxy: min over the best arc of
    |p_i - center| minus threshold, 0 for non-corners. Runs as 16 shifted
    image copies — pure VPU work.
    """
    H, W = img.shape
    pad = 3
    p = jnp.pad(img, pad, mode="edge")
    ring = jnp.stack(
        [p[pad + dy: pad + dy + H, pad + dx: pad + dx + W] for (dx, dy) in _FAST_OFFS],
        axis=0,
    )  # (16, H, W)
    c = img[None]
    bright = ring > c + threshold
    dark = ring < c - threshold
    db = ring - c      # (16, H, W)

    def contiguous(mask):
        # arc-length contiguous run in a circular sequence of 16
        acc = mask
        for s in range(1, arc):
            acc = acc & jnp.roll(mask, -s, axis=0)
        return jnp.any(acc, axis=0)

    is_bright = contiguous(bright)
    is_dark = contiguous(dark)

    # score: for each start, min |diff| over the arc; take max over starts
    def arc_min(vals):
        acc = vals
        for s in range(1, arc):
            acc = jnp.minimum(acc, jnp.roll(vals, -s, axis=0))
        return jnp.max(acc, axis=0)

    sb = arc_min(db) - threshold          # >0 iff bright corner
    sd = arc_min(-db) - threshold         # >0 iff dark corner
    score = jnp.maximum(jnp.where(is_bright, sb, 0.0), jnp.where(is_dark, sd, 0.0))
    # kill the image border (no full ring support)
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    inb = (ys >= pad) & (ys < H - pad) & (xs >= pad) & (xs < W - pad)
    return jnp.where(inb, score, 0.0)


# ---------------------------------------------------------------------------
# occupancy mask
# ---------------------------------------------------------------------------

def occupancy_mask(
    shape: Tuple[int, int],
    kps: jnp.ndarray,       # (K, 2) float px
    kp_valid: jnp.ndarray,  # (K,) bool
    radius: int,
) -> jnp.ndarray:
    """(H, W) float mask, 0 inside a disc of `radius` around valid keypoints,
    1 elsewhere (the reference's cv::circle mask, feature_extractor.cpp:317-320).

    TPU-friendly: scatter only the K keypoint centers, then dilate with a
    disc structuring element via a separable two-pass max (a (2r+1)^2
    reduce_window on the seed image) — no big scatters.
    """
    H, W = shape
    r = int(radius)
    ctr = jnp.round(kps).astype(jnp.int32)
    inb = (ctr[:, 0] >= 0) & (ctr[:, 0] < W) & (ctr[:, 1] >= 0) & (ctr[:, 1] < H) & kp_valid
    lin = jnp.where(inb, ctr[:, 1] * W + ctr[:, 0], H * W)
    seed = jnp.zeros(H * W + 1, jnp.float32).at[lin].set(1.0, mode="drop")
    seed = seed[: H * W].reshape(H, W)

    # square dilation of radius r by doubling shift-max (log2(r) fused VPU
    # passes; the square vs the reference's disc differs only at corners)
    def dilate1d(x, shift, axis):
        a = jnp.pad(x, [(shift, shift) if i == axis else (0, 0) for i in range(2)])
        sl0 = jax.lax.slice_in_dim(a, 0, x.shape[axis], axis=axis)
        sl2 = jax.lax.slice_in_dim(a, 2 * shift, 2 * shift + x.shape[axis], axis=axis)
        return jnp.maximum(jnp.maximum(sl0, sl2), x)

    hit = seed
    done = 0
    step = 1
    while done < r:
        s = min(step, r - done)
        hit = dilate1d(hit, s, 0)
        hit = dilate1d(hit, s, 1)
        done += s
        step *= 2
    return jnp.where(hit > 0, 0.0, 1.0)


# ---------------------------------------------------------------------------
# grid selection
# ---------------------------------------------------------------------------

class GridDetection(NamedTuple):
    points: jnp.ndarray      # (C, 2) float px of best response per cell
    scores: jnp.ndarray      # (C,)
    valid: jnp.ndarray       # (C,) bool — above quality & cell free
    points2: jnp.ndarray     # (C, 2) second-best (secondary pool)
    scores2: jnp.ndarray     # (C,)
    valid2: jnp.ndarray      # (C,) bool


@functools.partial(jax.jit, static_argnames=("cellsize",))
def grid_select(
    response: jnp.ndarray,   # (H, W) response map (masked already)
    kps: jnp.ndarray,        # (K, 2) existing keypoints
    kp_valid: jnp.ndarray,   # (K,) bool
    cellsize: int,
    quality_th: jnp.ndarray, # scalar threshold on the response
) -> GridDetection:
    """Top-1 + top-2 response per free grid cell (detectSingleScale semantics:
    occupied cells skipped; second peak must be outside a half-cell disc of
    the first)."""
    H, W = response.shape
    cs = int(cellsize)
    nh, nw = H // cs, W // cs
    C = nh * nw

    mask = occupancy_mask((H, W), kps, kp_valid, cs // 4)
    resp = response * mask

    # occupied cells: any valid kp maps into the cell
    ci = jnp.floor(kps[:, 0] / cs).astype(jnp.int32)
    ri = jnp.floor(kps[:, 1] / cs).astype(jnp.int32)
    inb = (ci >= 0) & (ci < nw) & (ri >= 0) & (ri < nh) & kp_valid
    cell_lin = jnp.where(inb, ri * nw + ci, C)
    occ = jnp.zeros(C + 1, bool).at[cell_lin].set(True, mode="drop")[:C]

    cells = resp[: nh * cs, : nw * cs].reshape(nh, cs, nw, cs).transpose(0, 2, 1, 3)
    cells = cells.reshape(C, cs * cs)

    idx1 = jnp.argmax(cells, axis=1)
    s1 = jnp.take_along_axis(cells, idx1[:, None], axis=1)[:, 0]

    # suppress a half-cell disc around the first peak, then re-argmax
    y1 = idx1 // cs
    x1 = idx1 % cs
    yy = jnp.arange(cs)[:, None]
    xx = jnp.arange(cs)[None, :]
    d2 = (yy[None] - y1[:, None, None]) ** 2 + (xx[None] - x1[:, None, None]) ** 2
    r = cs // 4
    killed = (d2 <= r * r).reshape(C, cs * cs)
    cells2 = jnp.where(killed, -jnp.inf, cells)
    idx2 = jnp.argmax(cells2, axis=1)
    s2 = jnp.take_along_axis(cells2, idx2[:, None], axis=1)[:, 0]

    rows = jnp.arange(C, dtype=jnp.int32) // nw
    cols = jnp.arange(C, dtype=jnp.int32) % nw

    def to_px(idx):
        return jnp.stack(
            [(cols * cs + idx % cs).astype(resp.dtype),
             (rows * cs + idx // cs).astype(resp.dtype)],
            axis=-1,
        )

    v1 = (~occ) & (s1 >= quality_th)
    v2 = (~occ) & (s2 >= quality_th) & jnp.isfinite(s2)
    return GridDetection(to_px(idx1), s1, v1, to_px(idx2), s2, v2)


def adaptive_quality_update(
    quality: float, nb_detected: int, nb_free_cells: int
) -> float:
    """Host-side detector state update (feature_extractor.cpp:421-426):
    <33% of free cells filled => halve quality; >90% => raise by 1.5x."""
    if nb_free_cells <= 0:
        return quality
    if nb_detected < 0.33 * nb_free_cells:
        return quality / 2.0
    if nb_detected > 0.9 * nb_free_cells:
        return quality * 1.5
    return quality


# ---------------------------------------------------------------------------
# sub-pixel refinement
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("half_win", "iters"))
def corner_subpix(
    img: jnp.ndarray,
    pts: jnp.ndarray,        # (N, 2)
    valid: jnp.ndarray,      # (N,)
    half_win: int = 3,
    iters: int = 30,
    eps: float = 0.01,
) -> jnp.ndarray:
    """Batched cv::cornerSubPix: iterate q <- q + G^-1 sum(grad grad^T (p - q))
    over a (2*half_win+1)^2 window with bilinear-sampled Sobel gradients."""
    ix_img, iy_img = im.sobel_gradients(img)
    win = 2 * half_win + 1
    offs = im.patch_grid(win, pts.dtype)  # (P, 2) centered offsets

    def body(_, q):
        coords = q[:, None, :] + offs[None, :, :]          # (N, P, 2)
        gx = im.sample_bilinear(ix_img, coords)
        gy = im.sample_bilinear(iy_img, coords)
        gxx = jnp.sum(gx * gx, axis=1)
        gxy = jnp.sum(gx * gy, axis=1)
        gyy = jnp.sum(gy * gy, axis=1)
        # b = sum grad grad^T p_off  (p - q = offset)
        bx = jnp.sum(gx * gx * offs[None, :, 0] + gx * gy * offs[None, :, 1], axis=1)
        by = jnp.sum(gx * gy * offs[None, :, 0] + gy * gy * offs[None, :, 1], axis=1)
        det = gxx * gyy - gxy * gxy
        inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        dx = (gyy * bx - gxy * by) * inv
        dy = (-gxy * bx + gxx * by) * inv
        step = jnp.stack([dx, dy], axis=-1)
        # clamp runaway steps, freeze invalid entries
        step = jnp.clip(step, -2.0, 2.0)
        return q + jnp.where(valid[:, None], step, 0.0)

    return jax.lax.fori_loop(0, iters, body, pts)
