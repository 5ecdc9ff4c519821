"""Whole-image ops: pyramids, CLAHE, gradients, bilinear sampling, remap.

Replaces what the reference gets from OpenCV image processing
(cv::buildOpticalFlowPyramid / pyrDown in visual_front_end.cpp:1143-1177,
cv::CLAHE in feature_tracker.hpp + visual_front_end.cpp, cv::remap in
camera_calibration.cpp rectifyImage).

Everything here is pure XLA (convs, gathers) with static shapes, batched over
whatever leading dims the caller provides. Images are float32 in [0, 255],
shape (H, W). Patch sampling is the workhorse for the KLT tracker and the
BRIEF descriptor and is written to vectorize over thousands of keypoints.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# separable convolution helpers
# ---------------------------------------------------------------------------

def _sep_conv2d(img: jnp.ndarray, kx: jnp.ndarray, ky: jnp.ndarray) -> jnp.ndarray:
    """Separable 2D filtering (cross-correlation, cv::filter2D semantics)
    with reflect-101 border (OpenCV default).

    img: (H, W); kx, ky: (k,) 1D kernels applied along x (cols) and y (rows).

    Implemented as shifted adds (static slices of one padded array) rather
    than lax.conv — single-channel convs lower poorly on TPU (~80 ms for a
    3-tap pass); shift-adds fuse into a handful of VPU ops.
    """
    ry = int(ky.shape[0]) // 2
    rx = int(kx.shape[0]) // 2
    H, W = img.shape
    p = jnp.pad(img, ((ry, ry), (rx, rx)), mode="reflect")
    # filter along y (rows)
    acc = None
    for i in range(int(ky.shape[0])):
        term = ky[i] * jax.lax.slice(p, (i, 0), (i + H, W + 2 * rx))
        acc = term if acc is None else acc + term
    # filter along x (cols)
    out = None
    for j in range(int(kx.shape[0])):
        term = kx[j] * jax.lax.slice(acc, (0, j), (H, j + W))
        out = term if out is None else out + term
    return out


GAUSS5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0


def pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """One pyramid level: 5-tap Gaussian blur then 2x decimation (cv::pyrDown
    semantics: out size = ceil(n/2), sample at even indices)."""
    k = jnp.asarray(GAUSS5, img.dtype)
    blurred = _sep_conv2d(img, k, k)
    return blurred[::2, ::2]


def build_pyramid(img: jnp.ndarray, levels: int) -> List[jnp.ndarray]:
    """[level0=img, level1, ...] with `levels`+1 entries (matches
    cv::buildOpticalFlowPyramid(maxLevel=levels))."""
    pyr = [img]
    for _ in range(levels):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


def gaussian_blur(img: jnp.ndarray, sigma: float, radius: int = None) -> jnp.ndarray:
    if radius is None:
        radius = max(1, int(3.0 * sigma + 0.5))
    xs = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    k /= k.sum()
    k = jnp.asarray(k, img.dtype)
    return _sep_conv2d(img, k, k)


# Scharr 3x3 derivative (the kernel cv::calcOpticalFlowPyrLK uses for the
# spatial gradient, scaled 1/32)
_SCHARR_D = np.array([-1.0, 0.0, 1.0], np.float32)
_SCHARR_S = np.array([3.0, 10.0, 3.0], np.float32) / 32.0


def scharr_gradients(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(Ix, Iy) via the Scharr-smoothed central difference."""
    ix = _sep_conv2d(img, jnp.asarray(_SCHARR_D), jnp.asarray(_SCHARR_S))
    iy = _sep_conv2d(img, jnp.asarray(_SCHARR_S), jnp.asarray(_SCHARR_D))
    return ix, iy


def sobel_gradients(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    d = jnp.asarray(np.array([-1.0, 0.0, 1.0], np.float32))
    s = jnp.asarray(np.array([1.0, 2.0, 1.0], np.float32))
    return _sep_conv2d(img, d, s), _sep_conv2d(img, s, d)


# ---------------------------------------------------------------------------
# bilinear sampling
# ---------------------------------------------------------------------------

def sample_bilinear(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample image at float coords. img (H, W); xy (..., 2) -> (...,).

    Out-of-bounds coords are clamped (callers mask separately)."""
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.000001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.000001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = x - x0.astype(x.dtype)
    fy = y - y0.astype(y.dtype)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def patch_grid(win: int, dtype=jnp.float32) -> jnp.ndarray:
    """(win*win, 2) offsets centered on 0 (win odd) or the OpenCV convention
    of a win x win window whose top-left is center - (win-1)/2."""
    r = (win - 1) / 2.0
    xs = jnp.arange(win, dtype=dtype) - r
    xx, yy = jnp.meshgrid(xs, xs)
    return jnp.stack([xx.ravel(), yy.ravel()], axis=-1)


def sample_patches(img: jnp.ndarray, centers: jnp.ndarray, win: int) -> jnp.ndarray:
    """Sample win x win bilinear patches at float centers.

    img (H, W); centers (N, 2) -> (N, win*win)."""
    offs = patch_grid(win, centers.dtype)  # (P, 2)
    coords = centers[:, None, :] + offs[None, :, :]  # (N, P, 2)
    return sample_bilinear(img, coords)


def remap_bilinear(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Full-image remap: out[i, j] = img(grid[i, j]) (cv::remap semantics;
    used for undistortion/rectification). grid (H', W', 2) float source px."""
    return sample_bilinear(img, grid)


def _cubic_weights(f: jnp.ndarray, a: float = -0.75):
    """Keys bicubic kernel weights (cv::INTER_CUBIC uses a=-0.75) for taps at
    offsets -1, 0, 1, 2 relative to floor(coord); f in [0, 1)."""
    # |x| <= 1: (a+2)|x|^3 - (a+3)|x|^2 + 1 ; 1 < |x| < 2: a(|x|-2)^2(|x|-1)
    d0 = 1.0 + f          # tap -1
    d1 = f                # tap  0
    d2 = 1.0 - f          # tap +1
    d3 = 2.0 - f          # tap +2
    w0 = a * d0 * d0 * d0 - 5.0 * a * d0 * d0 + 8.0 * a * d0 - 4.0 * a
    w1 = (a + 2.0) * d1 * d1 * d1 - (a + 3.0) * d1 * d1 + 1.0
    w2 = (a + 2.0) * d2 * d2 * d2 - (a + 3.0) * d2 * d2 + 1.0
    w3 = a * d3 * d3 * d3 - 5.0 * a * d3 * d3 + 8.0 * a * d3 - 4.0 * a
    return w0, w1, w2, w3


def sample_bicubic(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Bicubic (Catmull-Rom-family, a=-0.75) sampling at float coords —
    separable 4x4 taps, clamped borders. Sharper than bilinear: the
    rectification remap costs measurable KLT/detector accuracy when the
    resampling low-passes the image (round-3 rect-tier ATE penalty)."""
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.000001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.000001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0.astype(x.dtype)
    fy = y - y0.astype(y.dtype)
    wx = _cubic_weights(fx)
    wy = _cubic_weights(fy)
    out = jnp.zeros(x.shape, img.dtype)
    for i in range(4):
        yi = jnp.clip(y0 + (i - 1), 0, H - 1)
        row = jnp.zeros(x.shape, img.dtype)
        for j in range(4):
            xj = jnp.clip(x0 + (j - 1), 0, W - 1)
            row = row + wx[j] * img[yi, xj]
        out = out + wy[i] * row
    return out


def remap_bicubic(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """cv::remap(..., INTER_CUBIC) semantics; used for the rectification /
    undistortion path where resampling sharpness limits tracking accuracy."""
    return sample_bicubic(img, grid)


# ---------------------------------------------------------------------------
# CLAHE
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("tiles_x", "tiles_y", "nbins"))
def clahe(
    img: jnp.ndarray,
    clip_limit: float = 3.0,
    tiles_x: int = 8,
    tiles_y: int = 8,
    nbins: int = 256,
) -> jnp.ndarray:
    """Contrast-limited adaptive histogram equalization (cv::CLAHE semantics:
    8x8 tiles, clip limit scaled by tile size / nbins, excess redistributed
    uniformly, bilinear LUT interpolation between tile centers).

    img: (H, W) float32 in [0, 255]. Returns same shape/range.
    """
    H, W = img.shape
    # OpenCV pads the image so it divides evenly into tiles (BORDER_REFLECT_101)
    th = -(-H // tiles_y)  # tile height (ceil)
    tw = -(-W // tiles_x)
    padded = jnp.pad(img, ((0, th * tiles_y - H), (0, tw * tiles_x - W)), mode="reflect")

    q = jnp.clip(jnp.round(padded), 0, nbins - 1).astype(jnp.int32)
    tiles = q.reshape(tiles_y, th, tiles_x, tw).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(tiles_y * tiles_x, th * tw)  # (T, P)

    # per-tile histogram: one-hot sum (VPU-friendly, static shapes)
    bins = jnp.arange(nbins, dtype=jnp.int32)
    hist = jnp.sum(tiles[:, :, None] == bins[None, None, :], axis=1).astype(jnp.float32)

    # clip + uniform redistribution (single pass, like OpenCV)
    tile_px = th * tw
    limit = jnp.maximum(clip_limit * tile_px / nbins, 1.0)
    clipped = jnp.minimum(hist, limit)
    excess = jnp.sum(hist - clipped, axis=1, keepdims=True)
    clipped = clipped + excess / nbins

    # cdf -> LUT, scale to [0, nbins-1]
    cdf = jnp.cumsum(clipped, axis=1)
    lut = cdf * ((nbins - 1.0) / tile_px)  # (T, nbins)
    lut = lut.reshape(tiles_y, tiles_x, nbins)

    # interpolate between the 4 surrounding tile LUTs at every pixel
    ys = jnp.arange(th * tiles_y, dtype=jnp.float32)
    xs = jnp.arange(tw * tiles_x, dtype=jnp.float32)
    ty = (ys - th / 2.0 + 0.5) / th  # tile-space coordinate
    tx = (xs - tw / 2.0 + 0.5) / tw
    ty0 = jnp.clip(jnp.floor(ty), 0, tiles_y - 1).astype(jnp.int32)
    tx0 = jnp.clip(jnp.floor(tx), 0, tiles_x - 1).astype(jnp.int32)
    ty1 = jnp.clip(ty0 + 1, 0, tiles_y - 1)
    tx1 = jnp.clip(tx0 + 1, 0, tiles_x - 1)
    fy = jnp.clip(ty - ty0.astype(jnp.float32), 0.0, 1.0)[:, None]  # (Hp, 1)
    fx = jnp.clip(tx - tx0.astype(jnp.float32), 0.0, 1.0)[None, :]  # (1, Wp)

    def lut_at(tyi, txi):
        # gather LUT values: (Hp, Wp)
        return lut[tyi[:, None], txi[None, :], q]

    v00 = lut_at(ty0, tx0)
    v01 = lut_at(ty0, tx1)
    v10 = lut_at(ty1, tx0)
    v11 = lut_at(ty1, tx1)
    out = (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )
    return out[:H, :W]
