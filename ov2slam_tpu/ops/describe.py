"""BRIEF-256 binary descriptors + Hamming distance kernels.

Replaces the reference's cv::xfeatures2d BriefDescriptorExtractor usage
(reference: src/feature_extractor.cpp:224-285 describeBRIEF) and its
BFMatcher-Hamming / per-MapPoint descriptor-distance logic
(src/map_point.cpp:236-251, src/mapper.cpp:576-774).

TPU-first:
* description = one batched gather-compare over all keypoints: sample 2x256
  smoothed intensities, compare, pack bits into 8 uint32 words;
* Hamming distance = XOR + population_count on the packed words (VPU), or —
  for the big local-map matching stage — bits expanded to +/-1 bf16 and fed
  through the MXU (dot = nbits - 2*hamming), which turns descriptor matching
  into a dense matmul.

The test pattern is the classic BRIEF isotropic-Gaussian pair pattern drawn
from a fixed seed: self-consistent across the whole system (descriptors are
only ever matched against other descriptors produced here).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ov2slam_tpu.ops import image as im

N_BITS = 256
N_WORDS = N_BITS // 32
PATCH = 31          # sampling window (BRIEF-31)
_SIGMA = PATCH / 5.0


@functools.lru_cache()
def brief_pattern(seed: int = 42) -> np.ndarray:
    """(256, 4) float32 [x1, y1, x2, y2] sample-pair offsets, clipped to the
    31x31 window, drawn from the BRIEF paper's G(0, patch^2/25) model."""
    rng = np.random.default_rng(seed)
    lim = PATCH // 2
    pts = rng.normal(0.0, _SIGMA, size=(N_BITS, 4))
    return np.clip(pts, -lim, lim).astype(np.float32)


_PSIDE = 34          # extracted patch side: offsets [-16, +17) around the kp
_SSIDE = _PSIDE - 1  # after the fractional shift blend
_CTR = 16            # patch index of the keypoint's integer pixel


@functools.lru_cache()
def _brief_select_matrix(seed: int = 42) -> np.ndarray:
    """(33*33, 512) bilinear-sampling matrix: column k (resp. 256+k) pulls
    the pattern's first (second) sample of bit k out of a flattened shifted
    patch with its 4 bilinear tap weights baked in. Turns per-bit image
    gathers into ONE small matmul (MXU) per keyframe."""
    pat = brief_pattern(seed)
    S = np.zeros((_SSIDE * _SSIDE, 2 * N_BITS), np.float32)
    for k in range(N_BITS):
        for c in range(2):
            ox, oy = float(pat[k, 2 * c]), float(pat[k, 2 * c + 1])
            jx, jy = ox + _CTR, oy + _CTR
            x0, y0 = int(np.floor(jx)), int(np.floor(jy))
            fx, fy = jx - x0, jy - y0
            col = c * N_BITS + k
            for dy, wy in ((0, 1.0 - fy), (1, fy)):
                for dx, wx in ((0, 1.0 - fx), (1, fx)):
                    S[(y0 + dy) * _SSIDE + (x0 + dx), col] += wy * wx
    return S


@functools.partial(jax.jit, static_argnames=())
def describe_brief(
    img: jnp.ndarray,        # (H, W) float32 — raw (unsmoothed) image
    kps: jnp.ndarray,        # (N, 2) float px
    valid: jnp.ndarray,      # (N,) bool
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute packed BRIEF descriptors.

    Returns (desc (N, 8) uint32, ok (N,) bool). ok is False for keypoints too
    close to the border (no full window) or invalid inputs.

    TPU shape: one 34x34 patch slice per keypoint, a 4-term blend for the
    keypoint's sub-pixel offset, then a single (N, 33*33) @ (33*33, 512)
    selection matmul that evaluates all 2x256 bilinear pattern samples at
    once — instead of ~4x2x256 random image gathers per keypoint, which are
    the slow path on TPU.
    """
    H, W = img.shape
    # BRIEF smooths with a Gaussian (sigma=2) before sampling
    smooth = im.gaussian_blur(img, 2.0, radius=4)
    kpi = jnp.floor(kps).astype(jnp.int32)
    kpf = (kps - kpi).astype(smooth.dtype)
    y0 = jnp.clip(kpi[:, 1] - _CTR, 0, H - _PSIDE)
    x0 = jnp.clip(kpi[:, 0] - _CTR, 0, W - _PSIDE)
    patches = jax.vmap(
        lambda y, x: jax.lax.dynamic_slice(smooth, (y, x), (_PSIDE, _PSIDE))
    )(y0, x0)                                       # (N, 34, 34)
    # shift each patch by the kp's fractional offset (one bilinear blend)
    fx = kpf[:, 0][:, None, None]
    fy = kpf[:, 1][:, None, None]
    P = (patches[:, :-1, :-1] * (1 - fy) * (1 - fx)
         + patches[:, :-1, 1:] * (1 - fy) * fx
         + patches[:, 1:, :-1] * fy * (1 - fx)
         + patches[:, 1:, 1:] * fy * fx)            # (N, 33, 33)
    S = jnp.asarray(_brief_select_matrix())
    samples = jax.lax.dot_general(
        P.reshape(P.shape[0], -1), S,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)        # (N, 512)
    bits = (samples[:, :N_BITS] < samples[:, N_BITS:]).astype(jnp.uint32)
    w = bits.reshape(bits.shape[0], N_WORDS, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    desc = jnp.sum(w << shifts[None, None, :], axis=-1, dtype=jnp.uint32)  # (N, 8)

    # lower margin 16 keeps the slice start >= 0; upper margin 17 keeps the
    # 34-px slice inside the image so the clamp never shifts a valid patch
    inb = (
        (kps[:, 0] >= _CTR) & (kps[:, 0] < W - _CTR - 1)
        & (kps[:, 1] >= _CTR) & (kps[:, 1] < H - _CTR - 1)
    )
    return desc, valid & inb


def hamming_dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact Hamming distance between packed descriptors.

    a (..., 8) uint32, b (..., 8) uint32 (broadcastable) -> (...,) int32."""
    x = jnp.bitwise_xor(a, b)
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def hamming_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """All-pairs Hamming: a (N, 8), b (M, 8) -> (N, M) int32 via popcount."""
    return hamming_dist(a[:, None, :], b[None, :, :])


def unpack_bits_pm1(desc: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """(N, 8) uint32 -> (N, 256) +/-1 — the MXU-matmul representation."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    bits = bits.reshape(desc.shape[0], N_BITS)
    return (bits.astype(jnp.float32) * 2.0 - 1.0).astype(dtype)


def hamming_matrix_mxu(a_pm1: jnp.ndarray, b_pm1: jnp.ndarray) -> jnp.ndarray:
    """All-pairs Hamming via the MXU: dot(a, b) = 256 - 2*hamming.

    a_pm1 (N, 256), b_pm1 (M, 256) +/-1 (bf16) -> (N, M) int32 hamming."""
    dot = jax.lax.dot_general(
        a_pm1, b_pm1,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return ((N_BITS - dot) * 0.5).astype(jnp.int32)


@jax.jit
def knn2_match(
    desc_a: jnp.ndarray,     # (N, 8) uint32
    valid_a: jnp.ndarray,    # (N,)
    desc_b: jnp.ndarray,     # (M, 8) uint32
    valid_b: jnp.ndarray,    # (M,)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Two-best matching a->b (the knnMatch(k=2) + ratio-test building block,
    reference: loop_closer.cpp:378-459).

    Returns (best_idx (N,), best_dist (N,), second_dist (N,)). Invalid rows
    get dist = N_BITS+1.
    """
    BIG = N_BITS + 1
    d = hamming_matrix(desc_a, desc_b)                       # (N, M)
    d = jnp.where(valid_b[None, :], d, BIG)
    best = jnp.argmin(d, axis=1)
    bestd = jnp.min(d, axis=1)
    d2 = d.at[jnp.arange(d.shape[0]), best].set(BIG)
    secondd = jnp.min(d2, axis=1)
    bestd = jnp.where(valid_a, bestd, BIG)
    return best.astype(jnp.int32), bestd, secondd
