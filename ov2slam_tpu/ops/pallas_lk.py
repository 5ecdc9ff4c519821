"""Pallas TPU kernel: the Lucas-Kanade Gauss-Newton iteration loop.

The XLA version of one KLT chunk (ops/klt.py:_track_level) dispatches a
`while_loop` whose every iteration launches several small kernels (hat-weight
build, batched patch matmul, reductions, mask updates) over (N, win*win)
arrays — measured ~3.2 ms for 30 iterations at N=512 on a v5e chip, ~80x
above the arithmetic floor. This kernel runs the ENTIRE iteration loop in
one Pallas program with the per-keypoint windows resident in VMEM:

- layout is lane-major: keypoints live on the 128-lane axis, window rows on
  sublanes, so every operation is a dense (ws, BLK) VPU op with no padding
  waste (the (N, ws) layout would pad 20 lanes to 128);
- bilinear sampling keeps the hat-weight MAC formulation of the XLA path
  (exactly two nonzero weights per row => exact bilinear interpolation),
  accumulating the Gauss-Newton right-hand side (bx, by) on the fly so the
  patch is never materialized;
- convergence and window-margin masking are per-lane selects, identical in
  semantics to the XLA path (points pausing at the margin are re-activated
  by the caller's next chunk re-extraction).

Numerically identical (up to f32 reassociation) to ops/klt.py's in-window
sampling; tests/test_pallas_lk.py asserts agreement in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _lk_kernel(eps2_ref, margin_ref, nwin_ref, tmpl_ref, gx_ref, gy_ref,
               gxx_ref, gxy_ref, gyy_ref, invd_ref, ox_ref, oy_ref,
               ctrx_ref, ctry_ref, px_ref, py_ref, act_ref,
               out_px_ref, out_py_ref, out_act_ref, out_conv_ref,
               *, win: int, ws: int, n_iters: int):
    eps2 = eps2_ref[0]
    margin = margin_ref[0]
    W = nwin_ref[:]                      # (ws, ws, BLK)
    tmpl = tmpl_ref[:]                   # (win*win, BLK)
    gx = gx_ref[:]
    gy = gy_ref[:]
    gxx = gxx_ref[:]                     # (1, BLK)
    gxy = gxy_ref[:]
    gyy = gyy_ref[:]
    invd = invd_ref[:]
    ox = ox_ref[:]
    oy = oy_ref[:]
    ctrx = ctrx_ref[:]
    ctry = ctry_ref[:]
    BLK = tmpl.shape[-1]

    r = (win - 1) / 2.0
    # Mosaic iota must be integer-typed; cast after
    iota = jax.lax.broadcasted_iota(jnp.int32, (ws, BLK), 0).astype(jnp.float32)

    def hat(q, off):
        # (ws, BLK) bilinear row weights at absolute position q + off
        return jnp.maximum(0.0, 1.0 - jnp.abs(iota - (q + off)))

    def cond(carry):
        it, px, py, act, conv = carry
        # early exit once every point converged or paused — the common case
        # after ~3-5 iterations; without it the kernel always burns n_iters
        return (it < n_iters) & (jnp.sum(act) > 0.0)

    def body(carry):
        it, px, py, act, convacc = carry  # (1, BLK) f32; act as f32 mask
        qx = px - ox                     # window coords of the patch center
        qy = py - oy
        bx = jnp.zeros((1, BLK), jnp.float32)
        by = jnp.zeros((1, BLK), jnp.float32)
        wxs = [hat(qx, b - r) for b in range(win)]
        for a in range(win):
            wy_a = hat(qy, a - r)                      # (ws, BLK)
            # rows_a[k, n] = sum_j wy_a[j, n] * W[j, k, n] — accumulated
            # with 2D (ws, BLK) MACs only (a 3D broadcast-reduce lowers to
            # per-element relayouts in Mosaic and runs ~20x slower)
            rows_a = wy_a[0:1, :] * W[0]
            for j in range(1, ws):
                rows_a = rows_a + wy_a[j:j + 1, :] * W[j]
            for b in range(win):
                p_ab = jnp.sum(wxs[b] * rows_a, axis=0,
                               keepdims=True)          # (1, BLK)
                idx = a * win + b
                d = p_ab - tmpl[idx:idx + 1]
                bx = bx + d * gx[idx:idx + 1]
                by = by + d * gy[idx:idx + 1]
        # delta = -G^-1 b (closed-form 2x2 solve)
        dx = -(gyy * bx - gxy * by) * invd
        dy = -(-gxy * bx + gxx * by) * invd
        dx = dx * act
        dy = dy * act
        npx = px + dx
        npy = py + dy
        conv = (dx * dx + dy * dy) < eps2
        convf = conv.astype(jnp.float32)
        dev = jnp.maximum(jnp.abs(npx - ctrx), jnp.abs(npy - ctry))
        still = act * (1.0 - convf) * (dev <= margin).astype(jnp.float32)
        # converged-while-active accumulator: lets the caller reactivate
        # only margin-paused points for the next re-centered chunk without
        # re-sampling the patch outside the kernel
        return it + 1, npx, npy, still, jnp.maximum(convacc, act * convf)

    px0 = px_ref[:]
    py0 = py_ref[:]
    act0 = act_ref[:]
    conv0 = jnp.zeros_like(act0)
    _, px, py, act, conv = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), px0, py0, act0, conv0))
    out_px_ref[:] = px
    out_py_ref[:] = py
    out_act_ref[:] = act
    out_conv_ref[:] = conv


@functools.partial(
    jax.jit,
    static_argnames=("win", "n_iters", "interpret"))
def lk_iterate(
    nwin: jnp.ndarray,      # (N, ws, ws) per-keypoint windows (next image)
    tmpl: jnp.ndarray,      # (N, win*win) template patches
    gx: jnp.ndarray,        # (N, win*win) template gradients
    gy: jnp.ndarray,
    gxx: jnp.ndarray,       # (N,) normal-equation terms
    gxy: jnp.ndarray,
    gyy: jnp.ndarray,
    inv_det: jnp.ndarray,
    origins: jnp.ndarray,   # (N, 2) int window origins (x, y)
    ctr: jnp.ndarray,       # (N, 2) window centers
    pts: jnp.ndarray,       # (N, 2) current estimates
    active: jnp.ndarray,    # (N,) bool
    win: int,
    n_iters: int,
    eps,
    margin,
    interpret: bool = False,
):
    """Run `n_iters` LK Gauss-Newton iterations for all N keypoints in one
    Pallas dispatch. Returns (new_pts (N, 2), still_active (N,) bool,
    converged (N,) bool — points that hit the eps step criterion while
    active; the caller reactivates only the non-converged for the next
    re-centered chunk).

    eps/margin may be traced scalars (they ride in SMEM)."""
    N, ws, _ = nwin.shape
    BLK = N  # one program; keypoints on the lane axis (padded to 128 inside)

    # lane-major relayout
    of = origins.astype(jnp.float32)
    eps = jnp.asarray(eps, jnp.float32)
    scalars = (jnp.reshape(eps * eps, (1,)),
               jnp.reshape(jnp.asarray(margin, jnp.float32), (1,)))
    args = scalars + (
        jnp.transpose(nwin, (1, 2, 0)),           # (ws, ws, N)
        tmpl.T, gx.T, gy.T,                       # (win*win, N)
        gxx[None, :], gxy[None, :], gyy[None, :], inv_det[None, :],
        of[:, 0][None, :], of[:, 1][None, :],
        ctr[:, 0][None, :], ctr[:, 1][None, :],
        pts[:, 0][None, :], pts[:, 1][None, :],
        active.astype(jnp.float32)[None, :],
    )
    out_shape = [
        jax.ShapeDtypeStruct((1, BLK), jnp.float32),
        jax.ShapeDtypeStruct((1, BLK), jnp.float32),
        jax.ShapeDtypeStruct((1, BLK), jnp.float32),
        jax.ShapeDtypeStruct((1, BLK), jnp.float32),
    ]
    kern = functools.partial(_lk_kernel, win=win, ws=ws, n_iters=n_iters)
    px, py, act, conv = pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(args) - 2),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        interpret=interpret,
    )(*args)
    new_pts = jnp.stack([px[0], py[0]], axis=-1)
    return new_pts, act[0] > 0.5, conv[0] > 0.5
