"""Pallas LK kernel vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ov2slam_tpu.ops import klt as klt_mod
from ov2slam_tpu.ops import pallas_lk


def _setup(seed=0, N=64, ws=20, win=9):
    rng = np.random.default_rng(seed)
    H, W = 120, 160
    img0 = rng.uniform(0, 255, (H, W)).astype(np.float32)
    # next image: slightly translated version (roll keeps texture)
    img1 = np.roll(img0, shift=(1, 2), axis=(0, 1)) \
        + rng.normal(0, 1.0, (H, W)).astype(np.float32)
    pts = rng.uniform(ws, min(H, W) - ws, (N, 2)).astype(np.float32)

    from ov2slam_tpu.ops import image as im
    ix, iy = [np.asarray(a) for a in im.scharr_gradients(jnp.asarray(img0))]
    o = np.clip(np.round(pts).astype(np.int32) - ws // 2,
                0, [W - ws, H - ws])
    twin = np.stack([
        np.stack([img0[oy:oy + ws, ox:ox + ws] for ox, oy in o]),
        np.stack([ix[oy:oy + ws, ox:ox + ws] for ox, oy in o]),
        np.stack([iy[oy:oy + ws, ox:ox + ws] for ox, oy in o])])
    tmpl, gx, gy = [np.asarray(a) for a in klt_mod._sample_in_windows(
        jnp.asarray(twin), jnp.asarray(pts - o), win)]
    gxx = (gx * gx).sum(-1)
    gxy = (gx * gy).sum(-1)
    gyy = (gy * gy).sum(-1)
    det = gxx * gyy - gxy * gxy
    inv_det = np.where(np.abs(det) > 1e-12, 1.0 / det, 0.0)

    nwin = np.stack([img1[oy:oy + ws, ox:ox + ws] for ox, oy in o])
    ctr = o.astype(np.float32) + ws // 2
    active = np.ones(N, bool)
    return dict(
        nwin=jnp.asarray(nwin), tmpl=jnp.asarray(tmpl), gx=jnp.asarray(gx),
        gy=jnp.asarray(gy), gxx=jnp.asarray(gxx), gxy=jnp.asarray(gxy),
        gyy=jnp.asarray(gyy), inv_det=jnp.asarray(inv_det.astype(np.float32)),
        origins=jnp.asarray(o), ctr=jnp.asarray(ctr), pts=jnp.asarray(pts),
        active=jnp.asarray(active))


def _xla_reference(d, win, n_iters, eps, margin):
    """The exact XLA while_loop body from klt._track_level."""
    nwin, tmpl, gx, gy = d["nwin"], d["tmpl"], d["gx"], d["gy"]
    gxx, gxy, gyy, inv_det = d["gxx"], d["gxy"], d["gyy"], d["inv_det"]
    o_next = d["origins"]
    ctr = d["ctr"]

    def gn_delta(p, a):
        cur = klt_mod._sample_in_windows(nwin, p - o_next.astype(p.dtype), win)
        diff = cur - tmpl
        bx = jnp.sum(diff * gx, axis=-1)
        by = jnp.sum(diff * gy, axis=-1)
        dx = -(gyy * bx - gxy * by) * inv_det
        dy = -(-gxy * bx + gxx * by) * inv_det
        return jnp.where(a[:, None], jnp.stack([dx, dy], axis=-1), 0.0)

    p, a = d["pts"], d["active"]
    cv = jnp.zeros_like(a)
    for _ in range(n_iters):
        step = gn_delta(p, a)
        new_p = p + step
        conv = jnp.sum(step * step, axis=-1) < eps * eps
        dev = jnp.max(jnp.abs(new_p - ctr), axis=-1)
        cv = cv | (a & conv)
        a = a & ~conv & (dev <= margin)
        p = new_p
    return np.asarray(p), np.asarray(a), np.asarray(cv)


@pytest.mark.parametrize("n_iters", [1, 10])
def test_pallas_lk_matches_xla(n_iters):
    win, eps, margin = 9, 0.01, 4.0
    d = _setup()
    p_ref, a_ref, c_ref = _xla_reference(d, win, n_iters, eps, margin)
    p_pl, a_pl, c_pl = pallas_lk.lk_iterate(
        d["nwin"], d["tmpl"], d["gx"], d["gy"], d["gxx"], d["gxy"],
        d["gyy"], d["inv_det"], d["origins"], d["ctr"], d["pts"],
        d["active"], win=win, n_iters=n_iters, eps=eps, margin=margin,
        interpret=True)
    np.testing.assert_allclose(np.asarray(p_pl), p_ref, atol=2e-3)
    assert (np.asarray(a_pl) == a_ref).mean() > 0.95
    assert (np.asarray(c_pl) == c_ref).mean() > 0.95
