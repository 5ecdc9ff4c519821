"""KLT tracker tests: ground-truth shifts and the OpenCV oracle
(reference behavior: src/feature_tracker.cpp:35-137)."""

import numpy as np
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from ov2slam_tpu.ops import image as im
from ov2slam_tpu.ops import klt


def make_texture(h=480, w=752, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, size=(h // 8, w // 8)).astype(np.float32)
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
    return np.clip(img, 0, 255).astype(np.float32)


def shift_image(img, dx, dy):
    M = np.array([[1, 0, dx], [0, 1, dy]], np.float32)
    return cv2.warpAffine(img, M, (img.shape[1], img.shape[0]), flags=cv2.INTER_LINEAR,
                          borderMode=cv2.BORDER_REFLECT)


def good_points(img, n=100, border=40):
    pts = cv2.goodFeaturesToTrack(img.astype(np.uint8), n, 0.01, 20)
    pts = pts.reshape(-1, 2)
    keep = (
        (pts[:, 0] > border) & (pts[:, 0] < img.shape[1] - border)
        & (pts[:, 1] > border) & (pts[:, 1] < img.shape[0] - border)
    )
    return pts[keep].astype(np.float32)


def run_ours(img0, img1, pts, nlevels=3, win=9, prior=None):
    pyr0 = tuple(im.build_pyramid(jnp.asarray(img0), nlevels))
    pyr1 = tuple(im.build_pyramid(jnp.asarray(img1), nlevels))
    p = jnp.asarray(pts)
    prior = p if prior is None else jnp.asarray(prior)
    valid = jnp.ones(len(pts), bool)
    res = klt.fb_klt_tracking(pyr0, pyr1, p, prior, valid, nlevels=nlevels, win=win)
    return np.asarray(res.points), np.asarray(res.status), np.asarray(res.error)


def test_small_shift_subpixel():
    img0 = make_texture()
    dx, dy = 1.3, -0.7
    img1 = shift_image(img0, dx, dy)
    pts = good_points(img0)
    out, ok, err = run_ours(img0, img1, pts)
    assert ok.mean() > 0.9
    d = out[ok] - pts[ok]
    np.testing.assert_allclose(d.mean(axis=0), [dx, dy], atol=0.05)
    assert np.abs(d - [dx, dy]).max() < 0.3


def test_large_shift_needs_pyramid():
    img0 = make_texture(seed=3)
    dx, dy = 17.0, -11.0
    img1 = shift_image(img0, dx, dy)
    pts = good_points(img0)
    out, ok, err = run_ours(img0, img1, pts)
    assert ok.mean() > 0.7
    d = out[ok] - pts[ok]
    np.testing.assert_allclose(np.median(d, axis=0), [dx, dy], atol=0.2)


def test_vs_opencv_tracks():
    img0 = make_texture(seed=5)
    # non-rigid-ish warp: rotate slightly + translate
    M = cv2.getRotationMatrix2D((376, 240), 1.5, 1.0)
    M[:, 2] += [4.0, -3.0]
    img1 = cv2.warpAffine(img0, M, (752, 480), borderMode=cv2.BORDER_REFLECT)
    pts = good_points(img0)
    out, ok, err = run_ours(img0, img1, pts)

    ref_pts, ref_st, ref_err = cv2.calcOpticalFlowPyrLK(
        img0.astype(np.uint8), img1.astype(np.uint8), pts.reshape(-1, 1, 2), None,
        winSize=(9, 9), maxLevel=3,
        criteria=(cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS, 30, 0.01),
    )
    ref_pts = ref_pts.reshape(-1, 2)
    ref_st = ref_st.ravel().astype(bool)
    both = ok & ref_st
    assert both.mean() > 0.7
    d = np.linalg.norm(out[both] - ref_pts[both], axis=-1)
    assert np.median(d) < 0.2
    assert (d < 1.0).mean() > 0.9


def test_fb_check_rejects_occlusion():
    img0 = make_texture(seed=7)
    img1 = shift_image(img0, 3.0, 2.0)
    # blank out a region in img1 -> tracks into it should fail FB or err gate
    img1[200:300, 300:450] = 128.0
    pts = good_points(img0)
    out, ok, err = run_ours(img0, img1, pts)
    in_blank = (
        (out[:, 0] > 310) & (out[:, 0] < 440) & (out[:, 1] > 210) & (out[:, 1] < 290)
    )
    # most surviving tracks should not be inside the blanked region
    assert (ok & in_blank).sum() <= max(2, 0.1 * in_blank.sum())


def test_prior_seeding():
    """With a perfect prior and 1 pyramid level the tracker must converge
    (this is the reference's 3d-kp prior path, visual_front_end.cpp:132-275)."""
    img0 = make_texture(seed=9)
    dx, dy = 22.0, 13.0
    img1 = shift_image(img0, dx, dy)
    pts = good_points(img0)
    prior = pts + [dx - 0.4, dy + 0.3]
    pyr0 = tuple(im.build_pyramid(jnp.asarray(img0), 1))
    pyr1 = tuple(im.build_pyramid(jnp.asarray(img1), 1))
    res = klt.fb_klt_tracking(pyr0, pyr1, jnp.asarray(pts), jnp.asarray(prior),
                              jnp.ones(len(pts), bool), nlevels=1)
    ok = np.asarray(res.status)
    out = np.asarray(res.points)
    assert ok.mean() > 0.9
    np.testing.assert_allclose(np.median(out[ok] - pts[ok], axis=0), [dx, dy], atol=0.1)


def test_flat_patches_rejected():
    img0 = np.full((240, 320), 100.0, np.float32)
    img0[:, :160] = make_texture(240, 160, seed=11)
    img1 = img0.copy()
    pts = np.array([[240.0, 120.0], [60.0, 120.0]], np.float32)  # flat, textured
    out, ok, err = run_ours(img0, img1, pts, nlevels=1)
    assert not ok[0]
    assert ok[1]


def test_sad_line_prior_recovers_disparity():
    """Batched SAD row scan (getLineMinSAD, feature_tracker.cpp:140-206):
    right image = left shifted by a known disparity."""
    import jax.numpy as jnp
    from ov2slam_tpu.slam import mapper as mapper_mod
    rng = np.random.default_rng(3)
    H, W, d_true = 120, 400, 23
    left = rng.uniform(0, 255, (H, W)).astype(np.float32)
    left = cv2.GaussianBlur(left, (5, 5), 1.0)
    right = np.roll(left, -d_true, axis=1)   # disparity: x_r = x_l - d
    px = rng.uniform(80, 320, (64, 2)).astype(np.float32)
    px[:, 1] = rng.uniform(20, 100, 64)
    x_best, sad = mapper_mod.sad_line_prior(
        jnp.asarray(left), jnp.asarray(right), jnp.asarray(px), win=9,
        max_disp=64)
    disp = np.round(px[:, 0]) - np.asarray(x_best)
    good = np.abs(disp - d_true) <= 1
    assert good.mean() > 0.9, f"only {good.mean():.2f} recovered d={d_true}"
    assert np.asarray(sad)[good].mean() < 10.0
