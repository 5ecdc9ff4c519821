"""Detector + descriptor tests (reference behavior: src/feature_extractor.cpp)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from ov2slam_tpu.ops import detect, describe, image as im


def make_texture(h=480, w=752, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, size=(h // 8, w // 8)).astype(np.float32)
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
    return np.clip(img, 0, 255).astype(np.float32)


def corners_image(h=480, w=752, n=12, seed=2):
    """Black canvas with bright axis-aligned squares => strong corners."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 20.0, np.float32)
    gt = []
    for _ in range(n):
        y = rng.integers(60, h - 100)
        x = rng.integers(60, w - 100)
        s = rng.integers(20, 40)
        img[y:y + s, x:x + s] = 220.0
        gt += [(x, y), (x + s - 1, y), (x, y + s - 1), (x + s - 1, y + s - 1)]
    return img, np.array(gt, np.float32)


def test_min_eig_response_vs_opencv():
    img = make_texture()
    ours = np.asarray(detect.min_eig_response(jnp.asarray(img), gauss_blur=False))
    ref = cv2.cornerMinEigenVal(img, 3, 3)
    # agreement on strong corners: correlation of the maps
    c = np.corrcoef(ours[5:-5, 5:-5].ravel(), ref[5:-5, 5:-5].ravel())[0, 1]
    assert c > 0.98


def test_grid_select_finds_corners():
    img, gt = corners_image()
    resp = detect.min_eig_response(jnp.asarray(img))
    K = 8
    no_kps = jnp.zeros((K, 2), jnp.float32)
    no_valid = jnp.zeros((K,), bool)
    det = detect.grid_select(resp, no_kps, no_valid, 35, jnp.asarray(1.0))
    pts = np.asarray(det.points)[np.asarray(det.valid)]
    pts2 = np.asarray(det.points2)[np.asarray(det.valid2)]
    allpts = np.concatenate([pts, pts2], axis=0)
    # every ground-truth corner has a (primary or secondary) detection within
    # 3 px — two corners of one square can share a grid cell, where only the
    # top-2 per cell are representable (by design, one kp per cell + pool)
    d = np.linalg.norm(allpts[None, :, :] - gt[:, None, :], axis=-1).min(axis=1)
    assert (d < 3.0).mean() > 0.9


def test_grid_select_respects_occupancy():
    img, gt = corners_image()
    resp = detect.min_eig_response(jnp.asarray(img))
    # mark all gt corners as existing keypoints
    K = 64
    kps = np.zeros((K, 2), np.float32)
    valid = np.zeros((K,), bool)
    kps[: len(gt)] = gt
    valid[: len(gt)] = True
    det = detect.grid_select(resp, jnp.asarray(kps), jnp.asarray(valid), 35, jnp.asarray(1.0))
    pts = np.asarray(det.points)[np.asarray(det.valid)]
    if len(pts):
        d = np.linalg.norm(pts[:, None, :] - gt[None, :, :], axis=-1).min(axis=1)
        # no new detection on top of an existing keypoint's cell/disc
        assert d.min() > 4.0


def test_one_kp_per_cell():
    img = make_texture(seed=4)
    resp = detect.min_eig_response(jnp.asarray(img))
    det = detect.grid_select(resp, jnp.zeros((4, 2)), jnp.zeros(4, bool), 35, jnp.asarray(1e-4))
    pts = np.asarray(det.points)[np.asarray(det.valid)]
    cells = set()
    for x, y in pts:
        c = (int(y // 35), int(x // 35))
        assert c not in cells
        cells.add(c)


def test_fast_score_vs_opencv():
    img = make_texture(seed=6)
    score = np.asarray(detect.fast_score(jnp.asarray(img), 20.0))
    fast = cv2.FastFeatureDetector_create(threshold=20, nonmaxSuppression=False)
    kp = fast.detect(img.astype(np.uint8), None)
    ref = np.zeros(img.shape, bool)
    for k in kp:
        ref[int(round(k.pt[1])), int(round(k.pt[0]))] = True
    ours = score > 0
    inter = (ours & ref).sum()
    # high overlap between corner sets (float vs uint8 rounding at play)
    assert inter / max(ref.sum(), 1) > 0.85
    assert inter / max(ours.sum(), 1) > 0.85


def test_corner_subpix_refines():
    # a bright square corner at a known sub-pixel-ish location
    img, gt = corners_image(n=6, seed=8)
    img = cv2.GaussianBlur(img, (5, 5), 1.0)
    noisy = gt + np.array([0.8, -0.6], np.float32)
    ours = np.asarray(
        detect.corner_subpix(jnp.asarray(img), jnp.asarray(noisy), jnp.ones(len(gt), bool))
    )
    ref = noisy.reshape(-1, 1, 2).copy()
    cv2.cornerSubPix(img, ref, (3, 3), (-1, -1),
                     (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 30, 0.01))
    ref = ref.reshape(-1, 2)
    d = np.linalg.norm(ours - ref, axis=-1)
    assert np.median(d) < 0.25


def test_brief_descriptor_properties():
    img = make_texture(seed=10)
    img2 = make_texture(seed=11)
    pts = np.array([[100.0, 100.0], [300.0, 200.0], [500.0, 350.0], [650.0, 400.0]], np.float32)
    valid = jnp.ones(len(pts), bool)
    d1, ok1 = describe.describe_brief(jnp.asarray(img), jnp.asarray(pts), valid)
    assert np.asarray(ok1).all()
    # same image, same points -> identical descriptors
    d1b, _ = describe.describe_brief(jnp.asarray(img), jnp.asarray(pts), valid)
    assert (np.asarray(d1) == np.asarray(d1b)).all()
    # tiny shift -> small hamming; different image -> ~128 hamming
    d2, _ = describe.describe_brief(jnp.asarray(img), jnp.asarray(pts + 0.5), valid)
    d3, _ = describe.describe_brief(jnp.asarray(img2), jnp.asarray(pts), valid)
    h_small = np.asarray(describe.hamming_dist(d1, d2))
    h_rand = np.asarray(describe.hamming_dist(d1, d3))
    assert h_small.mean() < 40
    assert 90 < h_rand.mean() < 170


def test_hamming_matrix_vs_numpy():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2**32, size=(17, 8), dtype=np.uint32)
    b = rng.integers(0, 2**32, size=(23, 8), dtype=np.uint32)
    ours = np.asarray(describe.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    ref = np.zeros((17, 23), np.int32)
    for i in range(17):
        for j in range(23):
            ref[i, j] = bin(int.from_bytes(a[i].tobytes(), "little")
                            ^ int.from_bytes(b[j].tobytes(), "little")).count("1")
    np.testing.assert_array_equal(ours, ref)


def test_hamming_mxu_path_matches_exact():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 2**32, size=(64, 8), dtype=np.uint32)
    b = rng.integers(0, 2**32, size=(128, 8), dtype=np.uint32)
    exact = np.asarray(describe.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    am = describe.unpack_bits_pm1(jnp.asarray(a))
    bm = describe.unpack_bits_pm1(jnp.asarray(b))
    mxu = np.asarray(describe.hamming_matrix_mxu(am, bm))
    np.testing.assert_array_equal(mxu, exact)


def test_knn2_match():
    rng = np.random.default_rng(2)
    b = rng.integers(0, 2**32, size=(50, 8), dtype=np.uint32)
    # a = permuted b with bit flips
    a = b[::-1].copy()
    a[:, 0] ^= np.uint32(0b1011)  # 3-bit flips
    idx, bd, sd = describe.knn2_match(
        jnp.asarray(a), jnp.ones(50, bool), jnp.asarray(b), jnp.ones(50, bool))
    idx = np.asarray(idx)
    np.testing.assert_array_equal(idx, np.arange(50)[::-1])
    assert np.asarray(bd).max() <= 3
    assert (np.asarray(sd) > np.asarray(bd)).all()
