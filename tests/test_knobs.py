"""No silently-ignored YAML key: every SlamParams knob either changes
behavior or warns loudly (reference parses these in slam_params.cpp:28-173).
"""

import warnings

import numpy as np
import jax
import pytest

from ov2slam_tpu.config import SlamParams
from tests import synthetic as syn


def _params(**kw):
    d = syn.slam_params_dict()
    d.update(kw)
    return SlamParams.from_dict(d)


def _system(**kw):
    from ov2slam_tpu.slam.manager import SlamSystem
    return SlamSystem(_params(**kw))


@pytest.mark.parametrize("kw", [
    dict(use_subspace_dogleg=1),
    dict(do_klt=0),
    dict(klt_use_prior=0),
    dict(use_nonmonotic_step=1),
])
def test_unsupported_knobs_warn(kw):
    with pytest.warns(UserWarning):
        _system(**kw)


def test_use_dogleg_routes_to_dogleg_solver():
    # use_dogleg selects the Powell dogleg trust region in the device solver
    # (reference: optimizer.cpp:448-456 Ceres DOGLEG); it must construct
    # without warning and solve BA problems as well as LM does
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        s = _system(use_dogleg=1)
    assert s.params.use_dogleg


def test_supported_defaults_do_not_warn():
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _system()


def test_bdo_random_pins_ransac_key():
    s0 = _system(bdo_random=0)
    s1 = _system(bdo_random=1)
    k_a = np.asarray(jax.random.key_data(s0._key(7)))
    k_b = np.asarray(jax.random.key_data(s0._key(13)))
    assert np.array_equal(k_a, k_b)          # pinned sampling
    k_c = np.asarray(jax.random.key_data(s1._key(7)))
    k_d = np.asarray(jax.random.key_data(s1._key(13)))
    assert not np.array_equal(k_c, k_d)      # randomized per call site


def test_bdo_undist_builds_remap_and_zeroes_distortion():
    s = _system(bdo_undist=1, **{
        "Camera.k1l": -0.28, "Camera.k2l": 0.07,
        "Camera.k1r": -0.28, "Camera.k2r": 0.07})
    assert s.rect_maps is not None and s._undistorted
    assert float(np.abs(np.asarray(s.cam_l.dist)).max()) == 0.0
    # undistort keeps the original K (reference setUndistMap alpha=0 keeps
    # the projection center; our map uses K_new=K exactly)
    assert np.allclose(np.asarray(s.cam_l.K)[0, 0], syn.FX)
    # NOT a stereo rectification: rows are only aligned via pure baseline
    assert s._rows_aligned  # synthetic rig IS pure-baseline after undist


def test_bdo_undist_noop_without_distortion():
    s = _system(bdo_undist=1)
    assert s.rect_maps is None and not s._undistorted


def test_kf_capacity_warns_on_overflow():
    from ov2slam_tpu.slam.map import MapStore, KeyframeRecord

    m = MapStore(1 << 10, kf_capacity=2)
    K = 64

    def rec(kfid):
        return KeyframeRecord(
            kfid=kfid, time=float(kfid), T_cw=np.eye(4, dtype=np.float32),
            px=np.zeros((K, 2), np.float32), unpx=np.zeros((K, 2), np.float32),
            bv=np.zeros((K, 3), np.float32), lmid=np.full(K, -1, np.int32),
            valid=np.zeros(K, bool), is3d=np.zeros(K, bool),
            rpx=np.zeros((K, 2), np.float32), has_right=np.zeros(K, bool),
            desc=np.zeros((K, 8), np.uint32), desc_ok=np.zeros(K, bool))

    m.add_keyframe(rec(0))
    m.add_keyframe(rec(1))
    with pytest.warns(UserWarning, match="kf_capacity"):
        m.add_keyframe(rec(2))


def test_sad_prior_never_negative_disparity():
    """Keypoints near the left border must not get a rightward (negative
    disparity) SAD prior (reference scans leftward only,
    feature_tracker.cpp:140-206)."""
    from ov2slam_tpu.slam.mapper import sad_line_prior

    rng = np.random.default_rng(3)
    H, W = 64, 256
    left = rng.uniform(0, 255, (H, W)).astype(np.float32)
    # right image = left shifted right by 30px => true disparity 30 for
    # x >= 30; craft a tempting duplicate to the RIGHT of border kps
    right = np.zeros_like(left)
    right[:, 30:] = left[:, :-30]
    # plant an exact copy of the border patch at x+20 (negative disparity -20)
    y, x = 32, 8
    right[y - 4:y + 5, x + 16:x + 25] = left[y - 4:y + 5, x - 4:x + 5]
    px = np.array([[x, y]], np.float32)
    x_best, sad = sad_line_prior(left, right, px, win=9, max_disp=64)
    assert float(x_best[0]) <= x + 1e-3, "negative-disparity prior returned"
