"""Byte-exact public dataset-layout fixtures for the readers (VERDICT r4
next-step #10): the EuRoC ASL, KITTI-odometry and TartanAir directory trees
are reproduced exactly as they ship (filename patterns, csv headers,
timestamp units) so a schema mismatch surfaces here instead of at the first
off-environment run. Reference analogue: the SensorsGrabber's topic layout
assumptions (src/ov2slam_node.cpp:85-149).
"""

import os

import numpy as np
import cv2
import pytest

from ov2slam_tpu.io.datasets import make_reader, STEREO_SYNC_TOL_S


def _png(path, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, size=(32, 48), dtype=np.uint8)
    cv2.imwrite(path, img)
    return img


# EuRoC MAV (ASL format) cam0 timestamps from V1_01_easy — 19-digit
# nanosecond epochs, hardware-synced across cam0/cam1
_EUROC_TS = [1403715273262142976, 1403715273312143104, 1403715273362142976,
             1403715273412143104, 1403715273462142976]


def _make_euroc(root):
    for cam in ("cam0", "cam1"):
        d = os.path.join(root, "mav0", cam, "data")
        os.makedirs(d)
        # data.csv exactly as shipped (header line + ns,filename rows)
        with open(os.path.join(root, "mav0", cam, "data.csv"), "w") as f:
            f.write("#timestamp [ns],filename\n")
            for ts in _EUROC_TS:
                f.write(f"{ts},{ts}.png\n")
        # sensor.yaml sits next to data/ in the real tree; presence only
        with open(os.path.join(root, "mav0", cam, "sensor.yaml"), "w") as f:
            f.write("sensor_type: camera\n")
        for i, ts in enumerate(_EUROC_TS):
            _png(os.path.join(d, f"{ts}.png"), seed=i)


def test_euroc_asl_layout(tmp_path):
    root = str(tmp_path / "V1_01_easy")
    _make_euroc(root)
    r = make_reader("euroc", root, stereo=True)
    frames = list(r)
    assert len(r) == 5 and len(frames) == 5
    for (iml, imr, t), ts in zip(frames, _EUROC_TS):
        assert iml.shape == (32, 48) and imr.shape == (32, 48)
        # timestamps are ns -> seconds
        assert abs(t - ts * 1e-9) < 1e-6
    # accepts the sequence dir itself OR its mav0 subdir
    r2 = make_reader("euroc", os.path.join(root, "mav0"), stereo=True)
    assert len(list(r2)) == 5


def test_euroc_drops_unsynced_frames(tmp_path):
    root = str(tmp_path / "seq")
    _make_euroc(root)
    # nudge one right-cam frame beyond the 15 ms sync tolerance
    d1 = os.path.join(root, "mav0", "cam1", "data")
    bad = _EUROC_TS[2]
    os.rename(os.path.join(d1, f"{bad}.png"),
              os.path.join(d1, f"{bad + int(2.5 * STEREO_SYNC_TOL_S * 1e9)}.png"))
    frames = list(make_reader("euroc", root, stereo=True))
    # the unsynced left frame is dropped, like the grabber
    assert len(frames) == 4
    assert all(imr is not None for _, imr, _ in frames)


def test_kitti_odometry_layout(tmp_path):
    # KITTI odometry: dataset/sequences/00/{image_0,image_1,times.txt,calib.txt}
    seq = tmp_path / "dataset" / "sequences" / "00"
    for sub in ("image_0", "image_1"):
        os.makedirs(seq / sub)
    # times.txt exactly as shipped: %e-formatted seconds, one per line
    times = [0.0, 0.103745, 0.207488, 0.311231]
    with open(seq / "times.txt", "w") as f:
        for t in times:
            f.write(f"{t:e}\n")
    with open(seq / "calib.txt", "w") as f:
        f.write("P0: 7.070912e+02 0.000000e+00 6.018873e+02 0.000000e+00 "
                "0.000000e+00 7.070912e+02 1.831104e+02 0.000000e+00 "
                "0.000000e+00 0.000000e+00 1.000000e+00 0.000000e+00\n")
    for i in range(4):
        _png(str(seq / "image_0" / f"{i:06d}.png"), seed=i)
        _png(str(seq / "image_1" / f"{i:06d}.png"), seed=100 + i)

    r = make_reader("kitti", str(seq), stereo=True)
    frames = list(r)
    assert len(frames) == 4
    for i, (iml, imr, t) in enumerate(frames):
        assert imr is not None
        assert abs(t - times[i]) < 1e-6


def test_tartanair_layout(tmp_path):
    # TartanAir: <env>/Easy/P001/{image_left,image_right}/000000_left.png
    traj = tmp_path / "abandonedfactory" / "Easy" / "P001"
    for sub in ("image_left", "image_right"):
        os.makedirs(traj / sub)
    for i in range(3):
        _png(str(traj / "image_left" / f"{i:06d}_left.png"), seed=i)
        _png(str(traj / "image_right" / f"{i:06d}_right.png"), seed=50 + i)
    frames = list(make_reader("tartanair", str(traj), stereo=True))
    assert len(frames) == 3
    assert all(imr is not None for _, imr, _ in frames)
    # 10 fps synthetic clock
    assert abs(frames[1][2] - frames[0][2] - 0.1) < 1e-9


def test_mono_fallback_when_right_missing(tmp_path):
    root = str(tmp_path / "seq")
    _make_euroc(root)
    import shutil
    shutil.rmtree(os.path.join(root, "mav0", "cam1"))
    frames = list(make_reader("euroc", root, stereo=True))
    assert len(frames) == 5
    assert all(imr is None for _, imr, _ in frames)
