"""Dataset readers: EuRoC / KITTI odometry / TartanAir directory layouts.

Replaces the reference's ROS SensorsGrabber (reference: src/ov2slam_node.cpp
:85-149): instead of subscribing to image topics and syncing stereo pairs by
timestamp (+-15 ms), these readers walk the standard on-disk layouts and
yield synchronized (left, right, t) tuples. Image decode is host-side OpenCV.
"""

from __future__ import annotations

import glob
import os
from typing import Iterator, List, Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:                      # pragma: no cover
    cv2 = None

STEREO_SYNC_TOL_S = 0.015   # reference: ov2slam_node.cpp:103-111 (15 ms)


def _imread_gray(path: str) -> np.ndarray:
    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise IOError(f"cannot read image {path}")
    return img.astype(np.float32)


class EurocReader:
    """ASL layout: <root>/mav0/cam{0,1}/data/<ns>.png + data.csv."""

    def __init__(self, root: str, stereo: bool = True):
        base = root
        if os.path.isdir(os.path.join(root, "mav0")):
            base = os.path.join(root, "mav0")
        self.cam0 = os.path.join(base, "cam0", "data")
        self.cam1 = os.path.join(base, "cam1", "data")
        self.stereo = stereo and os.path.isdir(self.cam1)
        self.left = self._index(self.cam0)
        self.right = self._index(self.cam1) if self.stereo else []

    @staticmethod
    def _index(d: str) -> List[Tuple[float, str]]:
        out = []
        for f in sorted(glob.glob(os.path.join(d, "*.png"))):
            ns = os.path.splitext(os.path.basename(f))[0]
            try:
                out.append((int(ns) * 1e-9, f))
            except ValueError:
                continue
        return out

    def __len__(self):
        return len(self.left)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, Optional[np.ndarray], float]]:
        if not self.stereo:
            for t, f in self.left:
                yield _imread_gray(f), None, t
            return
        rt = np.asarray([t for t, _ in self.right])
        for t, f in self.left:
            j = int(np.searchsorted(rt, t))
            best, bd = -1, STEREO_SYNC_TOL_S
            for k in (j - 1, j, j + 1):
                if 0 <= k < len(rt) and abs(rt[k] - t) <= bd:
                    best, bd = k, abs(rt[k] - t)
            if best < 0:
                continue   # drop unsynced frames, like the grabber
            yield _imread_gray(f), _imread_gray(self.right[best][1]), t


class KittiReader:
    """KITTI odometry layout: <root>/image_0, image_1, times.txt."""

    def __init__(self, root: str, stereo: bool = True):
        self.left_dir = os.path.join(root, "image_0")
        self.right_dir = os.path.join(root, "image_1")
        self.stereo = stereo and os.path.isdir(self.right_dir)
        with open(os.path.join(root, "times.txt")) as f:
            self.times = [float(x) for x in f.read().split()]
        self.files = sorted(glob.glob(os.path.join(self.left_dir, "*.png")))

    def __len__(self):
        return len(self.files)

    def __iter__(self):
        for i, f in enumerate(self.files):
            t = self.times[i] if i < len(self.times) else i * 0.1
            imr = None
            if self.stereo:
                rf = os.path.join(self.right_dir, os.path.basename(f))
                if os.path.exists(rf):
                    imr = _imread_gray(rf)
            yield _imread_gray(f), imr, t


class TartanAirReader:
    """TartanAir layout: <root>/image_left/*_left.png, image_right/..."""

    def __init__(self, root: str, stereo: bool = True, fps: float = 10.0):
        self.left = sorted(glob.glob(os.path.join(root, "image_left", "*.png")))
        self.right_dir = os.path.join(root, "image_right")
        self.stereo = stereo and os.path.isdir(self.right_dir)
        self.dt = 1.0 / fps

    def __len__(self):
        return len(self.left)

    def __iter__(self):
        for i, f in enumerate(self.left):
            imr = None
            if self.stereo:
                rf = os.path.join(
                    self.right_dir,
                    os.path.basename(f).replace("_left", "_right"))
                if os.path.exists(rf):
                    imr = _imread_gray(rf)
            yield _imread_gray(f), imr, i * self.dt


def make_reader(kind: str, root: str, stereo: bool = True):
    kind = kind.lower()
    if kind == "euroc":
        return EurocReader(root, stereo)
    if kind == "kitti":
        return KittiReader(root, stereo)
    if kind == "tartanair":
        return TartanAirReader(root, stereo)
    raise ValueError(f"unknown dataset kind: {kind}")
