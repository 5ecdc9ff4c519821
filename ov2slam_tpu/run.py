"""CLI entry point: run SLAM over a dataset directory.

Replaces the reference's ROS node (reference: src/ov2slam_node.cpp:159-223,
`rosrun ov2slam ov2slam_node params.yaml`):

    python -m ov2slam_tpu.run <params.yaml> <dataset_dir> \
        [--dataset euroc|kitti|tartanair] [--out DIR] [--max-frames N]

Writes reference-compatible trajectory files into --out and prints the
profiler summary when log_timings is set.
"""

from __future__ import annotations

import argparse
import os
import sys
import time as _time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("params", help="parameter YAML (parameters_files/...)")
    ap.add_argument("dataset_dir", help="dataset root directory")
    ap.add_argument("--dataset", default="euroc",
                    choices=["euroc", "kitti", "tartanair"])
    ap.add_argument("--out", default=".", help="output directory")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=1,
                    help="frames per device dispatch (throughput mode; "
                         "keyframe decisions quantize to chunk ends)")
    ap.add_argument("--no-cache", action="store_true",
                    help="disable the persistent XLA compilation cache")
    ap.add_argument("--viz-every", type=int, default=0, metavar="N",
                    help="every N frames dump the tracked-keypoint overlay "
                         "(viz/track_FFFFFF.png) and refresh the map + KF "
                         "trajectory PLYs under --out (the reference's "
                         "frame-rate/KF-rate rviz hooks, ov2slam.cpp:461-480 "
                         "+ ros_visualizer.hpp:61-311, as files)")
    args = ap.parse_args(argv)

    if not args.no_cache:
        from ov2slam_tpu.utils import enable_compilation_cache
        enable_compilation_cache()

    from ov2slam_tpu.config import SlamParams
    from ov2slam_tpu.io.datasets import make_reader
    from ov2slam_tpu.slam.manager import SlamSystem

    params = SlamParams.from_yaml(args.params)
    reader = make_reader(args.dataset, args.dataset_dir, stereo=params.stereo)
    slam = SlamSystem(params)

    n = 0
    n_dropped = 0
    t0 = _time.perf_counter()
    batch = []
    # force_realtime frame dropping (reference: getNewImage with
    # bforce_realtime_, ov2slam.cpp:291-298 — keep only the newest queued
    # frame). Replay emulation: frames "arrive" at their timestamps on a
    # simulated clock anchored at the first frame; a frame is dropped when a
    # newer one has already arrived by the time processing gets to it.
    frames_it = iter(reader)
    ts_anchor = None

    def _stream():
        nonlocal ts_anchor, n_dropped
        prev = None
        for cur in frames_it:
            if ts_anchor is None:
                ts_anchor = (_time.perf_counter(), cur[2])
            if prev is not None:
                if params.force_realtime:
                    sim_now = ts_anchor[1] + (_time.perf_counter() - ts_anchor[0])
                    if sim_now >= cur[2]:   # a newer frame already arrived
                        n_dropped += 1
                        prev = cur
                        continue
                yield prev
            prev = cur
        if prev is not None:
            yield prev

    for iml, imr, t in _stream():
        if params.stereo and imr is not None:
            if args.chunk > 1:
                batch.append((iml, imr, t))
                if len(batch) >= args.chunk:
                    slam.process_stereo_chunk(batch)
                    batch = []
            else:
                slam.process_stereo(iml, imr, t)
        else:
            slam.process_mono(iml, t)
        n += 1
        if args.viz_every and n % args.viz_every == 0:
            from ov2slam_tpu import viz
            viz_dir = os.path.join(args.out, "viz")
            os.makedirs(viz_dir, exist_ok=True)
            try:
                import cv2
                # overlay on the image the tracker actually sees (rectified
                # + CLAHE'd pyramid level 0) so keypoints line up
                base = (slam.fe_state.pyr[0]
                        if getattr(slam, "fe_state", None) is not None
                        else iml)
                img = viz.draw_track_image(
                    np.asarray(base, dtype=np.float32), slam)
                cv2.imwrite(os.path.join(viz_dir, f"track_{n:06d}.png"), img)
            except ImportError:
                pass            # overlay needs cv2; PLYs below do not
            viz.export_map_ply(slam, viz_dir)
        if args.max_frames and n >= args.max_frames:
            break
        if n % 200 == 0:
            fps = n / (_time.perf_counter() - t0)
            print(f"[{n}/{len(reader)}] {fps:.1f} fps, "
                  f"{len(slam.map.keyframes)} KFs, {slam.map.n_3d()} landmarks",
                  file=sys.stderr)
    if batch:
        slam.process_stereo_chunk(batch)

    dt = _time.perf_counter() - t0
    os.makedirs(args.out, exist_ok=True)
    slam.write_results(args.out)
    if args.dataset == "tartanair":
        # timestamp-free variants for the TartanAir eval tooling
        # (logger.hpp:162-185, :242-271)
        slam.logger.write_tartanair(
            os.path.join(args.out, "ov2slam_traj_tartanair.txt"))
        slam.logger.write_tartanair(
            os.path.join(args.out, "ov2slam_kfs_traj_tartanair.txt"),
            kf_only=True)
    print(f"processed {n} frames in {dt:.1f}s ({n / max(dt, 1e-9):.2f} fps); "
          f"dropped {n_dropped}; "
          f"{len(slam.map.keyframes)} keyframes, {slam.map.n_3d()} landmarks; "
          f"results in {args.out}")
    if params.log_timings:
        print(slam.prof.summary())


if __name__ == "__main__":
    main()
