#!/usr/bin/env python
"""EuRoC benchmark runner — the reference's benchmark protocol
(benchmark_scripts/euroc_bench.sh: 5 sequences x 5 repeats, renamed
trajectory outputs for offline ATE evaluation) without ROS/rosbag.

    python scripts/euroc_bench.py --data-root /path/to/euroc \
        --preset parameters_files/accurate/euroc/euroc_stereo.yaml \
        --sequences MH_01_easy MH_02_easy --repeats 5 --out bench_out

Each run writes ov2slam_traj_<seq>_<i>.txt (TUM) etc.; if the sequence has
ground truth (mav0/state_groundtruth_estimate0/data.csv), prints ATE RMSE.
"""

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_euroc_gt(seq_dir):
    p = os.path.join(seq_dir, "mav0", "state_groundtruth_estimate0", "data.csv")
    if not os.path.exists(p):
        return None
    ts, pos = [], []
    with open(p) as f:
        for row in csv.reader(f):
            if row[0].startswith("#"):
                continue
            ts.append(int(row[0]) * 1e-9)
            pos.append([float(row[1]), float(row[2]), float(row[3])])
    return np.asarray(ts), np.asarray(pos)


def associate_ate(traj_path, gt):
    from ov2slam_tpu.io.trajectories import ate_rmse
    est = np.loadtxt(traj_path)
    if est.ndim != 2 or len(est) < 10:
        return None
    gt_t, gt_p = gt
    idx = np.searchsorted(gt_t, est[:, 0])
    idx = np.clip(idx, 0, len(gt_t) - 1)
    ok = np.abs(gt_t[idx] - est[:, 0]) < 0.05
    if ok.sum() < 10:
        return None
    return ate_rmse(est[ok, 1:4], gt_p[idx[ok]])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--preset", required=True)
    ap.add_argument("--sequences", nargs="+",
                    default=["MH_01_easy", "MH_02_easy", "MH_03_medium",
                             "MH_04_difficult", "MH_05_difficult"])
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--out", default="bench_out")
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args()

    from ov2slam_tpu import run as run_mod
    os.makedirs(args.out, exist_ok=True)
    summary = []
    for seq in args.sequences:
        seq_dir = os.path.join(args.data_root, seq)
        gt = load_euroc_gt(seq_dir)
        for i in range(args.repeats):
            run_dir = os.path.join(args.out, f"{seq}_{i}")
            argv = [args.preset, seq_dir, "--dataset", "euroc",
                    "--out", run_dir]
            if args.max_frames:
                argv += ["--max-frames", str(args.max_frames)]
            run_mod.main(argv)
            # rename outputs per protocol
            for name in ("ov2slam_traj.txt", "ov2slam_kfs_traj.txt",
                         "ov2slam_full_traj_wlc_opt.txt"):
                src = os.path.join(run_dir, name)
                if os.path.exists(src):
                    dst = os.path.join(
                        args.out, name.replace(".txt", f"_{seq}_{i}.txt"))
                    os.replace(src, dst)
            traj = os.path.join(args.out, f"ov2slam_traj_{seq}_{i}.txt")
            ate = associate_ate(traj, gt) if gt is not None else None
            summary.append((seq, i, ate))
            if ate is not None:
                print(f"{seq} run {i}: ATE RMSE {ate:.4f} m")
    print("\n== summary ==")
    for seq in args.sequences:
        ates = [a for s, _, a in summary if s == seq and a is not None]
        if ates:
            print(f"{seq}: ATE {np.mean(ates):.4f} +- {np.std(ates):.4f} m "
                  f"over {len(ates)} runs")


if __name__ == "__main__":
    main()
