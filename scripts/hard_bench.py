"""Hard synthetic benchmark: the EuRoC-protocol stand-in for this
environment (no dataset download possible — reference protocol:
benchmark_scripts/euroc_bench.sh runs each sequence through every preset
tier and reports ATE).

Renders a 1000+ frame distorted, exposure-drifted loop sequence around a
textured room (tests/hard_synthetic.py), caches it as a uint8 memmap, then
runs a matrix of configuration tiers through SlamSystem and writes an ATE
table to BENCH_TABLE.md.

Usage:
    python scripts/hard_bench.py [--frames 1000] [--configs accurate,fast]
                                 [--out BENCH_TABLE.md]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

DIST = (-0.28, 0.07)


def render_cache(n_frames: int, cache_dir: str, cam=None,
                 traj: str = "loop", dist=DIST) -> tuple:
    """Render (or reuse) the sequence as uint8 memmaps + GT poses."""
    import hard_synthetic as hs
    if cam is None:
        cam = hs.CAM_EUROC
    os.makedirs(cache_dir, exist_ok=True)
    meta_p = os.path.join(cache_dir, "meta.json")
    l_p = os.path.join(cache_dir, "left.u8")
    r_p = os.path.join(cache_dir, "right.u8")
    g_p = os.path.join(cache_dir, "gt.npy")
    H, W = cam.H, cam.W
    if os.path.exists(meta_p):
        meta = json.load(open(meta_p))
        if (meta.get("n") == n_frames and tuple(meta.get("dist")) == tuple(dist)
                and meta.get("hw", [hs.CAM_EUROC.H, hs.CAM_EUROC.W]) == [H, W]
                and meta.get("traj", "loop") == traj):
            L = np.memmap(l_p, np.uint8, "r", shape=(n_frames, H, W))
            R = np.memmap(r_p, np.uint8, "r", shape=(n_frames, H, W))
            return L, R, np.load(g_p)
    print(f"rendering {n_frames} frames ({W}x{H}, traj={traj}) to "
          f"{cache_dir} ...", flush=True)
    L = np.memmap(l_p, np.uint8, "w+", shape=(n_frames, H, W))
    R = np.memmap(r_p, np.uint8, "w+", shape=(n_frames, H, W))
    gt = np.zeros((n_frames, 4, 4))
    t0 = time.time()
    for i, (il, ir, _, T) in enumerate(
            hs.render_hard_sequence(n_frames, dist=dist, cam=cam, traj=traj)):
        L[i] = il.astype(np.uint8)
        R[i] = ir.astype(np.uint8)
        gt[i] = T
        if i % 100 == 0:
            print(f"  {i}/{n_frames} ({time.time()-t0:.0f}s)", flush=True)
    L.flush(); R.flush()
    np.save(g_p, gt)
    json.dump({"n": n_frames, "dist": list(dist), "hw": [H, W], "traj": traj},
              open(meta_p, "w"))
    return L, R, gt


# Configuration tiers are built FROM THE SHIPPED PRESET FILES
# (parameters_files/{accurate,average,fast}/euroc/euroc_{stereo,mono}.yaml),
# overriding only the camera calibration with the synthetic rig — so every
# run here integration-tests a real preset end to end (the reference's
# euroc_bench.sh drives the same files through the node).
_CAL_KEYS = ("T_left_right", "body_T_cam0", "body_T_cam1")


_SYNTH_CAMS = {"euroc": "CAM_EUROC", "kitti": "CAM_KITTI",
               "tartanair": "CAM_TARTAN"}


def synth_cam(dataset: str):
    import hard_synthetic as hs
    return getattr(hs, _SYNTH_CAMS.get(dataset, "CAM_EUROC"))


def preset_config(tier: str, mode: str, dataset: str = "euroc",
                  preset_file: str = None, **overrides):
    import hard_synthetic as hs
    from ov2slam_tpu.config import load_opencv_yaml
    fname = preset_file or f"{dataset}_{mode}.yaml"
    path = os.path.join(REPO, "parameters_files", tier, dataset, fname)
    d = load_opencv_yaml(path)
    d = {k: v for k, v in d.items()
         if not k.startswith("Camera.") and k not in _CAL_KEYS}
    cam = synth_cam(dataset)
    # TartanAir's rig is distortion-free (its presets ship k1=0); the other
    # synthetic rigs carry the adversarial Brown distortion
    dist = (0.0, 0.0) if dataset == "tartanair" else DIST
    cal = hs.params_dict(dist=dist, use_clahe=int(d.get("use_clahe", 1)),
                         cam=cam)
    d.update({k: v for k, v in cal.items()
              if k.startswith("Camera.") or k == "T_left_right"})
    if mode == "mono":
        d.update(mono=1, stereo=0)
    else:
        d.update(mono=0, stereo=1)
    # the synthetic camera's keypoint-budget / parallax knobs (the presets
    # carry dataset-tuned values for everything else)
    d.setdefault("nmaxdist", 45)
    d.update(overrides)
    d["__preset__"] = os.path.relpath(path, REPO)
    d["__cam__"] = dataset
    d["__dist__"] = dist
    return d


def tier_configs():
    cfgs = {}
    cfgs["accurate_stereo"] = preset_config("accurate", "stereo")
    cfgs["average_stereo"] = preset_config("average", "stereo")
    cfgs["fast_stereo"] = preset_config("fast", "stereo")
    cfgs["accurate_stereo_nolc"] = preset_config(
        "accurate", "stereo", buse_loop_closer=0)
    # rectification path end-to-end: undistort+rectify remap at frame rate
    cfgs["accurate_stereo_rect"] = preset_config(
        "accurate", "stereo", bdo_stereo_rect=1)
    # preset-faithful mono (the reference's own mono presets ship
    # buse_loop_closer: 0, parameters_files/*/euroc/euroc_mono.yaml)
    cfgs["accurate_mono"] = preset_config("accurate", "mono")
    cfgs["fast_mono"] = preset_config("fast", "mono")
    # mono WITH loop closing — the reference's LoopCloser runs identically
    # in mono (loop_closer.cpp:65-184) and is where mono scale drift gets
    # corrected; the sequence revisits its start, so the loop must fire
    cfgs["accurate_mono_lc"] = preset_config("accurate", "mono",
                                             buse_loop_closer=1)
    # the remaining preset families (round-4 task 8: every tier x mode
    # family in parameters_files/ gets at least one integration row)
    cfgs["average_mono"] = preset_config("average", "mono")
    cfgs["tartanair_stereo"] = preset_config(
        "accurate", "stereo", dataset="tartanair")
    # KITTI-resolution tier (1241x376, fx 718.9, 0.537 m baseline) through
    # the shipped KITTI seq-00 preset — exercises the wide-aspect padded
    # shapes end to end
    cfgs["kitti_stereo"] = preset_config(
        "accurate", "stereo", dataset="kitti", preset_file="kitti_00-02.yaml")
    # multi-loop topology: 2 laps => the detector must close the loop on
    # every revisit pass, and the map must stay bounded across laps
    cfgs["accurate_stereo_2laps"] = preset_config("accurate", "stereo")
    cfgs["accurate_stereo_2laps"]["__frames__"] = 2000
    # KITTI-scale endurance: 5000 frames on a figure-8 (two DISTINCT loops,
    # each lobe revisited every period — the KITTI-00 multi-loop regime),
    # several hundred keyframes, and the loop detector running with the
    # SHIPPED iBoW-LCD defaults (p_wait=100 etc.) instead of the small-
    # sequence overrides every other tier needs
    cfgs["endurance_fig8"] = preset_config(
        "accurate", "stereo", lm_capacity=1 << 16)
    cfgs["endurance_fig8"]["__frames__"] = 5000
    cfgs["endurance_fig8"]["__traj__"] = "fig8"
    cfgs["endurance_fig8"]["__stock_lc__"] = True
    return cfgs


WARMUP_FRAMES = 120    # every jit family has compiled by here


def run_config(name, cfg, L, R, gt, max_frames=None):
    from ov2slam_tpu.config import SlamParams
    from ov2slam_tpu.slam.manager import SlamSystem
    from ov2slam_tpu.io.trajectories import ate_rmse
    import tempfile

    n = len(L) if max_frames is None else min(len(L), max_frames)
    preset = cfg.pop("__preset__", "-")
    stock_lc = cfg.pop("__stock_lc__", False)
    cfg.pop("__frames__", None)
    cfg.pop("__cam__", None)
    cfg.pop("__traj__", None)
    cfg.pop("__dist__", None)
    params = SlamParams.from_dict(cfg)
    slam = SlamSystem(params)
    if slam.loopcloser is not None and not stock_lc:
        # loop-detector defaults follow iBoW-LCD's EuRoC-scale values
        # (p = 100 keyframes); the 1000-frame tiers produce ~50 keyframes
        # total, so scale the exclusion window + consistency gate to match
        # (the e2e tests do the same, tests/test_loopclosing.py). The
        # endurance tier (several hundred KFs) runs the SHIPPED defaults.
        slam.loopcloser.detector.p_wait = 12
        slam.loopcloser.detector.island_size = 10
        slam.loopcloser.detector.min_score = 3.0
    mono = bool(cfg.get("mono", 0))
    t0 = time.time()
    t_warm = 0.0
    frame_ms = np.zeros(n, np.float64)
    for i in range(n):
        il = L[i].astype(np.float32)
        tf = time.time()
        if mono:
            slam.process_mono(il, time=i * 0.05)
        else:
            slam.process_stereo(il, R[i].astype(np.float32), time=i * 0.05)
        frame_ms[i] = (time.time() - tf) * 1e3
        if i == WARMUP_FRAMES - 1:
            t_warm = time.time() - t0
    slam.flush()
    dt = time.time() - t0
    out = tempfile.mkdtemp()
    slam.write_results(out)

    tr = np.loadtxt(os.path.join(out, "ov2slam_traj.txt"))
    ts = np.round(tr[:, 0] / 0.05).astype(int)
    est = np.full((n, 3), np.nan)
    est[ts[ts < n]] = tr[: (ts < n).sum(), 1:4]
    ok = np.isfinite(est).all(axis=1)
    gt_t = gt[:n, :3, 3]
    # mono trajectories are up-to-scale: Sim(3)-aligned ATE (the standard
    # monocular protocol); stereo is metric: SE(3)-aligned
    ate = ate_rmse(est[ok], gt_t[ok], with_scale=mono) \
        if ok.sum() > 10 else float("nan")
    import jax
    # steady-state throughput: frames after the warmup window, which absorbs
    # every jit compile family (round-3 weakness: wall fps mixed compiles
    # with cruise and made LC tiers look 2.5x slower than they are)
    fps_steady = ((n - WARMUP_FRAMES) / (dt - t_warm)
                  if n > WARMUP_FRAMES and dt > t_warm else n / dt)
    # per-frame latency percentiles AFTER warmup: fps_steady alone hides the
    # tail (KF commits, BA solves, late jit families) — p50 is the cruise
    # frame, p99/max expose the stalls that actually set the wall clock
    steady_ms = frame_ms[WARMUP_FRAMES:] if n > WARMUP_FRAMES else frame_ms
    row = {
        "config": name, "preset": preset, "frames": n,
        "fps": round(n / dt, 2),
        "fps_steady": round(fps_steady, 2),
        "frame_ms_p50": round(float(np.percentile(steady_ms, 50)), 1),
        "frame_ms_p90": round(float(np.percentile(steady_ms, 90)), 1),
        "frame_ms_p99": round(float(np.percentile(steady_ms, 99)), 1),
        "warmup_s": round(t_warm, 1),
        "ate_rmse_m": round(float(ate), 4),
        "tracked_pct": round(100.0 * ok.mean(), 1),
        "keyframes": len(slam.map.keyframes),
        "landmarks_3d": slam.map.n_3d(),
        "loops": len(slam.loop_events),
        "loop_closed": slam.last_loop_event is not None,
        # silent-cap observability (SURVEY "no silent caps"): BA windows that
        # overflowed a padded bucket and dropped landmarks/observations
        "ba_truncations": slam.estimator.n_truncations,
        "n_live_buffers": len(jax.live_arrays()),
        "backend": str(jax.devices()[0]),
    }
    # LC-corrected full trajectory, when produced (mono: Sim(3) alignment,
    # same as the raw-trajectory metric)
    wlc = os.path.join(out, "ov2slam_full_traj_wlc_opt.txt")
    if os.path.exists(wlc):
        tr2 = np.loadtxt(wlc)
        est2 = np.full((n, 3), np.nan)
        ts2 = np.round(tr2[:, 0] / 0.05).astype(int)
        est2[ts2[ts2 < n]] = tr2[: (ts2 < n).sum(), 1:4]
        ok2 = np.isfinite(est2).all(axis=1)
        if ok2.sum() > 10:
            row["ate_wlc_opt_m"] = round(
                float(ate_rmse(est2[ok2], gt_t[ok2], with_scale=mono)), 4)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--configs", type=str, default="")
    ap.add_argument("--cache", type=str, default="/tmp/ov2slam_hard_seq")
    ap.add_argument("--out", type=str, default=os.path.join(REPO, "BENCH_TABLE.md"))
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--inproc", action="store_true",
                    help="run configs in this process (no subprocess isolation)")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        # the env var alone is not enough on this machine: the site hook
        # monkeypatches jax.get_backend, and only the config path bypasses
        # the (possibly unreachable) tunneled device client
        import jax
        jax.config.update("jax_platforms", "cpu")

    from ov2slam_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import hard_synthetic as hs
    cfgs = tier_configs()
    wanted = [c for c in args.configs.split(",") if c] or list(cfgs)

    def tier_cache(cfg):
        """(L, R, gt) for a tier's camera / frame-count (cached per kind)."""
        n = int(cfg.get("__frames__", args.frames))
        camname = cfg.get("__cam__", "euroc")
        traj = cfg.get("__traj__", "loop")
        dist = tuple(cfg.get("__dist__", DIST))
        cam = synth_cam(camname)
        suffix = "" if (camname == "euroc" and n == args.frames
                        and traj == "loop") \
            else f"_{camname}_{n}" + ("" if traj == "loop" else f"_{traj}")
        return render_cache(n, args.cache + suffix, cam, traj=traj, dist=dist)

    rows = []
    for name in wanted:
        print(f"== {name} ==", flush=True)
        if args.inproc:
            cfg = cfgs[name]
            L, R, gt = tier_cache(cfg)
            row = run_config(name, cfg, L, R, gt)
        else:
            # each config in its own subprocess: a transient device failure
            # (the tunneled TPU flakes occasionally) only loses that row
            import subprocess
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--frames", str(args.frames), "--cache", args.cache,
                   "--configs", name, "--out", "/dev/null", "--inproc"]
            if args.cpu:
                cmd.append("--cpu")
            res = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=10800)
            row = None
            for line in res.stdout.splitlines():
                if line.startswith("{") and '"config"' in line:
                    row = json.loads(line)
            if row is None:
                print(res.stdout[-1000:])
                print(res.stderr[-1000:])
                row = {"config": name, "frames": args.frames, "fps": 0,
                       "ate_rmse_m": float("nan"),
                       "tracked_pct": 0, "keyframes": 0, "landmarks_3d": 0,
                       "loop_closed": False, "error": "run failed"}
        print(json.dumps(row), flush=True)
        rows.append(row)
        # persist after every tier so an interrupted matrix still leaves a
        # (partial) table behind
        write_table(rows, args)
    # idempotent final write (covers the zero-tier case too)
    write_table(rows, args)
    print(f"wrote {args.out} ({len(rows)} tiers)")


def write_table(rows, args):
    # backend string comes from the child rows — initializing the (flaky,
    # tunneled) TPU backend in the parent mid-matrix could abort the
    # remaining tiers (advisor r3 #1)
    backend = next((r["backend"] for r in rows if r.get("backend")),
                   "unknown")
    cols = ["config", "preset", "frames", "fps", "fps_steady",
            "frame_ms_p50", "frame_ms_p90", "frame_ms_p99", "warmup_s",
            "ate_rmse_m", "ate_wlc_opt_m", "tracked_pct", "keyframes",
            "landmarks_3d", "loops", "ba_truncations"]
    with open(args.out, "w") as f:
        f.write("# Hard synthetic benchmark\n\n")
        f.write(f"Sequence: {args.frames} frames, 752x480 stereo, textured-room "
                f"loop, radial distortion k1={DIST[0]} k2={DIST[1]}, exposure "
                f"drift ±25% (per-tier frame counts / cameras / trajectories "
                f"in the table). Backend: {backend}.\n\n")
        f.write("Reference protocol analogue: benchmark_scripts/euroc_bench.sh "
                "(ATE RMSE per preset tier; no dataset is downloadable in this "
                "environment, so the hard synthetic stands in).\n\n")
        f.write("Notes: every tier loads its SHIPPED preset file (column 2) "
                "with only the synthetic camera's calibration overridden, so "
                "each row integration-tests a real preset end to end. "
                "`ate_rmse_m` is the live (as-tracked) trajectory, "
                "SE(3)-aligned; mono rows use Sim(3) alignment. "
                "`ate_wlc_opt_m` is `ov2slam_full_traj_wlc_opt.txt` (after "
                "loop-closure correction + the full-trajectory pose-graph "
                "final pass). `fps` is cold-subprocess wall clock including "
                "every jit compile and ~1-30 ms/roundtrip tunnel latency; "
                "`fps_steady` excludes the first 120 frames (`warmup_s`), "
                "which absorb every compile family — the steady-state "
                "sequential-mode rate (bench.py measures the pipelined "
                "surface). `loops` counts loop-closure events; the "
                "endurance_fig8 tier runs the SHIPPED iBoW-LCD detector "
                "defaults (p_wait=100), all other tiers scale them to their "
                "~50-KF sequences. `ba_truncations` counts BA windows that "
                "overflowed bucket capacity (observations or landmarks "
                "silently dropped) — 0 means no silent caps fired.\n\n")
        f.write("Preset-knob ATE attribution lives in BENCH_NOTES.md "
                "(hand-written, per-run numbers from scripts/"
                "bisect_preset.py — kept out of this generated table so "
                "regeneration can't carry stale run-specific prose).\n\n")
        f.write("| " + " | ".join(cols) + " |\n")
        f.write("|" + "---|" * len(cols) + "\n")
        for r in rows:
            f.write("| " + " | ".join(str(r.get(c, "-")) for c in cols) + " |\n")


if __name__ == "__main__":
    main()
