"""Knob bisection for the accurate_stereo preset-accuracy regression.

Round-3 verdict: driving the SHIPPED accurate/euroc/euroc_stereo.yaml preset
regressed raw ATE 0.0216 -> 0.0361 vs the round-2 hand-built config on the
same sequence. The effective SlamParams diff is exactly four knobs:

    force_realtime  False -> True   (pipelined tracking: stats finalized
                                     pipeline_depth frames late, KF commit
                                     staged, BA writeback deferred)
    async_ba        False -> True   (BA dispatched at KF k, written back
                                     BA_LAG frames later)
    nmaxdist        45 -> 35        (detector cell size: more, denser kps)
    nmin_covscore   15 -> 25        (BA covisibility window threshold)

This script runs the shipped preset with each knob toggled back individually
(plus both endpoints) and prints one JSON row per variant, so the BENCH_TABLE
notes can name the responsible knob(s).

Usage: python scripts/bisect_preset.py [--frames 1000] [--variants a,b,...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def variants():
    v = {}
    v["preset"] = {}
    v["no_force_realtime"] = dict(force_realtime=0)
    v["no_async_ba"] = dict(async_ba=0)
    v["covscore15"] = dict(nmin_covscore=15)
    v["nmaxdist45"] = dict(nmaxdist=45)
    v["r2_equiv"] = dict(force_realtime=0, nmin_covscore=15, nmaxdist=45)
    return v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--variants", type=str, default="")
    # default cache is bisect-specific AND frame-count-suffixed: sharing
    # hard_bench's directory would silently re-render + clobber it whenever
    # the frame counts differ, invalidating concurrent hard_bench runs
    ap.add_argument("--cache", type=str, default="")
    ap.add_argument("--inproc", type=str, default="")
    args = ap.parse_args()

    import hard_bench as hb

    if not args.cache:
        args.cache = f"/tmp/ov2slam_bisect_seq_{args.frames}"

    vs = variants()
    if args.inproc:
        name = args.inproc
        cfg = hb.preset_config("accurate", "stereo", **vs[name])
        L, R, gt = hb.render_cache(args.frames, args.cache)
        row = hb.run_config(name, cfg, L, R, gt)
        print(json.dumps(row), flush=True)
        return

    wanted = [x for x in args.variants.split(",") if x] or list(vs)
    rows = []
    for name in wanted:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--frames", str(args.frames), "--cache", args.cache,
             "--inproc", name],
            capture_output=True, text=True, timeout=10800)
        row = None
        for line in res.stdout.splitlines():
            if line.startswith("{") and '"config"' in line:
                row = json.loads(line)
        if row is None:
            row = {"config": name, "error": "failed",
                   "tail": res.stderr[-500:]}
        print(json.dumps(row), flush=True)
        rows.append(row)
    print("\nsummary:")
    for r in rows:
        print(f"  {r['config']:20s} ate={r.get('ate_rmse_m')} "
              f"wlc={r.get('ate_wlc_opt_m')} fps={r.get('fps')} "
              f"steady={r.get('fps_steady')} kfs={r.get('keyframes')}")


if __name__ == "__main__":
    main()
