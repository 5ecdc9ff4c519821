"""Stage-level wall-clock profile of one hard-bench tier.

Runs N frames of a tier with the Profiler enabled and prints:
  - the labeled-scope summary (count, mean, total) sorted by total time
  - per-frame latency percentiles, split into KF-event frames vs cruise
  - a wall-clock reconciliation: total run time vs sum of top-level scopes

This is the tool VERDICT r4 asked for ("profile which stage blocks") —
the reference's analogue is its per-frame Profiler table gated on
log_timings (include/profiler.hpp:199-224).

Usage:
    python scripts/profile_tier.py --tier accurate_stereo --frames 400
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", type=str, default="accurate_stereo")
    ap.add_argument("--frames", type=int, default=400)
    ap.add_argument("--cache", type=str, default="/tmp/ov2slam_hard_seq")
    ap.add_argument("--seq-frames", type=int, default=1000,
                    help="cached sequence length (must match hard_bench)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--log-compiles", action="store_true")
    ap.add_argument("--set", action="append", default=[])
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.log_compiles:
        import jax
        import logging
        jax.config.update("jax_log_compiles", True)
        logging.basicConfig(level=logging.WARNING, format="%(asctime)s %(message)s")
        logging.getLogger("jax._src.interpreters.pxla").setLevel(logging.DEBUG)
        logging.getLogger("jax._src.dispatch").setLevel(logging.DEBUG)

    from ov2slam_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from hard_bench import tier_configs, render_cache, synth_cam, WARMUP_FRAMES
    from ov2slam_tpu.config import SlamParams
    from ov2slam_tpu.slam.manager import SlamSystem

    cfg = tier_configs()[args.tier]
    for kv in args.set:
        k, v = kv.split("=", 1)
        try:
            v = int(v)
        except ValueError:
            try:
                v = float(v)
            except ValueError:
                pass
        cfg[k] = v
    nseq = int(cfg.pop("__frames__", args.seq_frames))
    camname = cfg.pop("__cam__", "euroc")
    traj = cfg.pop("__traj__", "loop")
    dist = tuple(cfg.pop("__dist__", (-0.28, 0.07)))
    cfg.pop("__preset__", None)
    cfg.pop("__stock_lc__", None)
    cam = synth_cam(camname)
    suffix = "" if (camname == "euroc" and nseq == args.seq_frames
                    and traj == "loop") else \
        f"_{camname}_{nseq}" + ("" if traj == "loop" else f"_{traj}")
    L, R, gt = render_cache(nseq, args.cache + suffix, cam, traj=traj,
                            dist=dist)
    n = min(args.frames, nseq)

    cfg["log_timings"] = 1
    params = SlamParams.from_dict(cfg)
    slam = SlamSystem(params)
    if slam.loopcloser is not None:
        slam.loopcloser.detector.p_wait = 12
        slam.loopcloser.detector.island_size = 10
        slam.loopcloser.detector.min_score = 3.0
    mono = bool(cfg.get("mono", 0))

    frame_ms = np.zeros(n)
    kf_count_at = np.zeros(n, np.int32)
    t0 = time.time()
    for i in range(n):
        il = L[i].astype(np.float32)
        tf = time.perf_counter()
        if mono:
            slam.process_mono(il, time=i * 0.05)
        else:
            slam.process_stereo(il, R[i].astype(np.float32), time=i * 0.05)
        frame_ms[i] = (time.perf_counter() - tf) * 1e3
        kf_count_at[i] = len(slam.map.keyframes)
    wall = time.time() - t0

    prof = slam.prof
    print(f"\n== tier={args.tier} frames={n} wall={wall:.1f}s "
          f"fps={n / wall:.2f} kfs={len(slam.map.keyframes)} "
          f"lm3d={slam.map.n_3d()} ==")
    w = max(n - WARMUP_FRAMES, 1)
    steady = frame_ms[WARMUP_FRAMES:] if n > WARMUP_FRAMES else frame_ms
    print(f"steady fps={w / (steady.sum() / 1e3):.2f}  "
          f"p50={np.percentile(steady, 50):.1f} "
          f"p90={np.percentile(steady, 90):.1f} "
          f"p99={np.percentile(steady, 99):.1f} "
          f"max={steady.max():.1f} ms")

    # frames where the KF pipeline did real work vs cruise frames
    kf_frames = np.zeros(n, bool)
    kf_frames[1:] = np.diff(kf_count_at) > 0
    sk = steady[kf_frames[WARMUP_FRAMES:]] if n > WARMUP_FRAMES else None
    sc = steady[~kf_frames[WARMUP_FRAMES:]] if n > WARMUP_FRAMES else None
    if sk is not None and len(sk):
        print(f"KF-commit frames ({len(sk)}): p50={np.percentile(sk, 50):.1f} "
              f"max={sk.max():.1f} ms | cruise ({len(sc)}): "
              f"p50={np.percentile(sc, 50):.1f} p99={np.percentile(sc, 99):.1f}")

    rows = []
    for label, st in prof.timers.items():
        rows.append((st.n * st.mean, label, st.n, st.mean, st.vmax))
    rows.sort(reverse=True)
    print(f"\n{'label':<34}{'count':>7}{'mean_ms':>9}{'max_ms':>9}"
          f"{'total_s':>9}{'%wall':>7}")
    for total, label, cnt, mean, vmax in rows:
        print(f"{label:<34}{cnt:>7}{mean:>9.2f}{vmax:>9.2f}"
              f"{total / 1e3:>9.2f}{100 * total / 1e3 / wall:>6.1f}%")


if __name__ == "__main__":
    main()
