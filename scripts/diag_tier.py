"""Per-frame diagnostic run of one hard-bench tier: ground-truth pose error
per frame, keyframe/reset/loop events, landmark counts — for bisecting
accuracy cliffs between preset tiers (round-4 task: fast_mono 1.15 m Sim3,
accurate_stereo preset regression).

Usage:
    python scripts/diag_tier.py --tier fast_mono [--frames 1000]
                                [--set knob=value ...] [--cpu]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", type=str, required=True)
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--cache", type=str, default="/tmp/ov2slam_hard_seq")
    ap.add_argument("--set", action="append", default=[],
                    help="override knob=value (value parsed as number if possible)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", type=str, default="/tmp/diag")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    from ov2slam_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import hard_synthetic as hs
    from hard_bench import tier_configs, render_cache
    from ov2slam_tpu.config import SlamParams
    from ov2slam_tpu.slam.manager import SlamSystem
    from ov2slam_tpu.io.trajectories import ate_rmse

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
    n = int(cfg.pop("__frames__", args.frames))
    camname = cfg.pop("__cam__", "euroc")
    preset = cfg.pop("__preset__", "-")
    cam = hs.CAM_KITTI if camname == "kitti" else hs.CAM_EUROC
    suffix = "" if (camname == "euroc" and n == args.frames) else f"_{camname}_{n}"
    L, R, gt = render_cache(n, args.cache + suffix, cam)
    print(f"tier={args.tier} preset={preset} overrides={args.set}", flush=True)

    params = SlamParams.from_dict(cfg)
    slam = SlamSystem(params)
    if slam.loopcloser is not None:
        slam.loopcloser.detector.p_wait = 12
        slam.loopcloser.detector.island_size = 10
        slam.loopcloser.detector.min_score = 3.0
    mono = bool(cfg.get("mono", 0))

    events = []          # (frame, kind, payload)
    orig_reset = slam.reset
    n_resets = [0]

    def reset_hook():
        n_resets[0] += 1
        events.append((slam.frame_id, "RESET", {}))
        orig_reset()
    slam.reset = reset_hook

    kf_seen = set()
    t0 = time.time()
    per_frame = []
    for i in range(n):
        il = L[i].astype(np.float32)
        if mono:
            slam.process_mono(il, time=i * 0.05)
        else:
            slam.process_stereo(il, R[i].astype(np.float32), time=i * 0.05)
        # live (host) pose vs GT every frame — includes pipelined staleness
        T_wc = slam.T_wc()
        err = np.linalg.norm(T_wc[:3, 3] - gt[i][:3, 3])
        new_kfs = set(slam.map.keyframes) - kf_seen
        for k in sorted(new_kfs):
            events.append((i, "KF", {"kfid": k,
                                     "n3d": slam.n3d_at_kf,
                                     "nkps": slam.n_kps_at_kf}))
        kf_seen |= new_kfs
        if slam.last_loop_event is not None and not any(
                e[1] == "LOOP" and e[2]["kf"] == slam.last_loop_event.query_kf
                for e in events):
            ev = slam.last_loop_event
            events.append((i, "LOOP", {"kf": ev.query_kf, "match": ev.match_kf,
                                       "inl": ev.n_inliers,
                                       "jump": round(ev.pose_jump, 4)}))
        per_frame.append((i, err, len(slam.map.keyframes), slam.map.n_3d(),
                          slam.initialized))
    slam.flush()
    dt = time.time() - t0

    import tempfile
    out = tempfile.mkdtemp()
    slam.write_results(out)
    tr = np.loadtxt(os.path.join(out, "ov2slam_traj.txt"))
    ts = np.round(tr[:, 0] / 0.05).astype(int)
    est = np.full((n, 3), np.nan)
    est[ts[ts < n]] = tr[: (ts < n).sum(), 1:4]
    ok = np.isfinite(est).all(axis=1)
    gt_t = gt[:n, :3, 3]
    ate = ate_rmse(est[ok], gt_t[ok], with_scale=mono) if ok.sum() > 10 else float("nan")

    os.makedirs(args.out, exist_ok=True)
    np.save(os.path.join(args.out, f"{args.tier}_per_frame.npy"),
            np.asarray([(a, b, c, d, e) for a, b, c, d, e in per_frame]))
    print(json.dumps({
        "tier": args.tier, "frames": n, "fps": round(n / dt, 2),
        "ate": round(float(ate), 4),
        "n_resets": n_resets[0],
        "keyframes": len(slam.map.keyframes),
        "landmarks_3d": slam.map.n_3d(),
        "loop_closed": slam.last_loop_event is not None,
        "init_frame": next((i for i, _, _, _, init in per_frame if init), -1),
    }), flush=True)
    # event log + error percentiles over thirds of the run
    errs = np.asarray([e for _, e, _, _, _ in per_frame])
    for third in range(3):
        seg = errs[third * n // 3:(third + 1) * n // 3]
        print(f"  live |t| err third {third}: med={np.median(seg):.4f} "
              f"p90={np.percentile(seg, 90):.4f} max={seg.max():.4f}")
    for f, kind, payload in events:
        if kind != "KF" or payload.get("n3d", 999) < 60:
            print(f"  [{f:4d}] {kind} {payload}")
    n_kf_events = sum(1 for _, k, _ in events if k == "KF")
    print(f"  ({n_kf_events} KF events total)")


if __name__ == "__main__":
    main()
