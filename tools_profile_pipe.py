"""Per-frame latency attribution for the PIPELINED tracking path.

tools_profile_e2e.py instruments the frame-synchronous path; the
shipping mode is software-pipelined, where per-frame wall time =
snapshot refresh + program dispatch + retirement (fetch wait + numpy)
+ keyframe insertion. This tool wraps those four and prints the
decomposition, split by sequence half (the inlier decay and the
latency tail both live in the revisit half).

Usage: python tools_profile_pipe.py [n_frames] [paced|free]
"""

import sys
import time

import numpy as np


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    paced = (sys.argv[2] if len(sys.argv) > 2 else "paced") == "paced"

    from orbslam3_cpp_fork_tpu.datasets import synthetic
    from orbslam3_cpp_fork_tpu.ops.camera import Camera
    from orbslam3_cpp_fork_tpu.ops.orb import OrbParams
    from orbslam3_cpp_fork_tpu.runtime.tracker import Tracker, TrackerConfig

    H, W = 480, 752
    scene = synthetic.make_ring_scene(
        seed=7, n_points=1200, size_range=(9, 15), width=W, height=H
    )
    Rs, ts = synthetic.circle_trajectory(
        n_frames=n_frames, radius=2.5, total_angle=2.3 * np.pi
    )
    print("rendering...", flush=True)
    frames = [synthetic.render_frame(scene, Rs[i], ts[i]) for i in range(n_frames)]
    cam = Camera.pinhole(scene.K[0, 0], scene.K[1, 1], scene.K[0, 2], scene.K[1, 2])
    cfg = TrackerConfig(
        camera=cam, width=W, height=H, orb=OrbParams(n_features=1000),
        enable_loop_closing=True, async_mapping=True,
    )

    per = []  # dict per frame

    def wrap(name, orig):
        def f(self, *a, **kw):
            t0 = time.perf_counter()
            r = orig(self, *a, **kw)
            per[-1][name] = per[-1].get(name, 0.0) + time.perf_counter() - t0
            per[-1][name + "_n"] = per[-1].get(name + "_n", 0) + 1
            return r
        return f

    Tracker._refresh_dev_local = wrap("refresh", Tracker._refresh_dev_local)
    Tracker._retire_oldest = wrap("retire", Tracker._retire_oldest)
    Tracker._insert_keyframe = wrap("insert", Tracker._insert_keyframe)
    Tracker._track_frame_slow = wrap("slow", Tracker._track_frame_slow)
    Tracker._ensure_feats = wrap("extract", Tracker._ensure_feats)

    def run():
        tr = Tracker(cfg)
        stamps = np.arange(n_frames) * 0.05
        lat = np.zeros(n_frames)
        t_start = time.perf_counter()
        for i, img in enumerate(frames):
            per.append({})
            if paced:
                dt = float(stamps[i]) - (time.perf_counter() - t_start)
                if dt > 0:
                    time.sleep(dt)
            t0 = time.perf_counter()
            tr.track(img, float(stamps[i]))
            lat[i] = time.perf_counter() - t0
            per[-1]["total"] = lat[i]
        t_track = time.perf_counter() - t_start
        tr.flush_mapping()
        return tr, lat, t_track

    print("warm pass...", flush=True)
    tr, _, tw = run()
    if tr.worker is not None:
        tr.worker.stop()
    print(f"warm {tw:.1f}s; timed pass...", flush=True)
    per.clear()
    tr, lat, t_track = run()

    print(f"\nfps {n_frames/t_track:.2f}  median {np.median(lat)*1e3:.1f} ms  "
          f"p90 {np.percentile(lat,90)*1e3:.1f}  p99 {np.percentile(lat,99)*1e3:.1f}")
    print(f"lost={tr.n_lost_events} dropped={tr.n_frames_dropped} "
          f"kfs={tr.map.n_keyframes()} sync_frames={tr.n_sync_frames}")
    keys = ["refresh", "retire", "insert", "slow", "extract"]
    for half, lo, hi in (("first", 0, n_frames // 2), ("second", n_frames // 2, n_frames)):
        sel = per[lo:hi]
        tot = np.array([p.get("total", 0) for p in sel])
        print(f"-- {half} half: mean total {tot.mean()*1e3:.1f} ms")
        for k in keys:
            v = np.array([p.get(k, 0.0) for p in sel])
            n = sum(p.get(k + "_n", 0) for p in sel)
            if n:
                print(f"   {k:8s} n={n:4d} mean(when present)="
                      f"{v[v>0].mean()*1e3 if (v>0).any() else 0:7.1f} ms "
                      f"  share={v.sum()/max(tot.sum(),1e-9)*100:5.1f}%")
        unacc = tot.sum() - sum(
            np.array([p.get(k, 0.0) for p in sel]).sum() for k in keys
        )
        print(f"   unattributed share={unacc/max(tot.sum(),1e-9)*100:5.1f}%")
    worst = np.argsort(-lat)[:10]
    print("worst frames:")
    for i in worst:
        p = per[i]
        parts = " ".join(
            f"{k}={p[k]*1e3:.0f}" for k in keys if p.get(k, 0) > 0.001
        )
        print(f"  f{i}: {lat[i]*1e3:.0f} ms  {parts}  causes={tr.frame_causes.get(int(i), [])}")
    if tr.worker is not None:
        tr.worker.stop()


if __name__ == "__main__":
    main()
