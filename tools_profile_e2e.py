"""Decompose per-frame e2e tracking latency on the real device.

Runs the bench scene through the full runtime and attributes per-frame
wall time to: extract dispatch, fused dispatch, result fetch, host
bookkeeping; counts fused vs slow-path frames, local-map snapshot
refreshes, and KF-insertion materialize fetches. This is the
measurement VERDICT.md round-3 item 1 asks for before optimizing.

Usage: python tools_profile_e2e.py [n_frames] [sync|async]
"""

import sys
import time

import numpy as np


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    mode = sys.argv[2] if len(sys.argv) > 2 else "async"

    from orbslam3_cpp_fork_tpu.datasets import synthetic
    from orbslam3_cpp_fork_tpu.ops.camera import Camera
    from orbslam3_cpp_fork_tpu.ops.orb import OrbParams
    from orbslam3_cpp_fork_tpu.runtime import tracker as trk
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

    # --- instrument the tracker ------------------------------------------
    stats = {
        "fused_ok": 0, "fused_fail": 0, "slow": 0, "refresh": 0,
        "insert_kf": 0,
    }
    per_frame = []  # (total, extract, fused_call, decision)

    orig_fused = Tracker._track_frame_fused
    orig_slow = Tracker._track_frame_slow
    orig_refresh = Tracker._refresh_dev_local
    orig_insert = Tracker._insert_keyframe
    orig_extract = Tracker._extract

    def extract(self, img, ts_):
        t0 = time.perf_counter()
        r = orig_extract(self, img, ts_)
        per_frame[-1]["extract"] = time.perf_counter() - t0
        return r

    def fused(self, frame):
        t0 = time.perf_counter()
        ok = orig_fused(self, frame)
        per_frame[-1]["fused"] = time.perf_counter() - t0
        stats["fused_ok" if ok else "fused_fail"] += 1
        return ok

    def slow(self, frame):
        t0 = time.perf_counter()
        r = orig_slow(self, frame)
        per_frame[-1]["slow"] = time.perf_counter() - t0
        stats["slow"] += 1
        return r

    def refresh(self):
        ver = self._local_map_version()
        c = self._dev_local
        fresh = not (c is not None and c["ver"] == ver)
        if fresh:
            stats["refresh"] += 1
            t0 = time.perf_counter()
            r = orig_refresh(self)
            per_frame[-1]["refresh"] = time.perf_counter() - t0
            return r
        return orig_refresh(self)

    def insert(self, frame):
        stats["insert_kf"] += 1
        t0 = time.perf_counter()
        r = orig_insert(self, frame)
        per_frame[-1]["insert"] = time.perf_counter() - t0
        return r

    orig_finish = Tracker._finish_tracked_frame

    def finish(self, frame, n_in):
        if not hasattr(self, "_nin_trace"):
            self._nin_trace = []
        self._nin_trace.append((frame.frame_id, n_in))
        return orig_finish(self, frame, n_in)

    Tracker._finish_tracked_frame = finish

    Tracker._track_frame_fused = fused
    Tracker._track_frame_slow = slow
    Tracker._refresh_dev_local = refresh
    Tracker._insert_keyframe = insert
    Tracker._extract = extract

    cfg = TrackerConfig(
        camera=cam, width=W, height=H, orb=OrbParams(n_features=1000),
        enable_loop_closing=True, async_mapping=(mode == "async"),
    )
    # warm: run the full sequence once untimed
    print("warm pass...", flush=True)
    t0 = time.perf_counter()
    tr = Tracker(cfg)
    for i, img in enumerate(frames):
        per_frame.append({})
        tr.track(img, i * 0.05)
    tr.flush_mapping()
    print(f"warm pass {time.perf_counter()-t0:.1f}s", flush=True)

    for k in stats:
        stats[k] = 0
    per_frame.clear()

    tr = Tracker(cfg)
    lat = []
    t_host = []
    for i, img in enumerate(frames):
        per_frame.append({})
        t0 = time.perf_counter()
        tr.track(img, i * 0.05)
        dt = time.perf_counter() - t0
        lat.append(dt)
        per_frame[-1]["total"] = dt
    tr.flush_mapping()

    lat = np.array(lat[5:])
    print(f"\nmode={mode} n={len(lat)}")
    print(f"median {np.median(lat)*1e3:.1f} ms  p90 {np.percentile(lat,90)*1e3:.1f}"
          f"  p99 {np.percentile(lat,99)*1e3:.1f}  fps {1/np.mean(lat):.2f}")
    print("stats:", stats)
    print("state:", tr.state, "kfs:", tr.map.n_keyframes(),
          "maps:", len(tr.atlas.maps))

    # attribute: mean per present key
    keys = ["extract", "fused", "slow", "refresh", "insert"]
    for k in keys:
        vals = [p[k] for p in per_frame[5:] if k in p]
        if vals:
            print(f"  {k:10s} n={len(vals):4d} mean={np.mean(vals)*1e3:7.1f} ms"
                  f" max={np.max(vals)*1e3:7.1f} ms total={np.sum(vals):6.2f} s")
    # worst frames
    order = np.argsort([-p.get("total", 0) for p in per_frame])
    print("worst frames:")
    for i in order[:8]:
        p = per_frame[i]
        print(f"  frame {i}: " + " ".join(
            f"{k}={v*1e3:.0f}ms" for k, v in p.items()))
    print("stage timers:")
    for name, s in sorted(tr.timers.summary().items()):
        print(f"  {name:16s} n={s['count']:4d} mean={s['mean_ms']:7.1f} "
              f"p50={s['p50_ms']:7.1f}")
    print("inlier trace:", getattr(tr, "_nin_trace", None))


if __name__ == "__main__":
    main()
