"""Per-frame inlier/staleness trace of the paced async pipeline.

Records, for every retired frame: n_inliers, frames since the device
local-map snapshot was rebuilt, worker queue depth, and state — to name
the cause of the 16-29-inlier pipeline failures (VERDICT r3 weak #3).
"""
import sys, time
import numpy as np

n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 300

from orbslam3_cpp_fork_tpu.datasets import synthetic
from orbslam3_cpp_fork_tpu.ops.camera import Camera
from orbslam3_cpp_fork_tpu.ops.orb import OrbParams
from orbslam3_cpp_fork_tpu.runtime.tracker import Tracker, TrackerConfig

H, W = 480, 752
scene = synthetic.make_ring_scene(seed=7, n_points=1200, size_range=(9, 15), width=W, height=H)
Rs, ts = synthetic.circle_trajectory(n_frames=n_frames, radius=2.5, total_angle=2.3 * np.pi)
print("rendering...", flush=True)
frames = [synthetic.render_frame(scene, Rs[i], ts[i]) for i in range(n_frames)]
cam = Camera.pinhole(scene.K[0, 0], scene.K[1, 1], scene.K[0, 2], scene.K[1, 2])
cfg = TrackerConfig(camera=cam, width=W, height=H, orb=OrbParams(n_features=1000),
                    enable_loop_closing=True, async_mapping=True)

def run(paced):
    tr = Tracker(cfg)
    trace = []
    orig_fin = Tracker._finish_tracked_frame
    snap_frame = {"f": -1, "seq": -1}
    orig_refresh = Tracker._refresh_dev_local
    def refresh(self):
        r = orig_refresh(self)
        if self._snap_seq != snap_frame["seq"]:
            snap_frame["seq"] = self._snap_seq
            snap_frame["f"] = self.frame_id
        return r
    def fin(self, frame, n_in):
        trace.append((frame.frame_id, n_in, self.frame_id - snap_frame["f"],
                      self.worker.q.qsize() if self.worker else -1,
                      len(self._pipe)))
        return orig_fin(self, frame, n_in)
    Tracker._finish_tracked_frame = fin
    Tracker._refresh_dev_local = refresh
    stamps = np.arange(n_frames) * 0.05
    t0 = time.perf_counter()
    try:
        for i in range(n_frames):
            if paced:
                dt = float(stamps[i]) - (time.perf_counter() - t0)
                if dt > 0:
                    time.sleep(dt)
            tr.track(frames[i], float(stamps[i]))
        tr.flush_mapping()
    finally:
        Tracker._finish_tracked_frame = orig_fin
        Tracker._refresh_dev_local = orig_refresh
        if tr.worker:
            tr.worker.stop()
    return tr, trace

print("warm pass...", flush=True)
run(False)
print("paced pass...", flush=True)
tr, trace = run(True)
a = np.array(trace)
print("frames:", len(a), "KFs:", tr.map.n_keyframes(),
      "lost:", tr.n_lost_events, "dropped:", tr.n_frames_dropped)
# Inlier stats bucketed by snapshot age
for age in range(0, 9):
    sel = a[:, 2] == age
    if sel.sum() > 3:
        print(f"snap_age={age}: n={sel.sum():4d} inliers med={np.median(a[sel,1]):6.1f} p10={np.percentile(a[sel,1],10):6.1f}")
lo = a[a[:, 1] < 40]
print("frames with <40 inliers:")
for row in lo[:40]:
    print(f"  frame={row[0]:4d} inl={row[1]:4d} snap_age={row[2]:3d} backlog={row[3]} pipe={row[4]}")
