"""At every weak frame, count map landmarks actually projectable into
the view (map frontier) vs snapshot contents vs inliers."""
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
fx, fy, cx, cy = scene.K[0,0], scene.K[1,1], scene.K[0,2], scene.K[1,2]

def frustum_count(m, R, t):
    ids = np.nonzero(m.lm_valid)[0]
    if len(ids) == 0: return (0, 0, 0)
    pc = m.lm_pos[ids] @ R.T + t
    z = pc[:, 2]
    ok = z > 0.05
    u = fx * pc[:, 0] / np.maximum(z, 1e-6) + cx
    v = fy * pc[:, 1] / np.maximum(z, 1e-6) + cy
    ok &= (u >= 0) & (u < W) & (v >= 0) & (v < H)
    cc = -R.T @ t
    d = m.lm_pos[ids] - cc
    dist = np.linalg.norm(d, axis=1)
    band = ok & (dist >= m.lm_min_dist[ids]) & (dist <= m.lm_max_dist[ids])
    cosv = np.sum(d * m.lm_normal[ids], axis=1) / np.maximum(dist, 1e-9)
    angle = band & (cosv > 0.5)
    return (int(ok.sum()), int(band.sum()), int(angle.sum()))

trace = []
orig_fin = Tracker._finish_tracked_frame
def fin(self, frame, n_in):
    if n_in < 60 and frame.R is not None:
        snap = self._dev_local
        nsnap = len(snap["ids"]) if snap else 0
        fr, band, ang = frustum_count(self.map, frame.R, frame.t)
        trace.append((frame.frame_id, n_in, fr, band, ang,
                      nsnap, self.worker.q.qsize() if self.worker else -1))
    return orig_fin(self, frame, n_in)
Tracker._finish_tracked_frame = fin

def run(paced):
    tr = Tracker(cfg)
    stamps = np.arange(n_frames) * 0.05
    t0 = time.perf_counter()
    for i in range(n_frames):
        if paced:
            dt = float(stamps[i]) - (time.perf_counter() - t0)
            if dt > 0: time.sleep(dt)
        tr.track(frames[i], float(stamps[i]))
    tr.flush_mapping()
    if tr.worker: tr.worker.stop()
    return tr

print("warm...", flush=True)
run(False)
trace.clear()
print("paced...", flush=True)
tr = run(True)
print("lost events:", tr.n_lost_events)
print("frame  inl  frustum band angle  snap  backlog")
for row in trace[:60]:
    print("%5d %4d %7d %4d %5d %5d %4d" % row)
