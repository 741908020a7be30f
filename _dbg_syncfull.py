import time, numpy as np
from orbslam3_cpp_fork_tpu.datasets import synthetic
from orbslam3_cpp_fork_tpu.ops.camera import Camera
from orbslam3_cpp_fork_tpu.ops.orb import OrbParams
from orbslam3_cpp_fork_tpu.runtime.tracker import Tracker, TrackerConfig
from orbslam3_cpp_fork_tpu.utils.evaluation import ate_rmse
H, W = 480, 752
n_frames = 300
scene = synthetic.make_ring_scene(seed=7, n_points=1200, size_range=(9, 15), width=W, height=H)
Rs, ts = synthetic.circle_trajectory(n_frames=n_frames, radius=2.5, total_angle=2.3 * np.pi)
frames = [synthetic.render_frame(scene, Rs[i], ts[i]) for i in range(n_frames)]
cam = Camera.pinhole(scene.K[0, 0], scene.K[1, 1], scene.K[0, 2], scene.K[1, 2])
cfg = TrackerConfig(camera=cam, width=W, height=H, orb=OrbParams(n_features=1000),
                    enable_loop_closing=True, async_mapping=False)
tr = Tracker(cfg)
stamps = np.arange(n_frames) * 0.05
inl = []
orig = Tracker._finish_tracked_frame
def fin(self, frame, n_in):
    inl.append((frame.frame_id, n_in))
    return orig(self, frame, n_in)
Tracker._finish_tracked_frame = fin
for i in range(n_frames):
    tr.track(frames[i], float(stamps[i]))
ts_est, Twc = tr.export_trajectory()
res = ate_rmse(np.asarray(ts_est), Twc[:, :3, 3], stamps, ts)
print(f"sync full: {len(ts_est)}/300 frames, {tr.map.n_keyframes()} KFs, "
      f"lost={tr.n_lost_events}, loops={tr.loop_closer.n_loops_closed}, "
      f"ATE_scaled={res.rmse_scaled:.4f}")
a = np.array(inl)
for lo in range(0, 300, 30):
    sel = (a[:,0] >= lo) & (a[:,0] < lo+30)
    if sel.any():
        print(f"frames {lo:3d}-{lo+29:3d}: inliers med={np.median(a[sel,1]):5.0f} min={a[sel,1].min():4.0f}")
