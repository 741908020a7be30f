"""Mapping stage timers without blocking wrappers (sync mode)."""
import sys, time
import numpy as np
n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 150
from orbslam3_cpp_fork_tpu.datasets import synthetic
from orbslam3_cpp_fork_tpu.ops.camera import Camera
from orbslam3_cpp_fork_tpu.ops.orb import OrbParams
from orbslam3_cpp_fork_tpu.runtime.tracker import Tracker, TrackerConfig
H, W = 480, 752
scene = synthetic.make_ring_scene(seed=7, n_points=1200, size_range=(9, 15), width=W, height=H)
Rs, ts = synthetic.circle_trajectory(n_frames=n_frames, radius=2.5, total_angle=2.3 * np.pi)
frames = [synthetic.render_frame(scene, Rs[i], ts[i]) for i in range(n_frames)]
cam = Camera.pinhole(scene.K[0, 0], scene.K[1, 1], scene.K[0, 2], scene.K[1, 2])
cfg = TrackerConfig(camera=cam, width=W, height=H, orb=OrbParams(n_features=1000),
                    enable_loop_closing=True, async_mapping=False)
tr = Tracker(cfg)
for i in range(n_frames):
    tr.track(frames[i], i / 20.0)
tr2 = Tracker(cfg)
import collections
step_t = []
orig = Tracker._mapping_step
def wrapped(self, *a, **kw):
    t0 = time.perf_counter(); r = orig(self, *a, **kw)
    step_t.append(time.perf_counter() - t0); return r
Tracker._mapping_step = wrapped
t0 = time.perf_counter()
for i in range(n_frames):
    tr2.track(frames[i], i / 20.0)
t_all = time.perf_counter() - t0
print(f"total {t_all:.1f}s, {n_frames/t_all:.2f} fps, KFs={tr2.map.n_keyframes()}")
a = np.array(step_t) * 1e3
print(f"mapping_step n={len(a)} med={np.median(a):.1f} p90={np.percentile(a,90):.1f} max={a.max():.1f}")
for name, s in tr2.timers.summary().items():
    print(f"{name:28s} n={s["count"]:4d} mean={s["mean_ms"]:7.2f} p95={s["p95_ms"]:8.2f}")
