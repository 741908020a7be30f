"""Sync-mode ablation on the bench ring: which r05 change moved sync ATE?

Usage: python _ablate_sync.py <mode> [n_frames]
modes: base | ba_cpu | no_reanchor | fixed_floor | all_r04
"""
import sys
import time

import numpy as np

mode = sys.argv[1] if len(sys.argv) > 1 else "base"
n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 300

from orbslam3_cpp_fork_tpu.datasets import synthetic
from orbslam3_cpp_fork_tpu.ops.camera import Camera
from orbslam3_cpp_fork_tpu.ops.orb import OrbParams
from orbslam3_cpp_fork_tpu.runtime.tracker import Tracker, TrackerConfig
from orbslam3_cpp_fork_tpu.utils.evaluation import ate_rmse

H, W = 480, 752
scene = synthetic.make_ring_scene(seed=7, n_points=1200, size_range=(9, 15), width=W, height=H)
Rs, ts = synthetic.circle_trajectory(n_frames=n_frames, radius=2.5, total_angle=2.3 * np.pi)
frames = [synthetic.render_frame(scene, Rs[i], ts[i]) for i in range(n_frames)]
cam = Camera.pinhole(scene.K[0, 0], scene.K[1, 1], scene.K[0, 2], scene.K[1, 2])
cfg = TrackerConfig(camera=cam, width=W, height=H, orb=OrbParams(n_features=1000),
                    enable_loop_closing=True, async_mapping=False)
if mode in ("no_reanchor", "all_r04"):
    cfg.max_record_gap = 10**9
tr = Tracker(cfg)
if mode in ("ba_cpu", "all_r04"):
    tr._ba_put = tr._mput
if mode in ("fixed_floor", "all_r04"):
    tr.kfdb.adaptive_floor = lambda *a, **k: None
stamps = np.arange(n_frames) * 0.05
t0 = time.perf_counter()
for i in range(n_frames):
    tr.track(frames[i], float(stamps[i]))
wall = time.perf_counter() - t0
ts_est, Twc = tr.export_trajectory()
res = ate_rmse(ts_est, Twc[:, :3, 3], stamps, ts)
print(f"mode={mode} ate_scaled={res.rmse_scaled:.4f} n={res.n_pairs} "
      f"loops={tr.loop_closer.n_loops_closed} kfs={tr.map.n_keyframes()} "
      f"lost={tr.n_lost_events} fps={n_frames/wall:.2f}", flush=True)
