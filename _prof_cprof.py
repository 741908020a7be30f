"""cProfile the sync-mode mapping-heavy run for exact host attribution."""
import sys, time, cProfile, pstats
import numpy as np
n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 120
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
pr = cProfile.Profile()
pr.enable()
for i in range(n_frames):
    tr2.track(frames[i], i / 20.0)
pr.disable()
st = pstats.Stats(pr)
st.sort_stats("cumulative").print_stats(45)
