"""Reproduce the young-map free-run loss with debug logging."""
import sys, logging, time
import numpy as np
logging.basicConfig(level=logging.DEBUG, format="%(relativeCreated)8.0f %(name)s %(message)s")
for noisy in ["jax", "jax._src", "orbslam3_tpu.kfdb"]:
    logging.getLogger(noisy).setLevel(logging.WARNING)
n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 80
from orbslam3_cpp_fork_tpu.datasets import synthetic
from orbslam3_cpp_fork_tpu.ops.camera import Camera
from orbslam3_cpp_fork_tpu.ops.orb import OrbParams
from orbslam3_cpp_fork_tpu.runtime.tracker import Tracker, TrackerConfig, TrackState
H, W = 480, 752
scene = synthetic.make_ring_scene(seed=7, n_points=1200, size_range=(9, 15), width=W, height=H)
Rs, ts = synthetic.circle_trajectory(n_frames=n_frames, radius=2.5, total_angle=2.3*np.pi*n_frames/300)
frames = [synthetic.render_frame(scene, Rs[i], ts[i]) for i in range(n_frames)]
cam = Camera.pinhole(scene.K[0,0], scene.K[1,1], scene.K[0,2], scene.K[1,2])
cfg = TrackerConfig(camera=cam, width=W, height=H, orb=OrbParams(n_features=1000),
                    enable_loop_closing=True, async_mapping=True)
for attempt in range(4):
    tr = Tracker(cfg)
    lost = False
    for i in range(n_frames):
        tr.track(frames[i], i/20.0)
        if tr.n_lost_events > 0:
            lost = True
            print(f"ATTEMPT {attempt}: loss by frame {i}", flush=True)
            break
    tr.flush_mapping(); tr.worker.stop()
    if lost:
        sys.exit(1)
    print(f"ATTEMPT {attempt}: clean ({tr.map.n_keyframes()} KFs)", flush=True)
