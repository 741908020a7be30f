import time, logging, numpy as np
logging.basicConfig(level=logging.DEBUG, format="%(name)s %(message)s")
for noisy in ["jax", "jax._src", "orbslam3_tpu.kfdb", "orbslam3_tpu.loop",
              "orbslam3_tpu.native", "orbslam3_tpu.atlas"]:
    logging.getLogger(noisy).setLevel(logging.WARNING)
from orbslam3_cpp_fork_tpu.datasets import synthetic
from orbslam3_cpp_fork_tpu.ops.camera import Camera
from orbslam3_cpp_fork_tpu.ops.orb import OrbParams
from orbslam3_cpp_fork_tpu.runtime.tracker import Tracker, TrackerConfig
H, W = 480, 752
n_frames = 200
scene = synthetic.make_ring_scene(seed=7, n_points=1200, size_range=(9, 15), width=W, height=H)
Rs, ts = synthetic.circle_trajectory(n_frames=300, radius=2.5, total_angle=2.3 * np.pi)
frames = [synthetic.render_frame(scene, Rs[i], ts[i]) for i in range(n_frames)]
cam = Camera.pinhole(scene.K[0, 0], scene.K[1, 1], scene.K[0, 2], scene.K[1, 2])
cfg = TrackerConfig(camera=cam, width=W, height=H, orb=OrbParams(n_features=1000),
                    enable_loop_closing=True, async_mapping=False)
tr = Tracker(cfg)
logging.disable(logging.DEBUG)
for i in range(120):
    tr.track(frames[i], i * 0.05)
logging.disable(logging.NOTSET)
for i in range(120, n_frames):
    tr.track(frames[i], i * 0.05)
