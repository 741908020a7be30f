import logging, numpy as np
logging.basicConfig(level=logging.DEBUG, format="%(name)s %(message)s")
for noisy in ["jax", "jax._src", "orbslam3_tpu.tracker", "orbslam3_tpu.kfdb",
              "orbslam3_tpu.native", "orbslam3_tpu.atlas"]:
    logging.getLogger(noisy).setLevel(logging.WARNING)
from orbslam3_cpp_fork_tpu.datasets import synthetic
from orbslam3_cpp_fork_tpu.ops.camera import Camera
from orbslam3_cpp_fork_tpu.ops.orb import OrbParams
from orbslam3_cpp_fork_tpu.runtime.tracker import Tracker, TrackerConfig
H, W = 480, 752
n_frames = 300
scene = synthetic.make_ring_scene(seed=7, n_points=1200, size_range=(9, 15), width=W, height=H)
Rs, ts = synthetic.circle_trajectory(n_frames=n_frames, radius=2.5, total_angle=2.3 * np.pi)
frames = [synthetic.render_frame(scene, Rs[i], ts[i]) for i in range(n_frames)]
cam = Camera.pinhole(scene.K[0, 0], scene.K[1, 1], scene.K[0, 2], scene.K[1, 2])
cfg = TrackerConfig(camera=cam, width=W, height=H, orb=OrbParams(n_features=1000),
                    enable_loop_closing=True, async_mapping=False)
tr = Tracker(cfg)
for i in range(n_frames):
    tr.track(frames[i], i * 0.05)
print("loops:", tr.loop_closer.n_loops_closed, "KFs:", tr.map.n_keyframes())
