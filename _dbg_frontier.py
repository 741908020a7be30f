"""INFO-logged paced run around the failure to see triangulation supply,
culling pressure, and landmark counts."""
import sys, time, logging
import numpy as np
logging.basicConfig(level=logging.INFO, format="%(relativeCreated)8.0f %(name)s %(message)s")
for noisy in ["jax", "jax._src"]:
    logging.getLogger(noisy).setLevel(logging.WARNING)
n_frames = 300
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
                    enable_loop_closing=True, async_mapping=True)
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
logging.disable(logging.INFO)
run(False)
logging.disable(logging.NOTSET)
print("== paced ==", flush=True)
run(True)
