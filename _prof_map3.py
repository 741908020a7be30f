"""Fine-grained mapping-stage attribution (sync mode, no contention).

Wraps the host/device sub-operations inside each mapping stage so the
101/94/103/57 ms stage means from BENCH get named causes:
host prep vs store upload vs device dispatch+fetch vs host apply.
"""
import sys, time, collections
import numpy as np

n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 150

from orbslam3_cpp_fork_tpu.datasets import synthetic
from orbslam3_cpp_fork_tpu.ops.camera import Camera
from orbslam3_cpp_fork_tpu.ops.orb import OrbParams
from orbslam3_cpp_fork_tpu.runtime.tracker import Tracker, TrackerConfig, DeviceKFStore
import orbslam3_cpp_fork_tpu.runtime.tracker as trk
import orbslam3_cpp_fork_tpu.runtime.loop_closing as lc
from orbslam3_cpp_fork_tpu.models.map_state import MapState
from orbslam3_cpp_fork_tpu.runtime.keyframe_database import KeyFrameDatabase
import jax

sub = collections.defaultdict(list)

def wrap(obj, name, key=None):
    orig = getattr(obj, name)
    k = key or f"{getattr(obj, '__name__', obj.__class__.__name__)}.{name}"
    def f(*a, **kw):
        t0 = time.perf_counter()
        r = orig(*a, **kw)
        sub[k].append(time.perf_counter() - t0)
        return r
    setattr(obj, name, f)
    return orig

# stage level
for n in ["_triangulate_new_batch", "_search_in_neighbors", "_local_ba",
          "_cull_landmarks", "_cull_keyframes", "_mapping_step",
          "_apply_fuse_matches", "_insert_keyframe"]:
    wrap(Tracker, n)
# sub-ops
wrap(DeviceKFStore, "sync", key="kf_store.sync")
wrap(MapState, "add_landmarks")
wrap(MapState, "add_observation")
wrap(MapState, "update_landmark_stats")
wrap(MapState, "covisible_keyframes")
wrap(MapState, "local_map_landmarks")
wrap(KeyFrameDatabase, "histogram", key="kfdb.histogram")
wrap(KeyFrameDatabase, "add", key="kfdb.add")
wrap(KeyFrameDatabase, "query_groups", key="kfdb.query_groups")
wrap(lc.LoopCloser, "process_keyframe", key="loop.process_keyframe")
wrap(lc.LoopCloser, "_validate_candidate", key="loop.validate")
wrap(lc.LoopCloser, "_kf_bits", key="loop.kf_bits")

# device-call level: wrap module-level jitted fns used by tracker
import orbslam3_cpp_fork_tpu.optim.local_ba as lba
wrap(lba, "local_ba", key="dev:local_ba_call")
_ftb = trk.fused_triangulate_batch
def ftb(*a, **kw):
    t0 = time.perf_counter(); r = _ftb(*a, **kw)
    jax.block_until_ready(r)
    sub["dev:fused_triangulate"].append(time.perf_counter() - t0)
    return r
trk.fused_triangulate_batch = ftb
_ffb = trk.fused_fuse_batch
def ffb(*a, **kw):
    t0 = time.perf_counter(); r = _ffb(*a, **kw)
    jax.block_until_ready(r)
    sub["dev:fused_fuse"].append(time.perf_counter() - t0)
    return r
trk.fused_fuse_batch = ffb

H, W = 480, 752
scene = synthetic.make_ring_scene(seed=7, n_points=1200, size_range=(9, 15), width=W, height=H)
Rs, ts = synthetic.circle_trajectory(n_frames=n_frames, radius=2.5, total_angle=2.3 * np.pi)
print("rendering...", flush=True)
frames = [synthetic.render_frame(scene, Rs[i], ts[i]) for i in range(n_frames)]
cam = Camera.pinhole(scene.K[0, 0], scene.K[1, 1], scene.K[0, 2], scene.K[1, 2])

from orbslam3_cpp_fork_tpu.runtime.tracker import measure_device_rtt
print(f"device RTT: {measure_device_rtt():.2f} ms", flush=True)

cfg = TrackerConfig(camera=cam, width=W, height=H,
                    orb=OrbParams(n_features=1000),
                    enable_loop_closing=True, async_mapping=False)
tr = Tracker(cfg)
# warm
for i in range(n_frames):
    tr.track(frames[i], i / 20.0)
sub.clear()
tr2 = Tracker(cfg)
t_all0 = time.perf_counter()
for i in range(n_frames):
    tr2.track(frames[i], i / 20.0)
t_all = time.perf_counter() - t_all0
print(f"total {t_all:.1f}s, {n_frames / t_all:.2f} fps, KFs={tr2.map.n_keyframes()}")

for k, v in sorted(sub.items(), key=lambda kv: -sum(kv[1])):
    a = np.array(v) * 1e3
    print(f"{k:32s} n={len(a):5d} med={np.median(a):7.1f} p90={np.percentile(a,90):7.1f} max={a.max():7.1f} sum={a.sum()/1e3:6.2f}s")
