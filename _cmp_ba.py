"""Compare one identical window-BA solve on CPU vs TPU backends."""
import numpy as np
import jax
import jax.numpy as jnp

from orbslam3_cpp_fork_tpu.datasets import synthetic
from orbslam3_cpp_fork_tpu.ops.camera import Camera
from orbslam3_cpp_fork_tpu.ops.orb import OrbParams
from orbslam3_cpp_fork_tpu.runtime.tracker import Tracker, TrackerConfig

H, W = 480, 752
n_frames = 150
scene = synthetic.make_ring_scene(seed=7, n_points=1200, size_range=(9, 15), width=W, height=H)
Rs, ts = synthetic.circle_trajectory(n_frames=n_frames, radius=2.5, total_angle=2.3 * np.pi)
frames = [synthetic.render_frame(scene, Rs[i], ts[i]) for i in range(n_frames)]
cam = Camera.pinhole(scene.K[0, 0], scene.K[1, 1], scene.K[0, 2], scene.K[1, 2])
cfg = TrackerConfig(camera=cam, width=W, height=H, orb=OrbParams(n_features=1000),
                    enable_loop_closing=False, async_mapping=False)
tr = Tracker(cfg)
tr._ba_put = tr._mput  # build the map with the accurate CPU solver
for i in range(n_frames):
    tr.track(frames[i], i * 0.05)
m = tr.map
valid = np.nonzero(m.kf_valid)[0]
k = int(valid[np.argmax(m.kf_frame_id[valid])])
neigh, _ = m.covisible_keyframes(k, min_weight=15, top=cfg.local_window_kfs)
window = [k] + [int(x) for x in neigh[: cfg.ba_kf_cap - 1]]

from orbslam3_cpp_fork_tpu.optim.local_ba import local_ba

results = {}
for tag, put in (("cpu", tr._mput), ("tpu", jnp.asarray)):
    tr._ba_put = put
    ctx = tr._local_ba_dispatch(window, iters=6)
    res, kfs, lms, _m, gen0, big0 = ctx
    R, t, X, cost = jax.device_get((res.R, res.t, res.Xw, res.cost))
    results[tag] = (np.asarray(R), np.asarray(t), np.asarray(X), float(np.asarray(cost)))
    print(f"{tag}: final cost {results[tag][3]:.6f}")

Rc, tc, Xc, cc = results["cpu"]
Rt, tt, Xt, ct = results["tpu"]
print("max |dR|:", np.abs(Rc - Rt).max())
print("max |dt|:", np.abs(tc - tt).max())
print("max |dX|:", np.abs(Xc - Xt).max())
print("rms |dt|:", np.sqrt(((tc - tt) ** 2).mean()))
print("cost cpu", cc, "tpu", ct)
