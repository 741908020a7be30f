"""Async-mode ablation: where does the async ATE gap come from?

modes (comma-separated; each runs on a fresh tracker in ONE process,
after a shared warm pass so jit compiles never contaminate the timing):
  full         - shipping config (worker + pipelined tracking, lag 2)
  lag1         - shipping config with pipeline_lag=1
  nopipe       - worker thread, but frame-synchronous tracking (lag 0)
  drain        - pipelined lag 2, worker queue drained before every
                 frame (zero-staleness mapping; isolates pipelining-lag
                 effects + threading bugs from map-staleness cost)
  lag1_drain   - pipelined lag 1 + drained worker
  nopipe_drain - async worker drained each frame, no pipelining

Usage: python _ablate_async.py <modes> [n_frames] [paced|free] [nowarm]
"""
import sys
import time

import numpy as np

modes = (sys.argv[1] if len(sys.argv) > 1 else "full").split(",")
n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 300
paced = len(sys.argv) > 3 and sys.argv[3] == "paced"
warm = not (len(sys.argv) > 4 and sys.argv[4] == "nowarm")

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


def run(mode, timed=True):
    import os

    cfg = TrackerConfig(camera=cam, width=W, height=H, orb=OrbParams(n_features=1000),
                        enable_loop_closing=True, async_mapping=True)
    if "ABL_WAIT_MS" in os.environ:  # map_wait_budget_ms sweep knob
        cfg.map_wait_budget_ms = float(os.environ["ABL_WAIT_MS"])
    if mode in ("nopipe", "nopipe_drain"):
        cfg.pipeline_lag = 0
    if mode in ("lag1", "lag1_drain"):
        cfg.pipeline_lag = 1
    tr = Tracker(cfg)
    stamps = np.arange(n_frames) * 0.05
    lat = np.zeros(n_frames)
    t0 = time.perf_counter()
    for i in range(n_frames):
        if mode in ("drain", "nopipe_drain", "lag1_drain"):
            tr.worker.flush()
        if paced and timed:
            dt = float(stamps[i]) - (time.perf_counter() - t0)
            if dt > 0:
                time.sleep(dt)
        t1 = time.perf_counter()
        tr.track(frames[i], float(stamps[i]))
        lat[i] = time.perf_counter() - t1
    t_track = time.perf_counter() - t0
    tr.flush_mapping()
    ts_est, Twc = tr.export_trajectory()
    res = ate_rmse(ts_est, Twc[:, :3, 3], stamps, ts)
    kf_ate = float("nan")
    m = tr.map
    valid = np.nonzero(m.kf_valid)[0]
    if len(valid) >= 4:
        from orbslam3_cpp_fork_tpu.utils.evaluation import align_umeyama
        centers = -np.einsum("kji,kj->ki", m.kf_R[valid], m.kf_t[valid])
        gt_kf = ts[np.clip(m.kf_frame_id[valid], 0, len(frames) - 1)]
        s_a, R_a, t_a = align_umeyama(centers, gt_kf, with_scale=True)
        resid = np.linalg.norm((s_a * centers @ R_a.T + t_a) - gt_kf, axis=1)
        kf_ate = float(np.sqrt((resid ** 2).mean()))
    if timed:
        print(f"mode={mode} paced={paced} ate={res.rmse_scaled:.4f} kf_ate={kf_ate:.4f} "
              f"n={res.n_pairs} loops={tr.loop_closer.n_loops_closed} "
              f"kfs={m.n_keyframes()} lost={tr.n_lost_events} "
              f"dropped={tr.n_frames_dropped} fps={n_frames/t_track:.2f} "
              f"med={np.median(lat)*1e3:.1f}ms p99={np.quantile(lat,0.99)*1e3:.0f}ms", flush=True)
    if tr.worker is not None:
        tr.worker.stop()


if warm:
    print("warm pass...", flush=True)
    wcfg = TrackerConfig(camera=cam, width=W, height=H,
                         orb=OrbParams(n_features=1000), async_mapping=False)
    _w = Tracker(wcfg)
    _w.warm_mapping_programs()  # BA buckets + pose-graph buckets
    run(modes[0], timed=False)
for mode in modes:
    run(mode)
