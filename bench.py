"""Benchmark: end-to-end SLAM throughput on one real TPU chip.

Primary metric (the number the reference's real-time claim is about):
frames/s through the FULL runtime — ORB extraction, projection
matching, pose optimization, keyframe policy, and the mapping pipeline
(triangulation, fusion, culling, local BA, loop closing) running on the
background stage — over a 300-frame synthetic ring sequence at
EuRoC-like workload (752x480, 1000 features), with the per-frame track
latency distribution reported alongside. The sequence revisits its
start so loop closing + global BA run inside the measured window.

Secondary metric: the fused tracking-step kernel fps (extract -> match
-> pose-opt as one XLA program) — the round-1 number, kept for
continuity.

Compile amortization: the whole sequence is run once untimed (warms
every jitted program: extractor, matchers, BA shapes, pose graph), then
a fresh tracker runs it timed; jit caches are process-global.

Baseline: the reference is a real-time CPU system paced at the EuRoC
camera rate of 20 fps (BASELINE.md; Examples/Monocular/mono_euroc.cc
sleeps to dataset timestamps) — vs_baseline = e2e fps / 20.

Prints exactly one JSON line on stdout.
"""

import json
import time

import numpy as np


def _render_sequence(n_frames):
    from orbslam3_cpp_fork_tpu.datasets import synthetic

    H, W = 480, 752
    scene = synthetic.make_ring_scene(
        seed=7, n_points=1200, size_range=(9, 15), width=W, height=H
    )
    Rs, ts = synthetic.circle_trajectory(
        n_frames=n_frames, radius=2.5, total_angle=2.3 * np.pi
    )
    frames = [
        synthetic.render_frame(scene, Rs[i], ts[i]) for i in range(n_frames)
    ]
    return scene, frames, Rs, ts


def _run_slam(scene, frames, async_mapping=True, paced=False):
    """Run the full pipeline over the sequence.

    paced=True reproduces the reference's operating mode: frames are
    DELIVERED at the camera rate (the examples sleep to dataset
    timestamps, Examples/Monocular/mono_euroc.cc:168-176) and the
    system must keep up — the real-time claim is about consuming a
    20 fps stream without falling behind, not about unbounded
    free-running throughput. paced=False free-runs (throughput mode).
    """
    from orbslam3_cpp_fork_tpu.ops.camera import Camera
    from orbslam3_cpp_fork_tpu.ops.orb import OrbParams
    from orbslam3_cpp_fork_tpu.runtime.tracker import Tracker, TrackerConfig

    cam = Camera.pinhole(
        scene.K[0, 0], scene.K[1, 1], scene.K[0, 2], scene.K[1, 2]
    )
    cfg = TrackerConfig(
        camera=cam, width=scene.width, height=scene.height,
        orb=OrbParams(n_features=1000),
        enable_loop_closing=True,
        async_mapping=async_mapping,
    )
    tracker = Tracker(cfg)
    stamps = np.arange(len(frames)) * 0.05
    lat = np.zeros(len(frames))
    t_start = time.perf_counter()
    for i, img in enumerate(frames):
        if paced:
            # Sleep to the frame's timestamp (the reference's pacing);
            # a system that fell behind gets no sleep and the lateness
            # shows up in the latency distribution.
            dt = float(stamps[i]) - (time.perf_counter() - t_start)
            if dt > 0:
                time.sleep(dt)
        t0 = time.perf_counter()
        tracker.track(img, float(stamps[i]))
        lat[i] = time.perf_counter() - t0
    t_track = time.perf_counter() - t_start
    tracker.flush_mapping()  # pipeline + mapping drain
    wall = time.perf_counter() - t_start
    return tracker, lat, stamps, t_track, wall


def _kernel_fps(scene, frames):
    """Round-1 fused-step kernel throughput (single static frame)."""
    import jax
    import jax.numpy as jnp

    from orbslam3_cpp_fork_tpu.ops.orb import OrbParams, extract_orb_jit
    from orbslam3_cpp_fork_tpu.runtime.device_step import fused_track_step

    H, W = scene.height, scene.width
    fx, fy = float(scene.K[0, 0]), float(scene.K[1, 1])
    cx, cy = float(scene.K[0, 2]), float(scene.K[1, 2])
    img = jnp.asarray(frames[0])
    p = OrbParams(n_features=1000)
    feats0 = extract_orb_jit(img, p)
    xy0 = np.asarray(feats0.xy)
    bits0 = np.asarray(feats0.desc_i8)
    valid0 = np.asarray(feats0.valid)
    L = 2048
    rng = np.random.default_rng(0)
    z = rng.uniform(4.0, 9.0, L).astype(np.float32)
    vi = np.nonzero(valid0)[0]
    src = vi[rng.integers(0, len(vi), L)]
    pos = np.stack(
        [(xy0[src, 0] - cx) / fx * z, (xy0[src, 1] - cy) / fy * z, z], 1
    )
    args = (
        jnp.asarray(pos),
        jnp.asarray(pos / np.linalg.norm(pos, axis=1, keepdims=True)),
        jnp.full((L,), 0.1, jnp.float32),
        jnp.full((L,), 100.0, jnp.float32),
        jnp.asarray(bits0[src]),
        jnp.ones((L,), bool),
    )

    def step(img, R, t):
        feats, R2, t2, idx, mok, inl, n_in = fused_track_step(
            img, R, t, *args, fx, fy, cx, cy, float(W), float(H), orb_params=p
        )
        return R2, t2, n_in

    step_j = jax.jit(step)
    R = jnp.eye(3, dtype=jnp.float32)
    t = jnp.zeros(3, jnp.float32)
    out = step_j(img, R, t)
    int(out[2])  # warm + drain
    n_iter = 50
    t0 = time.perf_counter()
    R2, t2 = R, t
    for _ in range(n_iter):
        R2, t2, n_in = step_j(img, R2, t2)
    int(n_in)  # forced fetch: drains the chain
    return n_iter / (time.perf_counter() - t0)


def _traj_ate(tracker, stamps, ts, n_frames):
    """Exported-trajectory ATE + coverage for one finished run."""
    from orbslam3_cpp_fork_tpu.utils.evaluation import ate_rmse

    ts_est, Twc = tracker.export_trajectory()
    coverage = len(ts_est) / n_frames
    try:
        ate = ate_rmse(ts_est, Twc[:, :3, 3], stamps, ts)
    except Exception:
        ate = None
    return ate, coverage


def _max_record_gap(tracker):
    """Largest frame gap any exported relative record spans (VERDICT r4
    item 3: must stay <= max_record_gap after re-anchoring)."""
    gaps = [0]
    maps_by_id = {m.map_id: m for m in tracker.atlas.maps}
    for fid, _t, map_id, k, _R, _tcr in tracker.trajectory:
        while (map_id, k) in tracker._kf_alias:
            map_id, k = tracker._kf_alias[(map_id, k)]
        m = maps_by_id.get(map_id)
        if m is None or not m.kf_valid[k]:
            continue
        gaps.append(abs(int(fid) - int(m.kf_frame_id[k])))
    return int(max(gaps))


def _prev_round(path="."):
    """Newest BENCH_r*.json for round-over-round comparison fields."""
    import glob
    import re

    best = None
    for f in glob.glob(f"{path}/BENCH_r*.json"):
        mm = re.search(r"BENCH_r(\d+)\.json$", f)
        if mm:
            n = int(mm.group(1))
            if best is None or n > best[0]:
                best = (n, f)
    if best is None:
        return None
    try:
        with open(best[1]) as fh:
            d = json.load(fh)
        # The driver wraps the bench's JSON line under "parsed".
        d = d.get("parsed", d)
        return {"round": best[0], **d}
    except Exception:
        return None


def main():
    import os

    n_frames = int(os.environ.get("BENCH_FRAMES", "300"))
    scene, frames, Rs, ts = _render_sequence(n_frames)

    kernel_fps = _kernel_fps(scene, frames)

    # Pre-compile every local-BA shape bucket BEFORE the first run: a
    # bucket that first-compiles mid-sequence stalls the mapping worker
    # for the full XLA compile and tracking starves. (Compiles persist
    # in the on-disk cache the package enables.)
    from orbslam3_cpp_fork_tpu.ops.camera import Camera as _Cam
    from orbslam3_cpp_fork_tpu.ops.orb import OrbParams as _OP
    from orbslam3_cpp_fork_tpu.runtime.tracker import (
        Tracker as _Trk, TrackerConfig as _TC,
    )

    _cam = _Cam.pinhole(
        scene.K[0, 0], scene.K[1, 1], scene.K[0, 2], scene.K[1, 2]
    )
    _warm = _Trk(_TC(camera=_cam, width=scene.width, height=scene.height,
                     orb=_OP(n_features=1000), async_mapping=False))
    _warm.warm_mapping_programs()

    # Warm pass: compiles every runtime program end-to-end (free-run).
    warm_tracker, _, _, _, _ = _run_slam(scene, frames)
    if warm_tracker.worker is not None:
        warm_tracker.worker.stop()

    # POST-warm free-run: honest unpaced throughput (the r03 number
    # included every compile and understated it ~10x).
    fr_tracker, _, _, fr_track, _ = _run_slam(scene, frames)
    if fr_tracker.worker is not None:
        fr_tracker.worker.stop()
    freerun_fps = len(frames) / fr_track

    # Sync-mode control: the same sequence, frame-synchronous mapping,
    # unpaced. Its ATE is the accuracy of the ALGORITHMS with the
    # concurrency layer removed — the distance between this number and
    # the shipping async ATE is the accuracy cost of the pipeline
    # (VERDICT r4 item 8: the 30x r04 gap was a judge's discovery, not
    # a tracked metric; now it is tracked every round).
    sync_tracker, _, sync_stamps, sync_t, _ = _run_slam(
        scene, frames, async_mapping=False
    )
    sync_ate, sync_cov = _traj_ate(sync_tracker, sync_stamps, ts, len(frames))
    sync_lost = int(sync_tracker.n_lost_events)

    # Timed pass: REFERENCE SEMANTICS — frames delivered at the 20 fps
    # camera rate; "real-time" means consuming the stream without
    # falling behind (BASELINE.md: examples sleep to dataset
    # timestamps). The reported fps is frames / time-to-consume: 20
    # when keeping up, lower when the tracker stalls the camera.
    tracker, lat, stamps, t_track, wall = _run_slam(scene, frames, paced=True)
    e2e_fps = len(frames) / t_track
    # circle_trajectory returns CAMERA-TO-WORLD poses: `ts` are the
    # ground-truth camera centers directly. (The former
    # -(R^T t) "centers" collapsed this circle to a constant point,
    # which let the scale-optimal alignment report ATE ~0 for any
    # trajectory — the r02 number was degenerate, not good.)
    ate, coverage = _traj_ate(tracker, stamps, ts, len(frames))
    n_kfs = tracker.map.n_keyframes()
    n_loops = (
        tracker.loop_closer.n_loops_closed if tracker.loop_closer else 0
    )
    # Map-quality corroboration: ATE of the KEYFRAME poses themselves
    # (scale-aligned). The exported per-frame trajectory composes
    # relative records; this isolates the optimized map from the export
    # path.
    kf_ate = float("nan")
    m = tracker.map
    valid = np.nonzero(m.kf_valid)[0]
    if len(valid) >= 4:
        from orbslam3_cpp_fork_tpu.utils.evaluation import align_umeyama

        centers = -np.einsum("kji,kj->ki", m.kf_R[valid], m.kf_t[valid])
        gt_kf = ts[np.clip(m.kf_frame_id[valid], 0, len(frames) - 1)]
        s_a, R_a, t_a = align_umeyama(centers, gt_kf, with_scale=True)
        resid = np.linalg.norm((s_a * centers @ R_a.T + t_a) - gt_kf, axis=1)
        kf_ate = float(np.sqrt((resid ** 2).mean()))
    # Per-stage latency decomposition (VERDICT r2 item 1).
    stages = {
        name: round(s["mean_ms"], 2)
        for name, s in tracker.timers.summary().items()
    }
    if tracker.worker is not None:
        tracker.worker.stop()

    med = float(np.median(lat))
    p99 = float(np.quantile(lat, 0.99))
    # Latency-tail attribution: every frame over 150 ms with the cause
    # tags the runtime recorded for it (VERDICT r4 item 4).
    slow_frames = [
        {
            "frame": int(i),
            "ms": round(float(lat[i]) * 1e3, 1),
            "causes": tracker.frame_causes.get(int(i), []),
        }
        for i in np.nonzero(lat > 0.15)[0]
    ][:40]
    prev = _prev_round()
    prev_fields = {}
    if prev is not None:
        prev_fields = {
            "prev_round": prev["round"],
            "prev_fps": prev.get("value"),
            "prev_ate_scaled_m": prev.get("ate_scaled_m"),
            "prev_kf_ate_scaled_m": prev.get("kf_ate_scaled_m"),
        }
    print(
        json.dumps(
            {
                "metric": "slam_e2e_fps_per_chip",
                "value": round(float(e2e_fps), 2),
                "unit": "frames/s",
                "vs_baseline": round(float(e2e_fps) / 20.0, 3),
                "track_ms_median": round(med * 1e3, 2),
                "track_ms_p99": round(p99 * 1e3, 2),
                "p99_over_median": round(p99 / max(med, 1e-9), 2),
                "n_over_budget": int((lat > 0.05).sum()),
                "freerun_fps": round(float(freerun_fps), 2),
                "kernel_fps": round(float(kernel_fps), 2),
                "ate_scaled_m": (
                    round(float(ate.rmse_scaled), 4) if ate else float("nan")
                ),
                "ate_unit_m": (
                    round(float(ate.rmse), 4) if ate else float("nan")
                ),
                "ate_n_pairs": int(ate.n_pairs) if ate else 0,
                "coverage": round(float(coverage), 3),
                "n_lost_events": int(tracker.n_lost_events),
                "n_frames_dropped": int(tracker.n_frames_dropped),
                "n_maps_final": len(tracker.atlas.maps),
                "n_pipelined_frames": int(tracker.n_pipelined_frames),
                "n_sync_frames": int(tracker.n_sync_frames),
                "n_keyframes": int(n_kfs),
                "n_kf_skipped_backpressure": int(
                    tracker.n_kf_skipped_backpressure
                ),
                "n_loops_closed": int(n_loops),
                "kf_ate_scaled_m": round(kf_ate, 4),
                "ate_sync_m": (
                    round(float(sync_ate.rmse_scaled), 4)
                    if sync_ate else float("nan")
                ),
                "sync_coverage": round(float(sync_cov), 3),
                "sync_n_lost_events": sync_lost,
                "sync_fps": round(len(frames) / sync_t, 2),
                "max_record_gap": _max_record_gap(tracker),
                "n_frames": len(frames),
                "stage_ms_mean": stages,
                "slow_frames": slow_frames,
                **prev_fields,
            }
        )
    )


if __name__ == "__main__":
    main()
