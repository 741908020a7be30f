"""Decompose the local-BA stage cost: host gather vs solve vs fetch,
on the host CPU backend vs the accelerator (VERDICT r4 item 5).

Builds a map with sync tracking, then times _local_ba_dispatch /
_local_ba_apply in isolation for both backends, plus the triangulation
and fusion programs for comparison.

Usage: python tools_profile_ba.py [n_frames]
"""

import sys
import time

import numpy as np


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 120

    from orbslam3_cpp_fork_tpu.datasets import synthetic
    from orbslam3_cpp_fork_tpu.ops.camera import Camera
    from orbslam3_cpp_fork_tpu.ops.orb import OrbParams
    from orbslam3_cpp_fork_tpu.runtime.tracker import Tracker, TrackerConfig

    H, W = 480, 752
    scene = synthetic.make_ring_scene(
        seed=7, n_points=1200, size_range=(9, 15), width=W, height=H
    )
    Rs, ts = synthetic.circle_trajectory(
        n_frames=n_frames, radius=2.5, total_angle=2.3 * np.pi
    )
    frames = [synthetic.render_frame(scene, Rs[i], ts[i]) for i in range(n_frames)]
    cam = Camera.pinhole(scene.K[0, 0], scene.K[1, 1], scene.K[0, 2], scene.K[1, 2])

    import jax

    for backend in ("cpu", "tpu"):
        import os

        os.environ["ORBSLAM3_TPU_MAPPING_BACKEND"] = backend
        cfg = TrackerConfig(
            camera=cam, width=W, height=H, orb=OrbParams(n_features=1000),
            enable_loop_closing=False, async_mapping=False,
        )
        tr = Tracker(cfg)
        print(f"=== backend={backend} map_dev={tr._map_dev} ===", flush=True)
        for i in range(n_frames):
            tr.track(frames[i], i / 20.0)
        m = tr.map
        print(f"map: {m.n_keyframes()} KFs / {m.n_landmarks()} lms")

        # pick the newest KF window like the mapping step does
        valid = np.nonzero(m.kf_valid)[0]
        k = int(valid[np.argmax(m.kf_frame_id[valid])])
        neigh, _ = m.covisible_keyframes(k, min_weight=15, top=cfg.local_window_kfs)
        window = [k] + [int(x) for x in neigh[: cfg.ba_kf_cap - 1]]

        # warm
        ctx = tr._local_ba_dispatch(window, iters=6)
        tr._local_ba_apply(ctx)

        for trial in range(3):
            t0 = time.perf_counter()
            ctx = tr._local_ba_dispatch(window, iters=6)
            t1 = time.perf_counter()
            tr._local_ba_apply(ctx)
            t2 = time.perf_counter()
            print(
                f"  local_ba6 trial{trial}: dispatch {1e3*(t1-t0):7.1f} ms  "
                f"apply(wait+write) {1e3*(t2-t1):7.1f} ms"
            )
        # dispatch decomposition: host gather only (no run)
        t0 = time.perf_counter()
        lms = m.local_map_landmarks(np.asarray(window, np.int64))[: cfg.ba_lm_cap]
        other = m.obs[:, lms].any(axis=1) & m.kf_valid
        t1 = time.perf_counter()
        print(f"  gather lms+obs probe: {1e3*(t1-t0):6.1f} ms  ({len(lms)} lms)")

        # triangulation + fusion timings (always accelerator)
        tri_n = None
        for trial in range(3):
            t0 = time.perf_counter()
            tri = tr._triangulate_dispatch(k, neigh)
            t1 = time.perf_counter()
            if tri is not None:
                import jax as _j

                _j.block_until_ready(tri[4])
            t2 = time.perf_counter()
            print(
                f"  triangulate trial{trial}: dispatch {1e3*(t1-t0):7.1f} ms  "
                f"wait {1e3*(t2-t1):7.1f} ms"
            )
        for trial in range(3):
            t0 = time.perf_counter()
            fz = tr._fuse_dispatch(k)
            t1 = time.perf_counter()
            if fz is not None:
                import jax as _j

                _j.block_until_ready([x for x in fz if hasattr(x, "block_until_ready")])
            t2 = time.perf_counter()
            print(
                f"  fuse trial{trial}:        dispatch {1e3*(t1-t0):7.1f} ms  "
                f"wait {1e3*(t2-t1):7.1f} ms"
            )


if __name__ == "__main__":
    main()
