"""Benchmark: per-chip tracking throughput of the fused per-frame step.

Runs the flagship device program (ORB extract -> local-map projection
match -> motion-only pose optimization; runtime/device_step.py) on one
real TPU chip over a rendered synthetic frame at EuRoC-like resolution
and workload (752x480, 1000 features, 2048-landmark local map).

Baseline: the reference is a real-time CPU system paced at the EuRoC
camera rate of 20 fps (BASELINE.md; Examples/Monocular/mono_euroc.cc
sleeps to dataset timestamps) — vs_baseline = fps / 20.

Prints exactly one JSON line on stdout.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from orbslam3_cpp_fork_tpu.datasets import synthetic
    from orbslam3_cpp_fork_tpu.ops.orb import OrbParams
    from orbslam3_cpp_fork_tpu.runtime.device_step import fused_track_step

    H, W = 480, 752
    scene = synthetic.make_scene(
        n_points=2500, width=W, height=H, fx=458.0, seed=0
    )
    img_np = synthetic.render_frame(
        scene, np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
    )
    img = jnp.asarray(img_np)

    L = 2048
    rng = np.random.default_rng(0)
    sel = rng.permutation(len(scene.points))[:L]
    lm_pos = jnp.asarray(scene.points[sel])
    lm_normal = jnp.asarray(np.tile(np.array([0, 0, -1], np.float32), (L, 1)))
    lm_min = jnp.full((L,), 0.1, jnp.float32)
    lm_max = jnp.full((L,), 100.0, jnp.float32)
    lm_bits = jnp.asarray(rng.integers(0, 2, (L, 256)).astype(np.int8))
    lm_valid = jnp.ones((L,), bool)
    R = jnp.eye(3, dtype=jnp.float32)
    t = jnp.zeros(3, jnp.float32)
    p = OrbParams(n_features=1000)

    def step(img, R, t):
        feats, R2, t2, idx, mok, inl, n_in = fused_track_step(
            img, R, t, lm_pos, lm_normal, lm_min, lm_max, lm_bits, lm_valid,
            458.0, 457.0, W / 2.0, H / 2.0, float(W), float(H), orb_params=p,
        )
        return R2, t2, n_in

    step_j = jax.jit(step)
    # Warmup / compile.
    out = step_j(img, R, t)
    jax.block_until_ready(out)

    n_iter = 50
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = step_j(img, R, t)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = n_iter / dt

    print(
        json.dumps(
            {
                "metric": "tracking_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 20.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
