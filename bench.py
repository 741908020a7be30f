"""Benchmark: per-chip tracking throughput of the fused per-frame step.

Runs the flagship device program (ORB extract -> local-map projection
match -> motion-only pose optimization; runtime/device_step.py) on one
real TPU chip over a rendered synthetic frame at EuRoC-like resolution
and workload (752x480, 1000 features, 2048-landmark local map seeded
with real descriptors extracted from the scene so the matcher and
pose optimizer do representative work).

Measurement: the axon-tunneled TPU backend defers execution, so
`block_until_ready` alone under-reports; throughput is measured over a
chain of steps with a forced scalar device->host fetch at the end
(amortizing the tunnel RTT the way a pipelined tracker would).

Baseline: the reference is a real-time CPU system paced at the EuRoC
camera rate of 20 fps (BASELINE.md; Examples/Monocular/mono_euroc.cc
sleeps to dataset timestamps) — vs_baseline = fps / 20.

Prints exactly one JSON line on stdout.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from orbslam3_cpp_fork_tpu.datasets import synthetic
    from orbslam3_cpp_fork_tpu.ops.orb import OrbParams, extract_orb_jit
    from orbslam3_cpp_fork_tpu.runtime.device_step import fused_track_step

    H, W = 480, 752
    fx, fy, cx, cy = 458.0, 457.0, W / 2.0, H / 2.0
    scene = synthetic.make_scene(n_points=2500, width=W, height=H, fx=fx, seed=0)
    img_np = synthetic.render_frame(
        scene, np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
    )
    img = jnp.asarray(img_np)
    p = OrbParams(n_features=1000)

    # Build a realistic local map: extract features from the frame and
    # back-project them with the true scene depth-ish (use z from the
    # nearest scene point along the ray; a constant depth is fine for a
    # throughput benchmark — descriptors are the real ones either way).
    feats0 = extract_orb_jit(img, p)
    xy0 = np.asarray(feats0.xy)
    bits0 = np.asarray(feats0.desc_i8)
    valid0 = np.asarray(feats0.valid)
    L = 2048
    rng = np.random.default_rng(0)
    z = rng.uniform(4.0, 9.0, L).astype(np.float32)
    src = rng.integers(0, max(valid0.sum(), 1), L)
    vi = np.nonzero(valid0)[0]
    src = vi[src % len(vi)]
    x = (xy0[src, 0] - cx) / fx * z
    y = (xy0[src, 1] - cy) / fy * z
    pos = np.stack([x, y, z], 1)
    lm_pos = jnp.asarray(pos)
    lm_bits = jnp.asarray(bits0[src])
    # Viewing normal: camera->point direction (MapPoint::mNormalVector).
    lm_normal = jnp.asarray(pos / np.linalg.norm(pos, axis=1, keepdims=True))
    lm_min = jnp.full((L,), 0.1, jnp.float32)
    lm_max = jnp.full((L,), 100.0, jnp.float32)
    lm_valid = jnp.ones((L,), bool)
    R = jnp.eye(3, dtype=jnp.float32)
    t = jnp.zeros(3, jnp.float32)

    def step(img, R, t):
        feats, R2, t2, idx, mok, inl, n_in = fused_track_step(
            img, R, t, lm_pos, lm_normal, lm_min, lm_max, lm_bits, lm_valid,
            fx, fy, cx, cy, float(W), float(H), orb_params=p,
        )
        return R2, t2, n_in

    step_j = jax.jit(step)
    # Warmup: compile + first-fetch path initialization.
    out = step_j(img, R, t)
    n_warm = int(out[2])

    n_iter = 50
    t0 = time.perf_counter()
    R2, t2 = R, t
    for _ in range(n_iter):
        R2, t2, n_in = step_j(img, R2, t2)
    n_final = int(n_in)  # forced fetch: drains the whole chain
    dt = time.perf_counter() - t0
    fps = n_iter / dt

    print(
        json.dumps(
            {
                "metric": "tracking_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 20.0, 3),
                "n_inliers": n_final,
            }
        )
    )


if __name__ == "__main__":
    main()
