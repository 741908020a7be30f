"""Bisect the matching stage cost on the real TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from orbslam3_cpp_fork_tpu.datasets import synthetic
from orbslam3_cpp_fork_tpu.ops.orb import OrbParams, extract_orb, extract_orb_jit
from orbslam3_cpp_fork_tpu.runtime.tracker import project_landmarks
from orbslam3_cpp_fork_tpu.ops import matching
from orbslam3_cpp_fork_tpu.models.map_state import SCALE_FACTOR

H, W = 480, 752
scene = synthetic.make_scene(n_points=2500, width=W, height=H, fx=458.0, seed=0)
img_np = synthetic.render_frame(scene, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
img = jnp.asarray(img_np)
p = OrbParams(n_features=1000)

feats0 = extract_orb_jit(img, p)
xy0 = np.asarray(feats0.xy); bits0 = np.asarray(feats0.desc_i8); valid0 = np.asarray(feats0.valid)
L = 2048
rng = np.random.default_rng(0)
z = rng.uniform(4.0, 9.0, L).astype(np.float32)
vi = np.nonzero(valid0)[0]
src = vi[rng.integers(0, len(vi), L)]
fx, fy, cx, cy = 458.0, 457.0, W/2, H/2
x_ = (xy0[src, 0] - cx) / fx * z
y_ = (xy0[src, 1] - cy) / fy * z
pos = np.stack([x_, y_, z], 1)
lm_pos = jnp.asarray(pos)
lm_bits = jnp.asarray(bits0[src])
lm_normal = jnp.asarray(pos / np.linalg.norm(pos, axis=1, keepdims=True))
lm_min = jnp.full((L,), 0.1, jnp.float32)
lm_max = jnp.full((L,), 100.0, jnp.float32)
lm_valid = jnp.ones((L,), bool)
R_id = jnp.eye(3, dtype=jnp.float32)
t_id = jnp.zeros(3, jnp.float32)


def timeit_chain(name, fn, n=40):
    f = jax.jit(fn)
    x = f(img)
    float(x[0, 0])
    t0 = time.perf_counter()
    x = img
    for _ in range(n):
        x = f(x)
    _ = float(x[0, 0])
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:36s} {dt:8.3f} ms")


def mk(stage):
    def fn(x):
        feats = extract_orb(x, p)
        acc = jnp.sum(feats.score) * 1e-20
        if stage >= 1:
            uv, level, dist, ok = project_landmarks(
                R_id, t_id, lm_pos, lm_normal, lm_min, lm_max, lm_valid,
                fx, fy, cx, cy, float(W), float(H))
            acc += jnp.sum(uv) * 1e-20
        if stage >= 2:
            dmat = matching.hamming_matrix(lm_bits, feats.desc_i8)
            acc += jnp.sum(dmat).astype(jnp.float32) * 1e-20
        if stage >= 3:
            sigma = SCALE_FACTOR ** level.astype(jnp.float32)
            radius = 15.0 * sigma
            pen = matching.window_penalty(
                uv, feats.xy, radius, feats.level, level - 1, level + 1)
            acc += jnp.sum(jnp.minimum(pen, 1.0)) * 1e-20
        if stage >= 4:
            idx, mok = matching.match_nn(
                dmat.astype(jnp.float32), ok, feats.valid,
                max_dist=matching.TH_HIGH, ratio=0.9, cross_check=True,
                extra_penalty=pen)
            acc += jnp.sum(idx).astype(jnp.float32) * 1e-20
        return x + acc
    return fn


timeit_chain("extract only", mk(0))
timeit_chain("+project", mk(1))
timeit_chain("+hamming", mk(2))
timeit_chain("+window_penalty", mk(3))
timeit_chain("+match_nn", mk(4))
