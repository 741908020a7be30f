"""Isolate pose_optimization + matching cost on the real TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from orbslam3_cpp_fork_tpu.optim.pose_opt import pose_optimization
from orbslam3_cpp_fork_tpu.ops import matching

N = 2048
rng = np.random.default_rng(0)
Xw = np.concatenate([rng.uniform(-3, 3, (N, 2)), rng.uniform(4, 9, (N, 1))], 1).astype(np.float32)
fx = fy = 458.0
uv = np.stack([fx * Xw[:, 0] / Xw[:, 2], fy * Xw[:, 1] / Xw[:, 2]], 1).astype(np.float32)
uv += rng.normal(0, 1.0, uv.shape).astype(np.float32)
sigma2 = np.ones(N, np.float32)
valid = rng.uniform(size=N) < 0.3
R0 = jnp.eye(3, dtype=jnp.float32)
t0 = jnp.asarray(np.array([0.05, -0.03, 0.08], np.float32))
Xw_j = jnp.asarray(Xw); uv_j = jnp.asarray(uv)
s2 = jnp.asarray(sigma2); v = jnp.asarray(valid)


def timeit_chain(name, f, x0, n=40):
    x = f(x0)
    jax.block_until_ready(x)
    float(np.asarray(x).ravel()[0])
    t0_ = time.perf_counter()
    x = x0
    for _ in range(n):
        x = f(x)
    _ = float(np.asarray(x).ravel()[0])
    dt = (time.perf_counter() - t0_) / n * 1e3
    print(f"{name:36s} {dt:8.3f} ms")


def po(t):
    res = pose_optimization(R0, t, Xw_j, uv_j, s2, v, fx, fy)
    return res.t


timeit_chain("pose_optimization 4x10 N=2048", jax.jit(po), t0)


def po1(t):
    res = pose_optimization(R0, t, Xw_j, uv_j, s2, v, fx, fy, rounds=1, iters=1)
    return res.t
timeit_chain("pose_optimization 1x1", jax.jit(po1), t0)


def po_4x3(t):
    res = pose_optimization(R0, t, Xw_j, uv_j, s2, v, fx, fy, rounds=4, iters=3)
    return res.t
timeit_chain("pose_optimization 4x3", jax.jit(po_4x3), t0)

# matching: 2048x1000 popcount matmul + argmin etc.
bits_a = jnp.asarray(rng.integers(0, 2, (2048, 256)).astype(np.int8))
bits_b = jnp.asarray(rng.integers(0, 2, (1024, 256)).astype(np.int8))
uvp = jnp.asarray(rng.uniform(0, 700, (2048, 2)).astype(np.float32))
xyf = jnp.asarray(rng.uniform(0, 700, (1024, 2)).astype(np.float32))
lvl_m = jnp.zeros(2048, jnp.int32)
lvl_f = jnp.zeros(1024, jnp.int32)
vm = jnp.ones(2048, bool)
vf = jnp.ones(1024, bool)
rad = jnp.full((2048,), 15.0)


def mt(x):
    idx, ok = matching.search_by_projection(
        bits_a, vm, uvp + x[0] * 1e-20, lvl_m, bits_b, xyf, lvl_f, vf, rad)
    return x + jnp.sum(idx).astype(jnp.float32) * 1e-20

timeit_chain("search_by_projection 2048x1024", jax.jit(mt), t0)

# solve cost: 40 sequential 6x6 solves
H6 = jnp.asarray(rng.normal(size=(6, 6)).astype(np.float32))
H6 = H6 @ H6.T + 6 * jnp.eye(6)
b6 = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))


def solves(x):
    h = H6 + x[0] * 1e-20
    acc = jnp.zeros(6)
    for _ in range(40):
        acc = jnp.linalg.solve(h + jnp.diag(acc) * 1e-9, b6)
    return t0 + jnp.sum(acc) * 1e-20

timeit_chain("40 chained 6x6 linalg.solve", jax.jit(solves), t0)
