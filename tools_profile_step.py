"""Per-stage timing of the fused track step on the real TPU.

Uses chained iterations with a forced scalar fetch (the axon-tunneled
backend defers execution; block_until_ready under-reports).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from orbslam3_cpp_fork_tpu.datasets import synthetic
from orbslam3_cpp_fork_tpu.ops.orb import (
    OrbParams, extract_orb, extract_orb_jit, fast_raw_score, nms3,
    select_keypoints, compute_angles, compute_descriptors, orientation_maps,
)
from orbslam3_cpp_fork_tpu.ops.image import build_pyramid, gaussian_blur7

H, W = 480, 752
scene = synthetic.make_scene(n_points=2500, width=W, height=H, fx=458.0, seed=0)
img_np = synthetic.render_frame(scene, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
img = jnp.asarray(img_np)
p = OrbParams(n_features=1000)


def timeit_chain(name, fn, n=40):
    """fn: img -> img-shaped array (chainable). Forces a scalar fetch at end."""
    f = jax.jit(fn)
    x = f(img)
    float(x[0, 0])  # warm fetch
    t0 = time.perf_counter()
    x = img
    for _ in range(n):
        x = f(x)
    _ = float(x[0, 0])
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:32s} {dt:8.3f} ms")


# identity chain = dispatch+fetch floor
timeit_chain("identity (floor)", lambda x: x + 0.0)

timeit_chain("build_pyramid", lambda x: build_pyramid(x, p.n_levels, p.scale_factor)[0] * 0.999 + x * 0.001)


def chain_fast(x):
    levels = build_pyramid(x, p.n_levels, p.scale_factor)
    acc = 0.0
    for l in levels:
        s = fast_raw_score(l)
        acc = acc + jnp.sum(s) * 1e-20
    return x + acc

timeit_chain("pyr+fast", chain_fast)


def chain_fastnms(x):
    levels = build_pyramid(x, p.n_levels, p.scale_factor)
    acc = 0.0
    for l in levels:
        s = nms3(fast_raw_score(l))
        acc = acc + jnp.sum(s) * 1e-20
    return x + acc

timeit_chain("pyr+fast+nms", chain_fastnms)


def chain_blur(x):
    levels = build_pyramid(x, p.n_levels, p.scale_factor)
    acc = 0.0
    for l in levels:
        acc = acc + jnp.sum(gaussian_blur7(l)) * 1e-20
    return x + acc

timeit_chain("pyr+blur", chain_blur)


def chain_orient(x):
    levels = build_pyramid(x, p.n_levels, p.scale_factor)
    acc = 0.0
    for l in levels:
        acc = acc + jnp.sum(orientation_maps(l)) * 1e-20
    return x + acc

timeit_chain("pyr+orientation_maps", chain_orient)


def chain_select(x):
    levels = build_pyramid(x, p.n_levels, p.scale_factor)
    acc = 0.0
    for l in levels:
        s = nms3(fast_raw_score(l))
        xy, sc, v = select_keypoints(s, 256, p.cell, p.k_per_cell)
        acc = acc + jnp.sum(sc) * 1e-20
    return x + acc

timeit_chain("pyr+fast+nms+select", chain_select)


def chain_extract(x):
    f = extract_orb(x, p)
    return x + jnp.sum(f.score) * 1e-20

timeit_chain("extract_orb (full)", chain_extract)

# full fused step
from orbslam3_cpp_fork_tpu.runtime.device_step import fused_track_step
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


def chain_full(x):
    R = jnp.eye(3, dtype=jnp.float32)
    t = jnp.zeros(3, jnp.float32)
    feats, R2, t2, idx, mok, inl, n_in = fused_track_step(
        x, R, t, lm_pos, lm_normal, lm_min, lm_max, lm_bits, lm_valid,
        fx, fy, cx, cy, float(W), float(H), orb_params=p)
    return x + n_in.astype(jnp.float32) * 1e-20

timeit_chain("fused_track_step", chain_full)


from orbslam3_cpp_fork_tpu.runtime.tracker import project_landmarks
from orbslam3_cpp_fork_tpu.ops import matching
from orbslam3_cpp_fork_tpu.optim import pose_opt as pose_opt_mod
from orbslam3_cpp_fork_tpu.models.map_state import SCALE_FACTOR

R_id = jnp.eye(3, dtype=jnp.float32)
t_id = jnp.zeros(3, jnp.float32)


def stage_match(x, do_pose: bool):
    feats = extract_orb(x, p)
    uv, level, dist, ok = project_landmarks(
        R_id, t_id, lm_pos, lm_normal, lm_min, lm_max, lm_valid,
        fx, fy, cx, cy, float(W), float(H))
    sigma = SCALE_FACTOR ** level.astype(jnp.float32)
    radius = 15.0 * sigma
    idx, mok = matching.search_by_projection(
        lm_bits, ok, uv, level,
        feats.desc_i8, feats.xy, feats.level, feats.valid,
        radius, max_dist=matching.TH_HIGH, ratio=0.9, level_band=1)
    if not do_pose:
        return x + jnp.sum(idx).astype(jnp.float32) * 1e-20
    uv_obs = feats.xy[idx] - jnp.stack([cx, cy])
    lvl_obs = feats.level[idx]
    sigma2 = SCALE_FACTOR ** (2.0 * lvl_obs.astype(jnp.float32))
    res = pose_opt_mod.pose_optimization(
        R_id, t_id, lm_pos, uv_obs, sigma2, mok, fx, fy)
    return x + res.n_inliers.astype(jnp.float32) * 1e-20


timeit_chain("extract+project+match", lambda x: stage_match(x, False))
timeit_chain("extract+match+poseopt", lambda x: stage_match(x, True))


def chain_poseopt_only(x):
    uv_obs = jnp.tanh(lm_pos[:, :2]) * 100.0 + x[0, 0] * 1e-20
    sigma2 = jnp.ones((L,), jnp.float32)
    res = pose_opt_mod.pose_optimization(
        R_id, t_id, lm_pos, uv_obs, sigma2, lm_valid, fx, fy)
    return x + res.n_inliers.astype(jnp.float32) * 1e-20

timeit_chain("poseopt only (in chain)", chain_poseopt_only)
