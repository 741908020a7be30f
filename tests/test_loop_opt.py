"""Unit tests: Sim3 refinement (OptimizeSim3) and essential-graph
pose-graph optimization (OptimizeEssentialGraph / 4DoF variants) on
synthetic problems with exact ground truth."""

import jax.numpy as jnp
import numpy as np

from orbslam3_cpp_fork_tpu.optim import pose_graph, sim3_opt
from orbslam3_cpp_fork_tpu.utils import lie


def _rand_rot(rng, scale=1.0):
    return np.asarray(lie.so3_exp(jnp.asarray(rng.normal(0, scale, 3).astype(np.float32))))


def test_optimize_sim3_recovers_gt():
    rng = np.random.default_rng(0)
    N = 120
    s_gt = 1.35
    R_gt = _rand_rot(rng, 0.3)
    t_gt = np.array([0.4, -0.2, 0.3], np.float32)
    pc2 = np.stack(
        [rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N), rng.uniform(4, 9, N)], 1
    ).astype(np.float32)
    pc1 = s_gt * pc2 @ R_gt.T + t_gt
    fx = fy = 400.0
    uv1 = fx * pc1[:, :2] / pc1[:, 2:3]
    uv2 = fx * pc2[:, :2] / pc2[:, 2:3]
    uv1 += rng.normal(0, 0.3, uv1.shape)
    uv2 += rng.normal(0, 0.3, uv2.shape)
    # 15% outliers.
    out = rng.random(N) < 0.15
    uv1[out] += rng.uniform(30, 80, (out.sum(), 2))

    # Perturbed init.
    dR = _rand_rot(rng, 0.05)
    res = sim3_opt.optimize_sim3(
        jnp.float32(s_gt * 1.1), jnp.asarray(dR @ R_gt), jnp.asarray(t_gt + 0.2),
        jnp.asarray(pc1), jnp.asarray(pc2),
        jnp.asarray(uv1.astype(np.float32)), jnp.asarray(uv2.astype(np.float32)),
        jnp.ones(N, jnp.float32), jnp.ones(N, jnp.float32),
        jnp.ones(N, bool), fx, fy,
    )
    assert abs(float(res.s) - s_gt) < 0.01, float(res.s)
    ang = np.degrees(
        np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(np.asarray(res.R) @ R_gt.T))))
    )
    assert ang < 0.5, ang
    assert np.linalg.norm(np.asarray(res.t) - t_gt) < 0.05
    assert int(res.n_inliers) > 0.7 * N


def test_optimize_sim3_fix_scale():
    rng = np.random.default_rng(1)
    N = 80
    R_gt = _rand_rot(rng, 0.2)
    t_gt = np.array([0.1, 0.3, -0.2], np.float32)
    pc2 = np.stack(
        [rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N), rng.uniform(4, 9, N)], 1
    ).astype(np.float32)
    pc1 = pc2 @ R_gt.T + t_gt
    fx = fy = 400.0
    uv1 = (fx * pc1[:, :2] / pc1[:, 2:3]).astype(np.float32)
    uv2 = (fx * pc2[:, :2] / pc2[:, 2:3]).astype(np.float32)
    res = sim3_opt.optimize_sim3(
        jnp.float32(1.0), jnp.asarray(_rand_rot(rng, 0.03) @ R_gt),
        jnp.asarray(t_gt + 0.1),
        jnp.asarray(pc1), jnp.asarray(pc2), jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.ones(N, jnp.float32), jnp.ones(N, jnp.float32),
        jnp.ones(N, bool), fx, fy, fix_scale=True,
    )
    assert abs(float(res.s) - 1.0) < 1e-5  # scale frozen
    assert np.linalg.norm(np.asarray(res.t) - t_gt) < 0.02


def _circle_poses(K, radius=5.0):
    """World-to-camera poses on a circle, camera x tangent."""
    Rs, ts = [], []
    for k in range(K):
        th = 2 * np.pi * k / K
        Rwc = np.asarray(
            lie.so3_exp(jnp.asarray([0.0, 0.0, th], dtype=jnp.float32))
        )
        twc = np.array([radius * np.cos(th), radius * np.sin(th), 0.0], np.float32)
        R = Rwc.T
        ts.append((-R @ twc).astype(np.float32))
        Rs.append(R.astype(np.float32))
    return np.stack(Rs), np.stack(ts)


def _integrate_odometry(R_gt, t_gt, drift_rot, drift_scale, seed=0, axes=(1, 1, 1)):
    """Odometry-integrated estimate with per-step drift (mono style).
    `axes` masks the rotation-drift axes (e.g. (0,0,1) = yaw-only for
    the inertial 4DoF scenario where roll/pitch are gravity-observable)."""
    rng = np.random.default_rng(seed)
    K = len(R_gt)
    s_est = [1.0]
    R_est = [R_gt[0]]
    t_est = [t_gt[0]]
    for k in range(1, K):
        # GT relative S_k,k-1 (scale 1).
        sr, Rr, tr = [np.asarray(x) for x in pose_graph.relative_sim3(
            np.ones(K, np.float32), R_gt, t_gt, k - 1, k
        )]
        # Drift it.
        dw = rng.normal(0, drift_rot, 3) * np.asarray(axes)
        dR = np.asarray(lie.so3_exp(jnp.asarray(dw.astype(np.float32))))
        ds = float(np.exp(rng.normal(0, drift_scale)))
        s_new, R_new, t_new = [np.asarray(x) for x in lie.sim3_mul(
            jnp.asarray(sr * ds), jnp.asarray(dR @ Rr), jnp.asarray(tr),
            jnp.asarray(np.float32(s_est[-1])), jnp.asarray(R_est[-1]), jnp.asarray(t_est[-1]),
        )]
        s_est.append(float(s_new))
        R_est.append(R_new.astype(np.float32))
        t_est.append(t_new.astype(np.float32))
    return np.asarray(s_est, np.float32), np.stack(R_est), np.stack(t_est)


def test_pose_graph_closes_loop():
    K = 24
    R_gt, t_gt = _circle_poses(K)
    s_est, R_est, t_est = _integrate_odometry(R_gt, t_gt, 0.01, 0.01)

    # Edges: odometry chain measured from the *estimate* (zero residual
    # initially) + one loop edge with the TRUE relative pose.
    ei, ej, es, eR, et = [], [], [], [], []
    for k in range(1, K):
        sr, Rr, tr = pose_graph.relative_sim3(s_est, R_est, t_est, k - 1, k)
        ei.append(k - 1); ej.append(k)
        es.append(float(sr)); eR.append(np.asarray(Rr)); et.append(np.asarray(tr))
    sr, Rr, tr = pose_graph.relative_sim3(np.ones(K, np.float32), R_gt, t_gt, K - 1, 0)
    ei.append(K - 1); ej.append(0)
    es.append(float(sr)); eR.append(np.asarray(Rr)); et.append(np.asarray(tr))

    c_gt = -np.einsum("kji,kj->ki", R_gt, t_gt)
    c_est = -np.einsum("kji,kj->ki", R_est, t_est) / s_est[:, None]
    err_before = np.linalg.norm(c_est - c_gt, axis=1).mean()
    res = pose_graph.optimize_pose_graph(
        jnp.asarray(s_est), jnp.asarray(R_est), jnp.asarray(t_est),
        jnp.ones(K, bool), jnp.asarray(np.arange(K) == 0),
        jnp.asarray(np.asarray(ei, np.int32)), jnp.asarray(np.asarray(ej, np.int32)),
        jnp.asarray(np.asarray(es, np.float32)), jnp.asarray(np.stack(eR)),
        jnp.asarray(np.stack(et)), jnp.ones(K, jnp.float32),
        jnp.asarray(pose_graph.FREE_DIMS["sim3"]),
    )
    # The graph must become consistent (all-edge cost ~ 0: the loop error
    # is distributed along the chain)...
    assert float(res.cost) < 1e-2, float(res.cost)
    # ...and camera centers (de-scaled: c = -R^T t / s) must get much
    # closer to ground truth than the drifted odometry integration.
    s_new = np.asarray(res.s)
    R_new = np.asarray(res.R)
    t_new = np.asarray(res.t)
    c_new = -np.einsum("kji,kj->ki", R_new, t_new) / s_new[:, None]
    err_after = np.linalg.norm(c_new - c_gt, axis=1).mean()
    assert err_after < 0.5 * err_before, (err_before, err_after)
    # Scale drift (cumulative ~27% worst case) pulled back near 1.
    assert np.abs(s_new - 1.0).max() < 0.05


def test_pose_graph_4dof_keeps_rollpitch():
    K = 16
    R_gt, t_gt = _circle_poses(K)
    s_est, R_est, t_est = _integrate_odometry(
        R_gt, t_gt, 0.012, 0.0, seed=3, axes=(0, 0, 1)
    )
    s_est[:] = 1.0
    ei, ej, es, eR, et = [], [], [], [], []
    for k in range(1, K):
        sr, Rr, tr = pose_graph.relative_sim3(s_est, R_est, t_est, k - 1, k)
        ei.append(k - 1); ej.append(k)
        es.append(float(sr)); eR.append(np.asarray(Rr)); et.append(np.asarray(tr))
    sr, Rr, tr = pose_graph.relative_sim3(np.ones(K, np.float32), R_gt, t_gt, K - 1, 0)
    ei.append(K - 1); ej.append(0)
    es.append(float(sr)); eR.append(np.asarray(Rr)); et.append(np.asarray(tr))

    res = pose_graph.optimize_pose_graph(
        jnp.asarray(s_est), jnp.asarray(R_est), jnp.asarray(t_est),
        jnp.ones(K, bool), jnp.asarray(np.arange(K) == 0),
        jnp.asarray(np.asarray(ei, np.int32)), jnp.asarray(np.asarray(ej, np.int32)),
        jnp.asarray(np.asarray(es, np.float32)), jnp.asarray(np.stack(eR)),
        jnp.asarray(np.stack(et)), jnp.ones(K, jnp.float32),
        jnp.asarray(pose_graph.FREE_DIMS["4dof"]),
    )
    assert np.abs(np.asarray(res.s) - 1.0).max() < 1e-5  # scale frozen
    assert float(res.cost) < 1e-2  # graph made consistent
    c_new = -np.einsum("kji,kj->ki", np.asarray(res.R), np.asarray(res.t))
    c_gt = -np.einsum("kji,kj->ki", R_gt, t_gt)
    c_est = -np.einsum("kji,kj->ki", R_est, t_est)
    err_new = np.linalg.norm(c_new - c_gt, axis=1).mean()
    err_est = np.linalg.norm(c_est - c_gt, axis=1).mean()
    assert err_new < 0.75 * err_est, (err_new, err_est)
    # Roll/pitch frozen: camera z axis (= world z on this trajectory)
    # must be untouched by the 4DoF update.
    z_align = np.abs(np.asarray(res.R)[:, 2, 2] - R_est[:, 2, 2]).max()
    assert z_align < 1e-5, z_align
