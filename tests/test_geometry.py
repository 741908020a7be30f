"""Tests for triangulation, two-view reconstruction, PnP and Sim3 RANSAC
on synthetic scenes with known ground truth (parity targets:
src/TwoViewReconstruction.cc, src/MLPnPsolver.cpp, src/Sim3Solver.cc)."""

import numpy as np
import jax
import jax.numpy as jnp

from orbslam3_cpp_fork_tpu.ops import geometry, ransac
from orbslam3_cpp_fork_tpu.utils import lie

RNG = np.random.default_rng(7)
K = np.array([[458.0, 0, 367.0], [0, 457.0, 248.0], [0, 0, 1.0]], np.float32)


def make_scene(n=200, depth=(4.0, 10.0)):
    z = RNG.uniform(*depth, size=(n, 1))
    xy = RNG.uniform(-0.55, 0.55, size=(n, 2)) * z
    return np.concatenate([xy, z], axis=1).astype(np.float32)


def project_np(X, R, t):
    Xc = X @ R.T + t
    uv = Xc @ K.T
    return (uv[:, :2] / uv[:, 2:3]).astype(np.float32), Xc[:, 2]


def test_triangulate_exact():
    X = make_scene(64)
    R = np.asarray(lie.so3_exp(jnp.asarray([0.02, -0.1, 0.03])))
    t = np.array([0.3, 0.02, 0.01], np.float32)
    uv1, _ = project_np(X, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
    uv2, _ = project_np(X, R, t)
    P1 = jnp.asarray(K @ np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32))
    P2 = jnp.asarray(K @ np.hstack([R, t[:, None]]).astype(np.float32))
    Xr = geometry.triangulate_dlt(
        jnp.broadcast_to(P1, (64, 3, 4)),
        jnp.broadcast_to(P2, (64, 3, 4)),
        jnp.asarray(uv1),
        jnp.asarray(uv2),
    )
    np.testing.assert_allclose(np.asarray(Xr), X, atol=1e-2)


def test_two_view_reconstruction_recovers_pose():
    X = make_scene(300)
    R_gt = np.asarray(lie.so3_exp(jnp.asarray([0.03, -0.15, 0.02])))
    t_gt = np.array([0.5, 0.05, 0.1], np.float32)
    uv1, _ = project_np(X, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
    uv2, _ = project_np(X, R_gt, t_gt)
    # Add noise + some outliers.
    uv1 += RNG.normal(0, 0.3, uv1.shape).astype(np.float32)
    uv2 += RNG.normal(0, 0.3, uv2.shape).astype(np.float32)
    n_out = 30
    uv2[:n_out] = RNG.uniform(0, 700, size=(n_out, 2)).astype(np.float32)
    res = ransac.reconstruct_two_views(
        jnp.asarray(uv1),
        jnp.asarray(uv2),
        jnp.ones(300, bool),
        jnp.asarray(K),
        jax.random.PRNGKey(0),
    )
    assert bool(res.success)
    R_err = np.asarray(
        lie.so3_log(jnp.asarray(R_gt.T) @ res.R)
    )
    assert np.linalg.norm(R_err) < 0.02, R_err
    t_dir = np.asarray(res.t)
    t_dir = t_dir / np.linalg.norm(t_dir)
    t_gt_dir = t_gt / np.linalg.norm(t_gt)
    assert abs(np.dot(t_dir, t_gt_dir)) > 0.999
    # Triangulated inliers should be (scaled) consistent with the scene.
    good = np.asarray(res.good)
    assert good.sum() > 180
    scale = np.median(np.asarray(res.points)[good][:, 2] / X[good][:, 2])
    err = np.abs(np.asarray(res.points)[good] / scale - X[good]).max(axis=1)
    # A few accepted points sit near the chi2 boundary; the map-init BA
    # cleans those up in the pipeline. Require 95% well-triangulated.
    assert (err < 0.25).mean() > 0.95


def test_pnp_ransac_with_outliers():
    X = make_scene(150)
    R_gt = np.asarray(lie.so3_exp(jnp.asarray([0.2, 0.1, -0.3])))
    t_gt = np.array([0.2, -0.1, 0.5], np.float32)
    uv, _ = project_np(X, R_gt, t_gt)
    uv += RNG.normal(0, 0.3, uv.shape).astype(np.float32)
    uv[:40] = RNG.uniform(0, 700, size=(40, 2)).astype(np.float32)  # outliers
    R, t, inl, n_inl, ok = ransac.pnp_ransac(
        jnp.asarray(X), jnp.asarray(uv), jnp.ones(150, bool), jnp.asarray(K),
        jax.random.PRNGKey(1),
    )
    assert bool(ok)
    assert int(n_inl) > 90
    R_err = np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(R_gt.T) @ R)))
    assert R_err < 0.02, R_err
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=0.05)


def test_mlpnp_ransac_with_outliers():
    """ML-PnP (nullspace formulation + GN, MLPnPsolver::computePose
    src/MLPnPsolver.cpp:355) under 27% outliers."""
    X = make_scene(150)
    R_gt = np.asarray(lie.so3_exp(jnp.asarray([0.2, 0.1, -0.3])))
    t_gt = np.array([0.2, -0.1, 0.5], np.float32)
    uv, _ = project_np(X, R_gt, t_gt)
    uv += RNG.normal(0, 0.3, uv.shape).astype(np.float32)
    uv[:40] = RNG.uniform(0, 700, size=(40, 2)).astype(np.float32)
    R, t, inl, n_inl, ok = ransac.mlpnp_ransac(
        jnp.asarray(X), jnp.asarray(uv), jnp.ones(150, bool), jnp.asarray(K),
        jax.random.PRNGKey(1),
    )
    assert bool(ok)
    assert int(n_inl) > 95
    R_err = np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(R_gt.T) @ R)))
    assert R_err < 0.01, R_err
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=0.03)


def test_mlpnp_ransac_planar_scene():
    """The 9-unknown eigenframe branch (src/MLPnPsolver.cpp:445-478):
    all world points on one plane through the origin — where plain DLT
    resection degenerates — must still recover the pose."""
    n = 160
    rng = np.random.default_rng(11)
    X = np.stack(
        [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), np.zeros(n)], 1
    ).astype(np.float32)
    R_gt = np.asarray(lie.so3_exp(jnp.asarray([0.25, -0.15, 0.1])))
    t_gt = np.array([0.3, -0.2, 6.0], np.float32)
    pc = X @ R_gt.T + t_gt
    uv = (pc / pc[:, 2:]) @ np.asarray(K).T
    uv = (uv[:, :2] + rng.normal(0, 0.3, (n, 2))).astype(np.float32)
    uv[:30] = rng.uniform(0, 640, size=(30, 2)).astype(np.float32)
    R, t, inl, n_inl, ok = ransac.mlpnp_ransac(
        jnp.asarray(X), jnp.asarray(uv), jnp.ones(n, bool), jnp.asarray(K),
        jax.random.PRNGKey(4),
    )
    assert bool(ok)
    assert int(n_inl) > 100
    R_err = np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(R_gt.T) @ R)))
    assert R_err < 0.01, R_err
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=0.05)


def test_sim3_ransac():
    pa = make_scene(100)
    s_gt = 1.7
    R_gt = np.asarray(lie.so3_exp(jnp.asarray([0.3, -0.2, 0.5])))
    t_gt = np.array([1.0, -2.0, 0.5], np.float32)
    pb = s_gt * pa @ R_gt.T + t_gt
    pb += RNG.normal(0, 0.005, pb.shape).astype(np.float32)
    pb[:25] += RNG.uniform(1, 3, size=(25, 3)).astype(np.float32)  # outliers
    s, R, t, inl, n_inl, ok = ransac.sim3_ransac(
        jnp.asarray(pa), jnp.asarray(pb), jnp.ones(100, bool), jax.random.PRNGKey(2)
    )
    assert bool(ok)
    assert int(n_inl) > 60
    assert abs(float(s) - s_gt) < 0.02
    R_err = np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(R_gt.T) @ R)))
    assert R_err < 0.02
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=0.08)


def test_sim3_ransac_fixed_scale():
    pa = make_scene(80)
    R_gt = np.asarray(lie.so3_exp(jnp.asarray([0.1, 0.25, -0.15])))
    t_gt = np.array([0.4, 0.1, -0.6], np.float32)
    pb = pa @ R_gt.T + t_gt
    s, R, t, inl, n_inl, ok = ransac.sim3_ransac(
        jnp.asarray(pa), jnp.asarray(pb), jnp.ones(80, bool),
        jax.random.PRNGKey(3), fix_scale=True,
    )
    assert bool(ok)
    assert float(s) == 1.0
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-2)


def test_fundamental_from_poses_epipolar_constraint():
    X = make_scene(50)
    R2 = np.asarray(lie.so3_exp(jnp.asarray([0.05, -0.1, 0.02])))
    t2 = np.array([0.4, 0.0, 0.05], np.float32)
    uv1, _ = project_np(X, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
    uv2, _ = project_np(X, R2, t2)
    # F12: x2 in KF2 coordinates? Convention: world = cam1.
    F = geometry.fundamental_from_poses(
        jnp.eye(3), jnp.zeros(3), jnp.asarray(R2), jnp.asarray(t2),
        jnp.asarray(K), jnp.asarray(K),
    )
    x1h = np.hstack([uv1, np.ones((50, 1), np.float32)])
    x2h = np.hstack([uv2, np.ones((50, 1), np.float32)])
    resid = np.abs(np.einsum("ni,ij,nj->n", x1h, np.asarray(F), x2h))
    assert resid.max() < 1e-1
