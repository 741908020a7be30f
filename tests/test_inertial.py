"""Visual-inertial optimization tests on an exact analytic trajectory
(parity targets: Optimizer::InertialOptimization src/Optimizer.cc:3032,
PoseInertialOptimizationLastKeyFrame :4457, LocalInertialBA :2371)."""

import numpy as np
import jax
import jax.numpy as jnp

from orbslam3_cpp_fork_tpu.ops import imu
from orbslam3_cpp_fork_tpu.optim import inertial
from orbslam3_cpp_fork_tpu.utils import lie

CALIB = imu.ImuCalib.create(1.7e-4, 2e-3, 1.9e-5, 3e-3, 200.0)
G_W = np.array([0.0, 0.0, -imu.GRAVITY])


def circle_state(theta, r=2.0, omega=0.6):
    """Exact body state on a horizontal circle traversed at constant
    angular rate: position, velocity, world accel, orientation, body
    rates. Body axes: x = tangent, y = world z, z = radial outward."""
    c, s = np.cos(theta), np.sin(theta)
    p = np.array([r * c, r * s, 0.0])
    v = r * omega * np.array([-s, c, 0.0])
    a_w = -r * omega**2 * np.array([c, s, 0.0])
    x_b = np.array([-s, c, 0.0])
    z_b = np.array([c, s, 0.0])
    y_b = np.cross(z_b, x_b)  # = (0,0,1)
    Rwb = np.stack([x_b, y_b, z_b], axis=1)
    w_body = Rwb.T @ np.array([0.0, 0.0, omega])
    return Rwb.astype(np.float32), p.astype(np.float32), v.astype(np.float32), a_w, w_body


def make_imu_between(t0, t1, r=2.0, omega=0.6, freq=200.0, bg=None, ba=None):
    """Exact IMU samples over [t0, t1] (midpoint sampling)."""
    n = max(int(round((t1 - t0) * freq)), 1)
    dt = (t1 - t0) / n
    accs, gyrs = [], []
    for k in range(n):
        t = t0 + (k + 0.5) * dt
        Rwb, _, _, a_w, w_body = circle_state(omega * t, r, omega)
        a_meas = Rwb.T @ (a_w - G_W)
        if ba is not None:
            a_meas = a_meas + ba
        g_meas = w_body if bg is None else w_body + bg
        accs.append(a_meas)
        gyrs.append(g_meas)
    return (
        np.asarray(accs, np.float32),
        np.asarray(gyrs, np.float32),
        np.full(n, dt, np.float32),
    )


def preintegrate_np(acc, gyr, dts, bg=None, ba=None):
    bg = np.zeros(3, np.float32) if bg is None else bg
    ba = np.zeros(3, np.float32) if ba is None else ba
    return imu.preintegrate(
        jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dts),
        jnp.ones(len(dts), bool), CALIB, jnp.asarray(bg), jnp.asarray(ba),
    )


def make_kf_chain(n_kf=8, kf_dt=0.5, r=2.0, omega=0.6):
    """KF states + preintegrations along the circle."""
    states = [circle_state(omega * (i * kf_dt), r, omega) for i in range(n_kf)]
    Rwb = np.stack([s[0] for s in states])
    p = np.stack([s[1] for s in states])
    v = np.stack([s[2] for s in states])
    pres = []
    for i in range(n_kf - 1):
        acc, gyr, dts = make_imu_between(i * kf_dt, (i + 1) * kf_dt, r, omega)
        pres.append(preintegrate_np(acc, gyr, dts))
    pre = jax.tree.map(lambda *xs: jnp.stack(xs), *pres)
    return Rwb, p, v, pre


def test_predict_state_circle():
    """Dead-reckoning along the circle matches the analytic state."""
    Rwb, p, v, pre = make_kf_chain(n_kf=3, kf_dt=0.4)
    p0 = jax.tree.map(lambda x: x[0], pre)
    R2, p2, v2 = imu.predict_state(
        jnp.asarray(Rwb[0]), jnp.asarray(p[0]), jnp.asarray(v[0]),
        p0, jnp.zeros(3), jnp.zeros(3),
    )
    np.testing.assert_allclose(np.asarray(R2), Rwb[1], atol=2e-3)
    np.testing.assert_allclose(np.asarray(p2), p[1], atol=2e-3)
    np.testing.assert_allclose(np.asarray(v2), v[1], atol=2e-3)


def test_inertial_init_recovers_gravity_and_scale():
    """Poses given in a rotated, scaled world; init must recover the true
    scale and the gravity direction (InitializeIMU's core step)."""
    n_kf = 10
    Rwb, p, v, pre = make_kf_chain(n_kf=n_kf, kf_dt=0.5)
    # Perturbed world: rotate by Rpert, scale positions by 1/s_true.
    s_true = 2.5
    Rpert = np.asarray(lie.so3_exp(jnp.asarray([0.25, -0.4, 0.1])))
    Rwb_in = np.einsum("ij,kjl->kil", Rpert, Rwb).astype(np.float32)
    p_in = (p @ Rpert.T / s_true).astype(np.float32)
    # Crude velocity seed from position differences.
    kf_dt = 0.5
    v0 = np.gradient(p_in, kf_dt, axis=0).astype(np.float32)

    ei = jnp.arange(n_kf - 1, dtype=jnp.int32)
    ej = ei + 1
    res = inertial.inertial_init(
        jnp.asarray(Rwb_in), jnp.asarray(p_in), jnp.asarray(v0),
        ei, ej, jnp.ones(n_kf - 1, bool), pre,
        jnp.float32(1e2), jnp.float32(1e5), iters=80,
    )
    scale = float(res.scale)
    assert abs(scale - s_true) / s_true < 0.05, scale
    # Estimated gravity direction in the perturbed world.
    g_est = np.asarray(res.Rwg) @ np.array([0.0, 0.0, -1.0])
    g_true = Rpert @ np.array([0.0, 0.0, -1.0])
    assert np.dot(g_est, g_true) > 0.999, (g_est, g_true)
    # Biases should be near zero; velocities near the rotated truth.
    assert np.linalg.norm(np.asarray(res.bg)) < 0.02
    v_true = (v @ Rpert.T / s_true).astype(np.float32)
    err = np.linalg.norm(np.asarray(res.vel) - v_true, axis=1).mean()
    assert err < 0.05 * np.linalg.norm(v_true, axis=1).mean() + 0.02, err


def test_linear_inertial_init():
    """Closed-form alignment recovers scale/gravity/velocities exactly on
    noise-free data (the seed for inertial_init)."""
    n_kf = 8
    Rwb, p, v, pre = make_kf_chain(n_kf=n_kf, kf_dt=0.4)
    s_true = 4.0
    Rpert = np.asarray(lie.so3_exp(jnp.asarray([0.3, -0.2, 0.15])))
    p_in = (p @ Rpert.T / s_true).astype(np.float32)
    Rwb_in = np.einsum("ij,kjl->kil", Rpert, Rwb).astype(np.float32)
    ei = np.arange(n_kf - 1)
    s, g, v_est = inertial.linear_inertial_init(Rwb_in, p_in, ei, ei + 1, pre)
    assert abs(s - s_true) / s_true < 0.02, s
    g_true = Rpert @ G_W
    np.testing.assert_allclose(g, g_true, atol=0.15)
    v_true = v @ Rpert.T  # metric velocities in the rotated world
    assert np.linalg.norm(v_est - v_true, axis=1).mean() < 0.05


def test_inertial_init_recovers_gyro_bias():
    """Bias-only variant (fixed scale/gravity) recovers an injected
    gyro bias (InertialOptimization bias overload :3222)."""
    n_kf, kf_dt = 8, 0.5
    bg_true = np.array([0.02, -0.015, 0.03], np.float32)
    states = [circle_state(0.6 * i * kf_dt) for i in range(n_kf)]
    Rwb = np.stack([s[0] for s in states])
    p = np.stack([s[1] for s in states])
    v = np.stack([s[2] for s in states])
    pres = []
    for i in range(n_kf - 1):
        acc, gyr, dts = make_imu_between(i * kf_dt, (i + 1) * kf_dt, bg=bg_true)
        pres.append(preintegrate_np(acc, gyr, dts))
    pre = jax.tree.map(lambda *xs: jnp.stack(xs), *pres)
    ei = jnp.arange(n_kf - 1, dtype=jnp.int32)
    res = inertial.inertial_init(
        jnp.asarray(Rwb), jnp.asarray(p), jnp.asarray(v),
        ei, ei + 1, jnp.ones(n_kf - 1, bool), pre,
        jnp.float32(0.0), jnp.float32(1e5),
        iters=60, fix_scale=True, fix_gravity=True,
    )
    np.testing.assert_allclose(np.asarray(res.bg), bg_true, atol=3e-3)


def _landmark_obs(Rwb, twb, n_lm=128, seed=0, noise=0.3):
    """Synthetic landmarks in front of the body's +z (camera == body)."""
    rng = np.random.default_rng(seed)
    Rcw = Rwb.T
    tcw = -Rcw @ twb
    pc = np.concatenate(
        [rng.uniform(-2, 2, (n_lm, 2)), rng.uniform(4, 12, (n_lm, 1))], axis=1
    )
    Xw = pc @ Rwb.T + twb  # world points seen at depth 4-12
    fx = fy = 400.0
    uv = np.stack([fx * pc[:, 0] / pc[:, 2], fy * pc[:, 1] / pc[:, 2]], 1)
    uv = uv + rng.normal(0, noise, uv.shape)
    uvr = np.concatenate([uv, np.zeros((n_lm, 1))], 1).astype(np.float32)
    return Xw.astype(np.float32), uvr, fx, fy


def test_pose_inertial_optimization_converges():
    """Perturbed frame state is pulled back by reprojection + one
    inertial edge with the anchor KF fixed."""
    kf_dt = 0.4
    R1, p1, v1, _, _ = circle_state(0.0)
    R2, p2, v2, _, _ = circle_state(0.6 * kf_dt)
    acc, gyr, dts = make_imu_between(0.0, kf_dt)
    pre = preintegrate_np(acc, gyr, dts)
    Xw, uvr, fx, fy = _landmark_obs(R2, p2)

    # Perturb the frame state.
    dR = np.asarray(lie.so3_exp(jnp.asarray([0.02, -0.03, 0.02])))
    R2p = (R2 @ dR).astype(np.float32)
    p2p = p2 + np.array([0.05, -0.04, 0.06], np.float32)
    v2p = v2 + np.array([0.2, -0.1, 0.15], np.float32)

    res = inertial.pose_inertial_optimization(
        jnp.asarray(R1), jnp.asarray(p1), jnp.asarray(v1),
        jnp.zeros(3), jnp.zeros(3),
        jnp.asarray(R2p), jnp.asarray(p2p), jnp.asarray(v2p),
        jnp.zeros(3), jnp.zeros(3),
        pre,
        jnp.asarray(Xw), jnp.asarray(uvr),
        jnp.full(len(Xw), 1.0, jnp.float32), jnp.ones(len(Xw), bool),
        jnp.zeros(len(Xw), bool),
        jnp.eye(3), jnp.zeros(3), jnp.float32(fx), jnp.float32(fy),
        jnp.float32(0.0),
        anchor_fixed=True,
    )
    assert int(res.n_inliers) > 100
    np.testing.assert_allclose(np.asarray(res.Rwb), R2, atol=5e-3)
    np.testing.assert_allclose(np.asarray(res.p), p2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(res.v), v2, atol=8e-2)
    # The marginal prior must be usable by the last-frame variant.
    assert np.all(np.isfinite(np.asarray(res.H_marg)))
    evals = np.linalg.eigvalsh(np.asarray(res.H_marg))
    assert evals.min() > -1e-3


def test_visual_inertial_ba_improves_window():
    """A perturbed temporal window is pulled back toward ground truth
    (LocalInertialBA semantics)."""
    n_kf, kf_dt = 6, 0.4
    Rwb, p, v, pre = make_kf_chain(n_kf=n_kf, kf_dt=kf_dt)
    rng = np.random.default_rng(3)

    # Shared landmarks observed by all KFs.
    n_lm = 96
    Xw_all = []
    obs_kf, obs_lm, obs_uvr, obs_sig = [], [], [], []
    Xw = None
    fx = fy = 400.0
    for k in range(n_kf):
        Xk, uvr, fx, fy = _landmark_obs(Rwb[k], p[k], n_lm=n_lm, seed=7, noise=0.3)
        if Xw is None:
            Xw = Xk  # same seed => same world points relative to body 0
    # Use KF0's landmark set, re-projected into every KF.
    for k in range(n_kf):
        Rcw = Rwb[k].T
        tcw = -Rcw @ p[k]
        pc = Xw @ Rcw.T + tcw
        vis = pc[:, 2] > 0.5
        uv = np.stack(
            [fx * pc[:, 0] / np.maximum(pc[:, 2], 1e-6),
             fy * pc[:, 1] / np.maximum(pc[:, 2], 1e-6)], 1
        ) + rng.normal(0, 0.3, (n_lm, 2))
        for j in np.nonzero(vis & (np.abs(uv) < 400).all(1))[0]:
            obs_kf.append(k)
            obs_lm.append(j)
            obs_uvr.append([uv[j, 0], uv[j, 1], 0.0])
            obs_sig.append(1.0)

    O = len(obs_kf)
    # Perturb all but KF0.
    Rp, pp, vp = Rwb.copy(), p.copy(), v.copy()
    for k in range(1, n_kf):
        Rp[k] = Rp[k] @ np.asarray(lie.so3_exp(jnp.asarray(rng.normal(0, 0.01, 3))))
        pp[k] = pp[k] + rng.normal(0, 0.03, 3)
        vp[k] = vp[k] + rng.normal(0, 0.1, 3)
    Xp = Xw + rng.normal(0, 0.03, Xw.shape)

    prob = inertial.VIBAProblem(
        Rwb=jnp.asarray(Rp.astype(np.float32)),
        twb=jnp.asarray(pp.astype(np.float32)),
        vel=jnp.asarray(vp.astype(np.float32)),
        bg=jnp.zeros((n_kf, 3)),
        ba=jnp.zeros((n_kf, 3)),
        kf_valid=jnp.ones(n_kf, bool),
        kf_fixed=jnp.zeros(n_kf, bool).at[0].set(True),
        Xw=jnp.asarray(Xp.astype(np.float32)),
        lm_valid=jnp.ones(n_lm, bool),
        obs_kf=jnp.asarray(np.asarray(obs_kf, np.int32)),
        obs_lm=jnp.asarray(np.asarray(obs_lm, np.int32)),
        obs_uvr=jnp.asarray(np.asarray(obs_uvr, np.float32)),
        obs_sigma2=jnp.asarray(np.asarray(obs_sig, np.float32)),
        obs_stereo=jnp.zeros(O, bool),
        obs_valid=jnp.ones(O, bool),
        edge_i=jnp.arange(n_kf - 1, dtype=jnp.int32),
        edge_j=jnp.arange(1, n_kf, dtype=jnp.int32),
        edge_valid=jnp.ones(n_kf - 1, bool),
        pre=pre,
        Rcb=jnp.eye(3),
        tcb=jnp.zeros(3),
        fx=jnp.float32(fx),
        fy=jnp.float32(fy),
        bf=jnp.float32(0.0),
    )
    res = inertial.visual_inertial_ba(prob, iters=12, gate_at=6)

    def pose_err(Ra, ta, Rb, tb):
        r = np.linalg.norm(np.asarray(ta) - tb, axis=-1).mean()
        return r

    err_before = pose_err(Rp, pp, Rwb, p)
    err_after = pose_err(np.asarray(res.Rwb), np.asarray(res.twb), Rwb, p)
    assert err_after < 0.4 * err_before, (err_before, err_after)
    v_err_before = np.linalg.norm(vp - v, axis=-1).mean()
    v_err_after = np.linalg.norm(np.asarray(res.vel) - v, axis=-1).mean()
    assert v_err_after < 0.6 * v_err_before, (v_err_before, v_err_after)
