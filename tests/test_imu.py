"""IMU preintegration tests against analytic trajectories
(parity target: src/ImuTypes.cc:202-261 IntegrateNewMeasurement)."""

import numpy as np
import jax.numpy as jnp

from orbslam3_cpp_fork_tpu.ops import imu
from orbslam3_cpp_fork_tpu.utils import lie

CALIB = imu.ImuCalib.create(1.7e-4, 2e-3, 2e-5, 3e-3, 200.0)


def simulate(w_body, a_world, duration=1.0, freq=200.0, R0=None):
    """Generate perfect IMU samples for constant body angular rate and
    constant world-frame acceleration. Returns (acc, gyro, dts, states)."""
    n = int(duration * freq)
    dt = 1.0 / freq
    R0 = np.eye(3) if R0 is None else R0
    Rs = [R0]
    vs = [np.zeros(3)]
    ps = [np.zeros(3)]
    accs, gyros = [], []
    g = np.array([0.0, 0.0, -imu.GRAVITY])
    for i in range(n):
        R = Rs[-1]
        # accelerometer measures specific force in body frame
        accs.append(R.T @ (a_world - g))
        gyros.append(w_body)
        R_next = R @ np.asarray(lie.so3_exp(jnp.asarray(w_body * dt)))
        vs.append(vs[-1] + a_world * dt)
        ps.append(ps[-1] + vs[-2] * dt + 0.5 * a_world * dt * dt)
        Rs.append(R_next)
    return (
        np.array(accs, np.float32),
        np.array(gyros, np.float32),
        np.full(n, dt, np.float32),
        (np.array(Rs), np.array(vs), np.array(ps)),
    )


def test_preintegrate_pure_rotation():
    w = np.array([0.3, -0.2, 0.5])
    acc, gyro, dts, (Rs, _, _) = simulate(w, np.zeros(3))
    p = imu.preintegrate(
        jnp.asarray(acc), jnp.asarray(gyro), jnp.asarray(dts),
        jnp.ones(len(dts), bool), CALIB, jnp.zeros(3), jnp.zeros(3),
    )
    np.testing.assert_allclose(np.asarray(p.dR), Rs[-1], atol=1e-4)
    assert abs(float(p.dT) - len(dts) / 200.0) < 1e-5


def test_preintegrate_const_accel():
    a_w = np.array([0.5, -0.3, 9.81 + 0.2])  # world accel incl. hover
    acc, gyro, dts, (Rs, vs, ps) = simulate(np.zeros(3), a_w - np.array([0, 0, 9.81]))
    p = imu.preintegrate(
        jnp.asarray(acc), jnp.asarray(gyro), jnp.asarray(dts),
        jnp.ones(len(dts), bool), CALIB, jnp.zeros(3), jnp.zeros(3),
    )
    # With R0=I and no rotation: dV = integral of (a_meas) = (a_world - g)*T
    T = float(p.dT)
    g = np.array([0.0, 0.0, -imu.GRAVITY])
    expect_dV = (a_w - np.array([0, 0, 9.81]) - g) * T
    np.testing.assert_allclose(np.asarray(p.dV), expect_dV, atol=1e-3)
    np.testing.assert_allclose(np.asarray(p.dP), expect_dV * T / 2, atol=1e-2)


def test_predict_state_roundtrip():
    """predict_state must reproduce the simulated world trajectory."""
    w = np.array([0.2, 0.1, -0.4])
    a_world = np.array([0.3, 0.2, 0.1])
    acc, gyro, dts, (Rs, vs, ps) = simulate(w, a_world, duration=0.5)
    p = imu.preintegrate(
        jnp.asarray(acc), jnp.asarray(gyro), jnp.asarray(dts),
        jnp.ones(len(dts), bool), CALIB, jnp.zeros(3), jnp.zeros(3),
    )
    R2, p2, v2 = imu.predict_state(
        jnp.eye(3), jnp.zeros(3), jnp.zeros(3), p, jnp.zeros(3), jnp.zeros(3)
    )
    np.testing.assert_allclose(np.asarray(R2), Rs[-1], atol=1e-3)
    np.testing.assert_allclose(np.asarray(v2), vs[-1], atol=1e-3)
    np.testing.assert_allclose(np.asarray(p2), ps[-1], atol=1e-3)


def test_bias_jacobian_first_order():
    """Bias-corrected getters must match re-integration with shifted bias."""
    rng = np.random.default_rng(11)
    acc = rng.normal(0, 1.0, size=(100, 3)).astype(np.float32) + np.array(
        [0, 0, 9.81], np.float32
    )
    gyro = rng.normal(0, 0.5, size=(100, 3)).astype(np.float32)
    dts = np.full(100, 0.005, np.float32)
    valid = jnp.ones(100, bool)
    p0 = imu.preintegrate(
        jnp.asarray(acc), jnp.asarray(gyro), jnp.asarray(dts), valid,
        CALIB, jnp.zeros(3), jnp.zeros(3),
    )
    db_g = jnp.asarray([0.002, -0.001, 0.0015])
    db_a = jnp.asarray([0.01, 0.02, -0.015])
    # Re-integrate with the new bias (ground truth).
    p1 = imu.preintegrate(
        jnp.asarray(acc), jnp.asarray(gyro), jnp.asarray(dts), valid,
        CALIB, db_g, db_a,
    )
    np.testing.assert_allclose(
        np.asarray(imu.delta_rotation(p0, db_g)), np.asarray(p1.dR), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(imu.delta_velocity(p0, db_g, db_a)), np.asarray(p1.dV), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(imu.delta_position(p0, db_g, db_a)), np.asarray(p1.dP), atol=2e-3
    )


def test_masked_padding_no_effect():
    rng = np.random.default_rng(13)
    acc = rng.normal(size=(50, 3)).astype(np.float32)
    gyro = rng.normal(size=(50, 3)).astype(np.float32)
    dts = np.full(50, 0.005, np.float32)
    p_short = imu.preintegrate(
        jnp.asarray(acc[:30]), jnp.asarray(gyro[:30]), jnp.asarray(dts[:30]),
        jnp.ones(30, bool), CALIB, jnp.zeros(3), jnp.zeros(3),
    )
    mask = jnp.asarray(np.arange(50) < 30)
    p_pad = imu.preintegrate(
        jnp.asarray(acc), jnp.asarray(gyro), jnp.asarray(dts), mask,
        CALIB, jnp.zeros(3), jnp.zeros(3),
    )
    np.testing.assert_allclose(np.asarray(p_pad.dR), np.asarray(p_short.dR), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_pad.dP), np.asarray(p_short.dP), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_pad.C), np.asarray(p_short.C), atol=1e-9)
