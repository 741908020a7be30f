"""Unit tests for the Lie-group module (parity with Sophus closed forms).

Mirrors what the reference relies on from Thirdparty/Sophus: exp/log
round-trips, composition, inverse, Jacobian identities used by IMU
preintegration (src/ImuTypes.cc:51-75).
"""

import numpy as np
import jax.numpy as jnp

from orbslam3_cpp_fork_tpu.utils import lie

RNG = np.random.default_rng(0)


def rand_w(n=64, scale=2.0, max_norm=3.0):
    """Random tangents with norm clipped below pi (log is only a two-sided
    inverse of exp inside the injectivity radius)."""
    w = RNG.normal(size=(n, 3)) * scale
    nrm = np.linalg.norm(w, axis=-1, keepdims=True)
    w = np.where(nrm > max_norm, w * (max_norm / nrm), w)
    return jnp.asarray(w, dtype=jnp.float32)


def test_so3_exp_orthonormal():
    R = lie.so3_exp(rand_w())
    eye = jnp.eye(3)
    err = jnp.abs(R @ jnp.swapaxes(R, -1, -2) - eye).max()
    assert err < 1e-5
    det = jnp.linalg.det(R)
    np.testing.assert_allclose(det, 1.0, atol=1e-5)


def test_so3_exp_log_roundtrip():
    w = rand_w(scale=1.0)
    w2 = lie.so3_log(lie.so3_exp(w))
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-4)


def test_so3_log_exp_roundtrip_near_pi():
    # Angles close to pi exercise the near-pi branch.
    axis = RNG.normal(size=(32, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    ang = np.pi - np.abs(RNG.normal(size=(32, 1))) * 1e-3
    w = jnp.asarray(axis * ang, dtype=jnp.float32)
    R = lie.so3_exp(w)
    R2 = lie.so3_exp(lie.so3_log(R))
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)


def test_so3_exp_small_angle():
    w = rand_w(scale=1e-6)
    R = lie.so3_exp(w)
    np.testing.assert_allclose(
        np.asarray(R), np.eye(3) + np.asarray(lie.hat(w)), atol=1e-9
    )
    np.testing.assert_allclose(np.asarray(lie.so3_log(R)), np.asarray(w), atol=1e-8)


def test_right_jacobian_identity():
    # exp(w + dw) ~ exp(w) exp(Jr(w) dw)
    w = rand_w(8, scale=1.0)
    dw = rand_w(8, scale=1e-4)
    lhs = lie.so3_exp(w + dw)
    Jr = lie.so3_right_jacobian(w)
    rhs = lie.so3_exp(w) @ lie.so3_exp(jnp.einsum("...ij,...j->...i", Jr, dw))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-6)


def test_right_jacobian_inverse():
    w = rand_w(16, scale=1.5)
    J = lie.so3_right_jacobian(w)
    Jinv = lie.so3_right_jacobian_inv(w)
    np.testing.assert_allclose(
        np.asarray(J @ Jinv), np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-4
    )


def test_quat_roundtrip():
    R = lie.so3_exp(rand_w(scale=2.5))
    q = lie.rot_to_quat(R)
    R2 = lie.quat_to_rot(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
    assert np.all(np.asarray(q[..., 3]) >= 0)


def test_se3_exp_log_roundtrip():
    xi = jnp.asarray(
        np.concatenate([RNG.normal(size=(32, 3)), np.asarray(rand_w(32, 1.0))], axis=1),
        dtype=jnp.float32,
    )
    R, t = lie.se3_exp(xi)
    xi2 = lie.se3_log(R, t)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)


def test_se3_mul_inv():
    xa = jnp.asarray(RNG.normal(size=(8, 6)), dtype=jnp.float32)
    Ra, ta = lie.se3_exp(xa)
    Ri, ti = lie.se3_inv(Ra, ta)
    Re, te = lie.se3_mul(Ra, ta, Ri, ti)
    np.testing.assert_allclose(np.asarray(Re), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(te), 0.0, atol=1e-6)


def test_se3_apply_matches_matrix():
    xi = jnp.asarray(RNG.normal(size=(6,)), dtype=jnp.float32)
    R, t = lie.se3_exp(xi)
    x = jnp.asarray(RNG.normal(size=(10, 3)), dtype=jnp.float32)
    y = lie.se3_apply(R, t, x)
    y_ref = (np.asarray(R) @ np.asarray(x).T).T + np.asarray(t)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-6)


def test_sim3_exp_log_roundtrip():
    xi = jnp.asarray(
        np.concatenate(
            [RNG.normal(size=(32, 3)), np.asarray(rand_w(32, 0.8, 2.5)), RNG.normal(size=(32, 1)) * 0.8],
            axis=1,
        ),
        dtype=jnp.float32,
    )
    s, R, t = lie.sim3_exp(xi)
    xi2 = lie.sim3_log(s, R, t)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=2e-4)


def test_sim3_mul_inv_apply():
    xi = jnp.asarray(RNG.normal(size=(8, 7)) * 0.5, dtype=jnp.float32)
    s, R, t = lie.sim3_exp(xi)
    si, Ri, ti = lie.sim3_inv(s, R, t)
    se, Re, te = lie.sim3_mul(s, R, t, si, Ri, ti)
    np.testing.assert_allclose(np.asarray(se), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Re), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(te), 0.0, atol=1e-4)
    x = jnp.asarray(RNG.normal(size=(8, 3)), dtype=jnp.float32)
    y = lie.sim3_apply(s, R, t, x)
    x2 = lie.sim3_apply(si, Ri, ti, y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)


def test_sim3_reduces_to_se3():
    xi6 = jnp.asarray(RNG.normal(size=(16, 6)), dtype=jnp.float32)
    xi7 = jnp.concatenate([xi6, jnp.zeros((16, 1))], axis=-1)
    s, R, t = lie.sim3_exp(xi7)
    R_se3, t_se3 = lie.se3_exp(xi6)
    np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_se3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_se3), atol=1e-4)
