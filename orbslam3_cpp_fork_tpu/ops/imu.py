"""On-manifold IMU preintegration as a `lax.scan` over measurement batches.

Replaces IMU::Preintegrated (include/ImuTypes.h:150-250,
src/ImuTypes.cc:202-261) with a functional state carried through scan:

  state = (dR, dV, dP, C15, JRg, JVg, JVa, JPg, JPa, dT)

`IntegrateNewMeasurement`'s A/B covariance propagation, the bias
Jacobians, and the bias-corrected delta getters
(GetDeltaRotation/Velocity/Position) are reproduced exactly; gravity is
GRAVITY_VALUE = 9.81 (include/ImuTypes.h:37).

Measurements are padded to a static capacity with a validity mask so each
frame's preintegration compiles once regardless of IMU count.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..utils import lie

GRAVITY = 9.81
GRAVITY_VEC = jnp.array([0.0, 0.0, -GRAVITY], dtype=jnp.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ImuCalib:
    """Noise densities already scaled to per-sample sigmas (the reference
    multiplies by sqrt(freq) at Settings load, src/Settings.cc:387-414)."""

    sigma_gyro: jax.Array  # rad/s/sqrt(Hz) * sqrt(freq)
    sigma_acc: jax.Array
    walk_gyro: jax.Array
    walk_acc: jax.Array
    Tbc_R: jax.Array  # body-from-camera rotation (3,3)
    Tbc_t: jax.Array  # (3,)

    @staticmethod
    def create(ng, na, wg, wa, freq, Tbc_R=None, Tbc_t=None):
        sf = float(freq) ** 0.5
        return ImuCalib(
            sigma_gyro=jnp.float32(ng * sf),
            sigma_acc=jnp.float32(na * sf),
            walk_gyro=jnp.float32(wg / sf),
            walk_acc=jnp.float32(wa / sf),
            Tbc_R=jnp.eye(3) if Tbc_R is None else jnp.asarray(Tbc_R, jnp.float32),
            Tbc_t=jnp.zeros(3) if Tbc_t is None else jnp.asarray(Tbc_t, jnp.float32),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Preintegrated:
    """Preintegrated deltas between two frames/keyframes."""

    dR: jax.Array  # (3,3)
    dV: jax.Array  # (3,)
    dP: jax.Array  # (3,)
    C: jax.Array  # (15,15) covariance [rot, vel, pos, gyro-walk, acc-walk]
    JRg: jax.Array  # (3,3) d(dR)/d(bg)
    JVg: jax.Array
    JVa: jax.Array
    JPg: jax.Array
    JPa: jax.Array
    dT: jax.Array  # scalar total time
    bias_gyro: jax.Array  # (3,) linearization bias
    bias_acc: jax.Array

    @staticmethod
    def identity(bias_gyro=None, bias_acc=None):
        z3 = jnp.zeros(3, jnp.float32)
        return Preintegrated(
            dR=jnp.eye(3, dtype=jnp.float32),
            dV=z3,
            dP=z3,
            C=jnp.zeros((15, 15), jnp.float32),
            JRg=jnp.zeros((3, 3), jnp.float32),
            JVg=jnp.zeros((3, 3), jnp.float32),
            JVa=jnp.zeros((3, 3), jnp.float32),
            JPg=jnp.zeros((3, 3), jnp.float32),
            JPa=jnp.zeros((3, 3), jnp.float32),
            dT=jnp.float32(0.0),
            bias_gyro=z3 if bias_gyro is None else bias_gyro,
            bias_acc=z3 if bias_acc is None else bias_acc,
        )


def integrate(
    state: Preintegrated,
    acc: jax.Array,
    gyro: jax.Array,
    dt: jax.Array,
    valid: jax.Array,
    calib: ImuCalib,
) -> Preintegrated:
    """One measurement step (IntegrateNewMeasurement, src/ImuTypes.cc:202-261)."""
    a = acc - state.bias_acc
    w = gyro - state.bias_gyro

    dR, dV, dP = state.dR, state.dV, state.dP
    dt2 = dt * dt

    # Position/velocity first (use dR before update, like the reference).
    new_dP = dP + dV * dt + 0.5 * (dR @ a) * dt2
    new_dV = dV + (dR @ a) * dt

    # A/B for covariance on [rot, vel, pos] (9x9 blocks).
    Wa = lie.hat(a)
    A = jnp.eye(9, dtype=jnp.float32)
    A = A.at[3:6, 0:3].set(-dR @ Wa * dt)
    A = A.at[6:9, 0:3].set(-0.5 * dR @ Wa * dt2)
    A = A.at[6:9, 3:6].set(jnp.eye(3) * dt)
    B = jnp.zeros((9, 6), jnp.float32)
    B = B.at[3:6, 3:6].set(dR * dt)
    B = B.at[6:9, 3:6].set(0.5 * dR * dt2)

    # Rotation update.
    dRi = lie.so3_exp(w * dt)
    Jr = lie.so3_right_jacobian(w * dt)
    new_dR = lie.so3_normalize(dR @ dRi)
    A = A.at[0:3, 0:3].set(dRi.T)
    B = B.at[0:3, 0:3].set(Jr * dt)

    Nga = jnp.zeros((6, 6), jnp.float32)
    Nga = Nga.at[0:3, 0:3].set(jnp.eye(3) * calib.sigma_gyro**2)
    Nga = Nga.at[3:6, 3:6].set(jnp.eye(3) * calib.sigma_acc**2)
    NgaWalk = jnp.zeros((6, 6), jnp.float32)
    NgaWalk = NgaWalk.at[0:3, 0:3].set(jnp.eye(3) * calib.walk_gyro**2)
    NgaWalk = NgaWalk.at[3:6, 3:6].set(jnp.eye(3) * calib.walk_acc**2)

    C = state.C
    C9 = A @ C[:9, :9] @ A.T + B @ Nga @ B.T
    Cw = C[9:, 9:] + NgaWalk * dt
    new_C = C.at[:9, :9].set(C9).at[9:, 9:].set(Cw)

    # Bias Jacobians (same update order as the reference).
    new_JPa = state.JPa + state.JVa * dt - 0.5 * dR * dt2
    new_JPg = state.JPg + state.JVg * dt - 0.5 * dR @ Wa @ state.JRg * dt2
    new_JVa = state.JVa - dR * dt
    new_JVg = state.JVg - dR @ Wa @ state.JRg * dt
    new_JRg = dRi.T @ state.JRg - Jr * dt

    new = Preintegrated(
        dR=new_dR,
        dV=new_dV,
        dP=new_dP,
        C=new_C,
        JRg=new_JRg,
        JVg=new_JVg,
        JVa=new_JVa,
        JPg=new_JPg,
        JPa=new_JPa,
        dT=state.dT + dt,
        bias_gyro=state.bias_gyro,
        bias_acc=state.bias_acc,
    )
    # Masked step: padded measurements leave the state unchanged.
    return jax.tree.map(lambda n, o: jnp.where(valid, n, o), new, state)


@jax.jit
def preintegrate(
    acc: jax.Array,
    gyro: jax.Array,
    dts: jax.Array,
    valid: jax.Array,
    calib: ImuCalib,
    bias_gyro: jax.Array,
    bias_acc: jax.Array,
    init: Preintegrated | None = None,
) -> Preintegrated:
    """Scan over a padded measurement window: acc/gyro (T,3), dts (T,),
    valid (T,). Replaces Tracking::PreintegrateIMU's per-measurement loop
    (src/Tracking.cc:1615-1711). Pass `init` to continue a running
    preintegration (the incremental mpImuPreintegratedFromLastKF)."""
    if init is None:
        init = Preintegrated.identity(bias_gyro, bias_acc)

    def step(s, x):
        a, g, dt, v = x
        return integrate(s, a, g, dt, v, calib), None

    out, _ = jax.lax.scan(step, init, (acc, gyro, dts, valid))
    return out


def delta_rotation(p: Preintegrated, bias_gyro: jax.Array) -> jax.Array:
    """Bias-corrected dR (GetDeltaRotation, src/ImuTypes.cc:283)."""
    db = bias_gyro - p.bias_gyro
    return lie.so3_normalize(p.dR @ lie.so3_exp(p.JRg @ db))


def delta_velocity(p: Preintegrated, bias_gyro, bias_acc) -> jax.Array:
    dbg = bias_gyro - p.bias_gyro
    dba = bias_acc - p.bias_acc
    return p.dV + p.JVg @ dbg + p.JVa @ dba


def delta_position(p: Preintegrated, bias_gyro, bias_acc) -> jax.Array:
    dbg = bias_gyro - p.bias_gyro
    dba = bias_acc - p.bias_acc
    return p.dP + p.JPg @ dbg + p.JPa @ dba


def predict_state(
    R1: jax.Array,
    p1: jax.Array,
    v1: jax.Array,
    pre: Preintegrated,
    bias_gyro: jax.Array,
    bias_acc: jax.Array,
):
    """Dead-reckoned world-frame state after the interval
    (Tracking::PredictStateIMU, src/Tracking.cc:1712-1772)."""
    t = pre.dT
    R2 = lie.so3_normalize(R1 @ delta_rotation(pre, bias_gyro))
    v2 = v1 + GRAVITY_VEC * t + R1 @ delta_velocity(pre, bias_gyro, bias_acc)
    p2 = (
        p1
        + v1 * t
        + 0.5 * GRAVITY_VEC * t * t
        + R1 @ delta_position(pre, bias_gyro, bias_acc)
    )
    return R2, p2, v2


delta_rotation = jax.jit(delta_rotation)
delta_velocity = jax.jit(delta_velocity)
delta_position = jax.jit(delta_position)
predict_state = jax.jit(predict_state)
