"""Residual/Jacobian library for the batched GN/LM solvers.

This is the TPU equivalent of the reference's g2o edge types
(include/OptimizableTypes.h, include/G2oTypes.h): each residual is a pure
function returning (r, J...) for *all* observations at once, with analytic
Jacobians matching the reference's:

- mono reprojection (EdgeSE3ProjectXYZOnlyPose / EdgeSE3ProjectXYZ)
- stereo reprojection with virtual right u-coordinate (EdgeStereoSE3...)
- inertial 9-dof preintegration residual (EdgeInertial, src/G2oTypes.cc)
- bias random walk (EdgeGyroRW/EdgeAccRW), priors (EdgePriorPoseImu)

Pose convention: Tcw = (R, t) world->camera; the tangent update is
left-multiplicative, T' = exp(xi) * T with xi = (rho, phi), matching
g2o::VertexSE3Expmap. Landmark updates are additive in world coordinates.

Robust weighting: Huber with the reference's deltas
(sqrt(5.991) mono, sqrt(7.815) stereo) implemented as IRLS weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import lie
from ..ops import imu as imu_ops

CHI2_MONO = 5.991
CHI2_STEREO = 7.815


def huber_weight(chi2: jax.Array, delta2: float) -> jax.Array:
    """IRLS weight of the Huber kernel on squared error chi2."""
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))


def mono_reprojection(
    R: jax.Array,
    t: jax.Array,
    Xw: jax.Array,
    uv: jax.Array,
    fx,
    fy,
):
    """Batched mono residual + Jacobians.

    R,t: broadcastable pose(s); Xw (N,3); uv (N,2) ideal-pinhole pixels.
    Returns r (N,2), J_pose (N,2,6), J_point (N,2,3), z (N,).
    """
    pc = lie.se3_apply(R, t, Xw)
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    z_safe = jnp.where(z < 1e-6, 1e-6, z)
    iz = 1.0 / z_safe
    u = fx * x * iz
    v = fy * y * iz
    # uv given relative to principal point? No: caller passes uv already
    # centered (uv_centered = uv_px - (cx, cy)) so the residual is linear
    # in fx, fy only.
    r = jnp.stack([u, v], axis=-1) - uv
    zero = jnp.zeros_like(x)
    iz2 = iz * iz
    # d(u,v)/d(pc)
    Jproj = jnp.stack(
        [
            jnp.stack([fx * iz, zero, -fx * x * iz2], axis=-1),
            jnp.stack([zero, fy * iz, -fy * y * iz2], axis=-1),
        ],
        axis=-2,
    )  # (N,2,3)
    # d(pc)/d(xi) with left-mult update: [I | -hat(pc)]
    Jx = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (*pc.shape[:-1], 3, 3)),
            -lie.hat(pc),
        ],
        axis=-1,
    )  # (N,3,6)
    J_pose = Jproj @ Jx  # (N,2,6)
    J_point = Jproj @ jnp.broadcast_to(R, (*pc.shape[:-1], 3, 3))  # (N,2,3)
    return r, J_pose, J_point, z


def stereo_reprojection(
    R: jax.Array,
    t: jax.Array,
    Xw: jax.Array,
    uvr: jax.Array,
    fx,
    fy,
    bf,
):
    """Stereo residual (u, v, u_right): u_r = u - bf/z
    (reference EdgeStereoSE3ProjectXYZ). uvr (N,3) centered obs.
    Returns r (N,3), J_pose (N,3,6), J_point (N,3,3), z (N,)."""
    pc = lie.se3_apply(R, t, Xw)
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    z_safe = jnp.where(z < 1e-6, 1e-6, z)
    iz = 1.0 / z_safe
    iz2 = iz * iz
    u = fx * x * iz
    v = fy * y * iz
    ur = u - bf * iz
    r = jnp.stack([u, v, ur], axis=-1) - uvr
    zero = jnp.zeros_like(x)
    Jproj = jnp.stack(
        [
            jnp.stack([fx * iz, zero, -fx * x * iz2], axis=-1),
            jnp.stack([zero, fy * iz, -fy * y * iz2], axis=-1),
            jnp.stack([fx * iz, zero, (-fx * x + bf) * iz2], axis=-1),
        ],
        axis=-2,
    )  # (N,3,3)
    Jx = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (*pc.shape[:-1], 3, 3)),
            -lie.hat(pc),
        ],
        axis=-1,
    )
    J_pose = Jproj @ Jx
    J_point = Jproj @ jnp.broadcast_to(R, (*pc.shape[:-1], 3, 3))
    return r, J_pose, J_point, z


def stereo_reprojection_body(
    Rwb: jax.Array,
    twb: jax.Array,
    Xw: jax.Array,
    uvr: jax.Array,
    Rcb: jax.Array,
    tcb: jax.Array,
    fx,
    fy,
    bf,
):
    """Reprojection residual parameterized by the world->body pose used in
    visual-inertial optimization (reference EdgeMono/EdgeStereo over
    VertexPose, include/G2oTypes.h:366-528).

    The body state uses the reference's ImuCamPose::Update convention:
    Rwb <- Rwb Exp(dphi), twb <- twb + Rwb dp (right-multiplicative).
    Rcb/tcb map body->camera coordinates (pc = Rcb x_b + tcb).

    Returns r (N,3), J_pose (N,3,6) wrt [dphi, dp], J_point (N,3,3), z.
    Mono rows: caller masks the third row.
    """
    y = jnp.einsum("...ji,...j->...i", Rwb, Xw - twb)  # body coords (N,3)
    pc = jnp.einsum("ij,...j->...i", Rcb, y) + tcb
    x, yy, z = pc[..., 0], pc[..., 1], pc[..., 2]
    z_safe = jnp.where(z < 1e-6, 1e-6, z)
    iz = 1.0 / z_safe
    iz2 = iz * iz
    u = fx * x * iz
    v = fy * yy * iz
    ur = u - bf * iz
    r = jnp.stack([u, v, ur], axis=-1) - uvr
    zero = jnp.zeros_like(x)
    Jproj = jnp.stack(
        [
            jnp.stack([fx * iz, zero, -fx * x * iz2], axis=-1),
            jnp.stack([zero, fy * iz, -fy * yy * iz2], axis=-1),
            jnp.stack([fx * iz, zero, (-fx * x + bf) * iz2], axis=-1),
        ],
        axis=-2,
    )  # (N,3,3)
    # dpc/dphi = Rcb hat(y); dpc/dp = -Rcb; dpc/dXw = Rcb Rwb^T.
    dpc_dphi = jnp.einsum("ij,...jk->...ik", Rcb, lie.hat(y))
    dpc_dp = jnp.broadcast_to(-Rcb, (*pc.shape[:-1], 3, 3))
    J_pose = jnp.concatenate([Jproj @ dpc_dphi, Jproj @ dpc_dp], axis=-1)
    Rcw = jnp.einsum("ij,...kj->...ik", Rcb, Rwb)
    J_point = Jproj @ jnp.broadcast_to(Rcw, (*pc.shape[:-1], 3, 3))
    return r, J_pose, J_point, z


def inertial_residual(
    Rwb1, p1, v1, bg, ba, Rwb2, p2, v2, pre: imu_ops.Preintegrated
):
    """9-dim preintegration residual (EdgeInertial::computeError,
    src/G2oTypes.cc): [er, ev, ep] between body states 1 and 2.

    States are world-frame body poses (Rwb, p) and velocities v; biases
    (bg, ba) are the state-1 linearization point.
    Returns r (9,) and the information matrix (9,9) from the
    preintegrated covariance.
    """
    dT = pre.dT
    g = imu_ops.GRAVITY_VEC
    dR = imu_ops.delta_rotation(pre, bg)
    dV = imu_ops.delta_velocity(pre, bg, ba)
    dP = imu_ops.delta_position(pre, bg, ba)
    er = lie.so3_log(dR.T @ Rwb1.T @ Rwb2)
    ev = Rwb1.T @ (v2 - v1 - g * dT) - dV
    ep = Rwb1.T @ (p2 - p1 - v1 * dT - 0.5 * g * dT * dT) - dP
    r = jnp.concatenate([er, ev, ep])
    # Information: inverse of the 9x9 preintegration covariance
    # (reference: Cholesky inverse of C[:9,:9], symmetrized).
    C = pre.C[:9, :9] + jnp.eye(9) * 1e-9
    info = jnp.linalg.inv(C)
    info = 0.5 * (info + info.T)
    return r, info
