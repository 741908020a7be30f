"""Lie groups SO(3), SE(3), Sim(3) for pose estimation on TPU.

Replaces the vendored Sophus library (reference:
Thirdparty/Sophus/sophus/{so3,se3,sim3}.hpp) with a small, batched,
jit/vmap/grad-friendly JAX module. Rotations are stored as 3x3 matrices
(the natural layout for batched matmul on the MXU); quaternion helpers are
provided for trajectory export (TUM format stores qx qy qz qw).

All functions broadcast over arbitrary leading batch dimensions and use
Taylor-series fallbacks near theta = 0 selected with `jnp.where` on safe
operands, so gradients are finite everywhere.

Conventions match the reference:
- `so3_exp` is the matrix exponential of `hat(w)` (reference
  IMU::IntegratedRotation, src/ImuTypes.cc:100-120).
- right Jacobian Jr(w) as in src/ImuTypes.cc:51-75 (RightJacobianSO3).
- SE(3) poses are (R, t) acting as x -> R @ x + t; `Tcw` maps world to
  camera like the reference's Sophus::SE3f mTcw.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jax.Array) -> jax.Array:
    """so(3) hat operator: w (...,3) -> skew-symmetric (...,3,3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jax.Array) -> jax.Array:
    """Inverse of hat: (...,3,3) -> (...,3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _theta(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Angle and a zero-safe angle (for division) of a tangent vector."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    safe = jnp.where(theta < _EPS, 1.0, theta)
    return theta, safe


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues formula: (...,3) tangent -> (...,3,3) rotation.

    Taylor branches use theta^2 = sum(w*w) directly (NOT theta**2 with
    theta from sqrt): sqrt has a NaN tangent at 0, and 0 * NaN = NaN
    would poison forward-mode autodiff through the small-angle branch
    even though jnp.where selects it."""
    theta, safe = _theta(w)
    theta2 = jnp.sum(w * w, axis=-1)
    W = hat(w)
    WW = W @ W
    small = theta < 1e-4
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks.
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(safe) / safe)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe)) / safe**2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * WW


def so3_log(R: jax.Array) -> jax.Array:
    """Matrix log: (...,3,3) rotation -> (...,3) tangent, |w| in [0, pi].

    Computed via the quaternion (Shepperd extraction picks the
    best-conditioned component, and the quaternion log is well-conditioned
    at *all* angles including near pi, unlike the R - R^T formula).
    """
    q = rot_to_quat(R)
    xyz = q[..., :3]
    w = q[..., 3]  # >= 0 by construction, so theta in [0, pi]
    n = jnp.linalg.norm(xyz, axis=-1)
    theta = 2.0 * jnp.arctan2(n, w)
    small = n < 1e-6
    n_safe = jnp.where(small, 1.0, n)
    # theta/n -> 2/w for n -> 0 (w -> 1).
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 0.5), theta / n_safe)
    return xyz * scale[..., None]


def so3_right_jacobian(w: jax.Array) -> jax.Array:
    """Jr(w): d/d(dw) log(exp(w) exp(dw)) at dw=0 (src/ImuTypes.cc:51-63)."""
    theta, safe = _theta(w)
    theta2 = jnp.sum(w * w, axis=-1)
    W = hat(w)
    WW = W @ W
    small = theta < 1e-4
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe)) / safe**2)
    c = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (safe - jnp.sin(safe)) / safe**3
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - b[..., None, None] * W + c[..., None, None] * WW


def so3_right_jacobian_inv(w: jax.Array) -> jax.Array:
    """Jr(w)^-1 (src/ImuTypes.cc:65-75)."""
    theta, safe = _theta(w)
    theta2 = jnp.sum(w * w, axis=-1)
    W = hat(w)
    WW = W @ W
    small = theta < 1e-4
    # 1/theta^2 - (1+cos)/(2 theta sin)
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        1.0 / safe**2 - (1.0 + jnp.cos(safe)) / (2.0 * safe * jnp.sin(jnp.where(jnp.abs(jnp.sin(safe)) < _EPS, 1.0, safe))),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + 0.5 * W + cot_term[..., None, None] * WW


def so3_left_jacobian(w: jax.Array) -> jax.Array:
    """Jl(w) = Jr(-w)."""
    return so3_right_jacobian(-w)


def so3_normalize(R: jax.Array) -> jax.Array:
    """Re-orthonormalize a drifting rotation via quaternion round-trip
    (reference NormalizeRotation, src/ImuTypes.cc:46-50 uses SVD; the
    quaternion path is cheaper and equivalent to first order)."""
    return quat_to_rot(rot_to_quat(R))


# ----------------------------------------------------------------------------
# Quaternions (x, y, z, w) — the TUM-trajectory storage order.
# ----------------------------------------------------------------------------


def rot_to_quat(R: jax.Array) -> jax.Array:
    """(...,3,3) -> unit quaternion (...,4) as (x,y,z,w), w >= 0."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four branch-free candidates (Shepperd's method), pick the best-conditioned.
    qw2 = jnp.maximum(0.0, 1.0 + tr)
    qx2 = jnp.maximum(0.0, 1.0 + m00 - m11 - m22)
    qy2 = jnp.maximum(0.0, 1.0 - m00 + m11 - m22)
    qz2 = jnp.maximum(0.0, 1.0 - m00 - m11 + m22)
    # candidate assuming w largest
    cw = jnp.stack([m21 - m12, m02 - m20, m10 - m01, qw2], axis=-1)
    cx = jnp.stack([qx2, m10 + m01, m02 + m20, m21 - m12], axis=-1)
    cy = jnp.stack([m10 + m01, qy2, m21 + m12, m02 - m20], axis=-1)
    cz = jnp.stack([m02 + m20, m21 + m12, qz2, m10 - m01], axis=-1)
    mags = jnp.stack([qx2, qy2, qz2, qw2], axis=-1)
    k = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cx, cy, cz, cw], axis=-2)  # (...,4cand,4)
    q = jnp.take_along_axis(cands, k[..., None, None].repeat(4, -1), axis=-2).squeeze(-2)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonical sign: w >= 0.
    return jnp.where(q[..., 3:4] < 0, -q, q)


def quat_to_rot(q: jax.Array) -> jax.Array:
    """Unit quaternion (x,y,z,w) -> rotation matrix."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1)
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


# ----------------------------------------------------------------------------
# SE(3): poses as (R: (...,3,3), t: (...,3)).
# ----------------------------------------------------------------------------


def se3_identity(batch_shape=(), dtype=jnp.float32):
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
    t = jnp.zeros((*batch_shape, 3), dtype=dtype)
    return R, t


def se3_exp(xi: jax.Array) -> tuple[jax.Array, jax.Array]:
    """xi = (rho, phi) (...,6) -> (R, t). t = Jl(phi) @ rho."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    t = jnp.einsum("...ij,...j->...i", so3_left_jacobian(phi), rho)
    return R, t


def se3_log(R: jax.Array, t: jax.Array) -> jax.Array:
    phi = so3_log(R)
    Jl_inv = so3_right_jacobian_inv(-phi)
    rho = jnp.einsum("...ij,...j->...i", Jl_inv, t)
    return jnp.concatenate([rho, phi], axis=-1)


def se3_mul(Ra, ta, Rb, tb):
    """(Ra,ta) * (Rb,tb)."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def se3_inv(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_apply(R, t, x):
    """Transform points x (...,3)."""
    return jnp.einsum("...ij,...j->...i", R, x) + t


# ----------------------------------------------------------------------------
# Sim(3): (s: (...,), R: (...,3,3), t: (...,3)); x -> s R x + t.
# Used by loop closing / map merging (reference Sim3Solver, OptimizeEssentialGraph).
# ----------------------------------------------------------------------------


def sim3_identity(batch_shape=(), dtype=jnp.float32):
    R, t = se3_identity(batch_shape, dtype)
    return jnp.ones(batch_shape, dtype=dtype), R, t


def sim3_mul(sa, Ra, ta, sb, Rb, tb):
    return sa * sb, Ra @ Rb, sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def sim3_inv(s, R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return s_inv, Rt, -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t)


def sim3_apply(s, R, t, x):
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, x) + t


def sim3_exp(xi: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """xi = (rho, phi, sigma) (...,7) -> (s, R, t).

    Closed-form W matrix from the Sim(3) exponential (Strasdat's thesis;
    reference Thirdparty/Sophus/sophus/sim3.hpp).
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(phi)
    theta, safe_t = _theta(phi)
    W = hat(phi)
    WW = W @ W
    eps = 1e-5
    small_s = jnp.abs(sigma) < eps
    small_t = theta < eps
    safe_s = jnp.where(small_s, 1.0, sigma)

    # Coefficients of V = A*I + B*W + C*WW such that t = V rho.
    c0 = jnp.where(small_s, 1.0 + sigma / 2.0 + sigma**2 / 6.0, (s - 1.0) / safe_s)

    # generic both:
    denom = safe_s**2 + safe_t**2
    a_ = s * jnp.sin(safe_t)
    b_ = s * jnp.cos(safe_t)
    c1_gen = (a_ * safe_s + (1.0 - b_) * safe_t) / (safe_t * denom)
    c2_gen = (c0 - ((b_ - 1.0) * safe_s + a_ * safe_t) / denom) / (safe_t**2)
    # sigma small, theta generic:
    c1_s0 = (1.0 - jnp.cos(safe_t)) / safe_t**2
    c2_s0 = (safe_t - jnp.sin(safe_t)) / safe_t**3
    # theta small, sigma generic:
    c1_t0 = jnp.where(
        small_s, 0.5 + sigma / 3.0, ((safe_s - 1.0) * s + 1.0) / safe_s**2
    )
    c2_t0 = jnp.where(
        small_s,
        1.0 / 6.0 + sigma / 8.0,
        (s * (0.5 * safe_s**2 - safe_s + 1.0) - 1.0) / safe_s**3,
    )

    C1 = jnp.where(small_t, c1_t0, jnp.where(small_s, c1_s0, c1_gen))
    C2 = jnp.where(small_t, c2_t0, jnp.where(small_s, c2_s0, c2_gen))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    V = c0[..., None, None] * eye + C1[..., None, None] * W + C2[..., None, None] * WW
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return s, R, t


def sim3_log(s: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """Inverse of sim3_exp via solving V rho = t."""
    sigma = jnp.log(s)
    phi = so3_log(R)
    xi0 = jnp.concatenate(
        [jnp.zeros_like(t), phi, sigma[..., None]], axis=-1
    )
    # Build V with the same coefficients used in sim3_exp, then solve.
    _, _, t_unit = sim3_exp(xi0.at[..., :3].set(0.0))
    del t_unit
    # Recompute V by calling sim3_exp on basis vectors is wasteful; instead
    # reconstruct V explicitly (same code path as sim3_exp).
    theta, safe_t = _theta(phi)
    W = hat(phi)
    WW = W @ W
    eps = 1e-5
    small_s = jnp.abs(sigma) < eps
    small_t = theta < eps
    safe_s = jnp.where(small_s, 1.0, sigma)
    c0 = jnp.where(small_s, 1.0 + sigma / 2.0 + sigma**2 / 6.0, (s - 1.0) / safe_s)
    denom = safe_s**2 + safe_t**2
    a_ = s * jnp.sin(safe_t)
    b_ = s * jnp.cos(safe_t)
    c1_gen = (a_ * safe_s + (1.0 - b_) * safe_t) / (safe_t * denom)
    c2_gen = (c0 - ((b_ - 1.0) * safe_s + a_ * safe_t) / denom) / (safe_t**2)
    c1_s0 = (1.0 - jnp.cos(safe_t)) / safe_t**2
    c2_s0 = (safe_t - jnp.sin(safe_t)) / safe_t**3
    c1_t0 = jnp.where(small_s, 0.5 + sigma / 3.0, ((safe_s - 1.0) * s + 1.0) / safe_s**2)
    c2_t0 = jnp.where(
        small_s,
        1.0 / 6.0 + sigma / 8.0,
        (s * (0.5 * safe_s**2 - safe_s + 1.0) - 1.0) / safe_s**3,
    )
    C1 = jnp.where(small_t, c1_t0, jnp.where(small_s, c1_s0, c1_gen))
    C2 = jnp.where(small_t, c2_t0, jnp.where(small_s, c2_s0, c2_gen))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), W.shape)
    V = c0[..., None, None] * eye + C1[..., None, None] * W + C2[..., None, None] * WW
    rho = jnp.linalg.solve(V, t[..., None]).squeeze(-1)
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


# Jit the public entry points: plain eager dispatch compiles every
# primitive separately (very slow in this environment), while jitted
# calls get one cached executable per shape and inline when nested
# inside larger jitted programs.
for _n in (
    "so3_exp", "so3_log", "so3_right_jacobian", "so3_right_jacobian_inv",
    "so3_left_jacobian", "so3_normalize", "rot_to_quat", "quat_to_rot",
    "se3_exp", "se3_log", "se3_mul", "se3_inv", "se3_apply",
    "sim3_mul", "sim3_inv", "sim3_apply", "sim3_exp", "sim3_log",
):
    globals()[_n] = jax.jit(globals()[_n])
del _n
