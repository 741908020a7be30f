"""Camera models: pinhole (+ radial-tangential distortion) and
Kannala-Brandt-8 fisheye, as batched pure functions.

Replaces the reference's virtual `GeometricCamera` hierarchy
(include/CameraModels/GeometricCamera.h:49-110, src/CameraModels/
{Pinhole,KannalaBrandt8}.cpp) with a struct-of-params + vectorized
project/unproject. There is no virtual dispatch: a camera is a
`Camera` pytree with a `kind` static field, and each op is shape-
polymorphic over leading batch dims so the whole keypoint set of a frame
is processed in one fused XLA program.

Key parity points:
- KB8 unprojection uses the same Newton iteration on theta as
  src/CameraModels/KannalaBrandt8.cpp:145-176 (fixed iteration count for
  static control flow; the reference breaks at 1e-6 precision).
- Pinhole undistortion (cv::undistortPoints in Frame::UndistortKeyPoints,
  src/Frame.cc:886-943) is a fixed-point iteration on the radtan model.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

PINHOLE = "pinhole"
KANNALA_BRANDT8 = "kb8"


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Camera intrinsics.

    fx, fy, cx, cy: focal/principal point.
    dist: distortion coefficients.
      - pinhole: (k1, k2, p1, p2, k3) radial-tangential (any tail may be 0).
      - kb8: (k1, k2, k3, k4, 0) equidistant polynomial.
    kind: static — selects the model.
    """

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    dist: jax.Array
    kind: str = dataclasses.field(metadata=dict(static=True), default=PINHOLE)

    @staticmethod
    def pinhole(fx, fy, cx, cy, dist=(0.0, 0.0, 0.0, 0.0, 0.0)):
        d = jnp.zeros((5,), jnp.float32).at[: len(tuple(dist))].set(jnp.asarray(dist, jnp.float32))
        return Camera(*map(jnp.float32, (fx, fy, cx, cy)), dist=d, kind=PINHOLE)

    @staticmethod
    def kb8(fx, fy, cx, cy, k1=0.0, k2=0.0, k3=0.0, k4=0.0):
        d = jnp.asarray([k1, k2, k3, k4, 0.0], jnp.float32)
        return Camera(*map(jnp.float32, (fx, fy, cx, cy)), dist=d, kind=KANNALA_BRANDT8)

    def scaled(self, sx: float, sy: float) -> "Camera":
        """Intrinsics after resizing the image by (sx, sy)
        (Settings image-resize handling, src/Settings.cc:458)."""
        return Camera(
            fx=self.fx * sx, fy=self.fy * sy,
            cx=self.cx * sx, cy=self.cy * sy,
            dist=self.dist, kind=self.kind,
        )

    @property
    def K(self) -> jax.Array:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], -1),
                jnp.stack([z, self.fy, self.cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            -2,
        )


# ----------------------------------------------------------------------------
# Projection
# ----------------------------------------------------------------------------


def _distort_radtan(cam: Camera, xn, yn):
    k1, k2, p1, p2, k3 = (cam.dist[i] for i in range(5))
    r2 = xn * xn + yn * yn
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = xn * radial + 2.0 * p1 * xn * yn + p2 * (r2 + 2.0 * xn * xn)
    yd = yn * radial + p1 * (r2 + 2.0 * yn * yn) + 2.0 * p2 * xn * yn
    return xd, yd


def _kb8_theta_d(cam: Camera, theta):
    k1, k2, k3, k4 = (cam.dist[i] for i in range(4))
    t2 = theta * theta
    return theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))


def project(cam: Camera, pc: jax.Array, distort: bool = True) -> jax.Array:
    """Project camera-frame 3D points (...,3) to pixels (...,2).

    For pinhole with distort=False this is the ideal model used on
    *undistorted* keypoints (the reference runs the whole pipeline on
    undistorted coordinates for pinhole cameras; KB8 always projects with
    the fisheye model — src/CameraModels/KannalaBrandt8.cpp:60-80).
    """
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    if cam.kind == PINHOLE:
        xn, yn = x / z_safe, y / z_safe
        if distort:
            xn, yn = _distort_radtan(cam, xn, yn)
        u = cam.fx * xn + cam.cx
        v = cam.fy * yn + cam.cy
    else:  # KB8 fisheye (reference KannalaBrandt8::project)
        r = jnp.sqrt(x * x + y * y)
        r_safe = jnp.where(r < 1e-9, 1e-9, r)
        theta = jnp.arctan2(r, z)
        theta_d = _kb8_theta_d(cam, theta)
        u = cam.fx * theta_d * (x / r_safe) + cam.cx
        v = cam.fy * theta_d * (y / r_safe) + cam.cy
        # On-axis point: project to principal point.
        on_axis = r < 1e-9
        u = jnp.where(on_axis, cam.cx, u)
        v = jnp.where(on_axis, cam.cy, v)
    return jnp.stack([u, v], axis=-1)


def unproject(cam: Camera, uv: jax.Array, iters: int = 10) -> jax.Array:
    """Pixels (...,2) -> unit-depth bearing (...,3) with z=1.

    Pinhole: fixed-point undistortion (matches cv::undistortPoints
    semantics used by Frame::UndistortKeyPoints). KB8: Newton iteration on
    theta (src/CameraModels/KannalaBrandt8.cpp:145-176).
    """
    u = (uv[..., 0] - cam.cx) / cam.fx
    v = (uv[..., 1] - cam.cy) / cam.fy
    if cam.kind == PINHOLE:
        xn, yn = u, v

        def body(_, xy):
            x, y = xy
            xd, yd = _distort_radtan(cam, x, y)
            return (x + (u - xd), y + (v - yd))

        xn, yn = jax.lax.fori_loop(0, iters, body, (xn, yn))
        return jnp.stack([xn, yn, jnp.ones_like(xn)], axis=-1)
    else:
        theta_d = jnp.sqrt(u * u + v * v)
        theta_d_c = jnp.clip(theta_d, -jnp.pi / 2, jnp.pi / 2)
        k1, k2, k3, k4 = (cam.dist[i] for i in range(4))

        def newton(_, theta):
            t2 = theta * theta
            f = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))) - theta_d_c
            df = 1.0 + t2 * (3 * k1 + t2 * (5 * k2 + t2 * (7 * k3 + t2 * 9 * k4)))
            return theta - f / jnp.where(jnp.abs(df) < 1e-9, 1e-9, df)

        theta = jax.lax.fori_loop(0, iters, newton, theta_d_c)
        scale = jnp.where(theta_d > 1e-9, jnp.tan(theta) / jnp.where(theta_d > 1e-9, theta_d, 1.0), 1.0)
        return jnp.stack([u * scale, v * scale, jnp.ones_like(u)], axis=-1)


def project_jacobian(cam: Camera, pc: jax.Array) -> jax.Array:
    """d(uv)/d(pc): (...,2,3). Analytic for ideal pinhole; autodiff otherwise.

    The optimizer uses the ideal-pinhole Jacobian on undistorted keypoints,
    matching the reference's EdgeSE3ProjectXYZ Jacobians
    (src/OptimizableTypes.cpp; projection via GeometricCamera::projectJac).
    """
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    if cam.kind == PINHOLE:
        # Ideal pinhole Jacobian (distortion handled by undistorting obs).
        iz = 1.0 / z_safe
        iz2 = iz * iz
        zero = jnp.zeros_like(x)
        row_u = jnp.stack([cam.fx * iz, zero, -cam.fx * x * iz2], axis=-1)
        row_v = jnp.stack([zero, cam.fy * iz, -cam.fy * y * iz2], axis=-1)
        return jnp.stack([row_u, row_v], axis=-2)
    # KB8: use jacfwd of the exact model, vectorized over the batch.
    flat = pc.reshape(-1, 3)
    J = jax.vmap(jax.jacfwd(lambda p: project(cam, p)))(flat)
    return J.reshape(*pc.shape[:-1], 2, 3)


def undistort_points(cam: Camera, uv: jax.Array) -> jax.Array:
    """Map raw pixel keypoints to ideal-pinhole pixel coordinates.

    Mirrors Frame::UndistortKeyPoints (src/Frame.cc:886-943) for pinhole
    with distortion: undistort then reproject with K. For KB8 the
    reference keeps raw coordinates and projects through the native model
    inside every residual (mpCamera in the g2o edges); our batched
    optimizers use a single pinhole residual, so fisheye keypoints are
    mapped onto the ideal pinhole plane here instead. The bearing's z is
    clamped (theta <= ~84 deg) so periphery features of a ~195 deg FOV
    lens stay bounded — they become unmatched outliers rather than infs.
    """
    if cam.kind != PINHOLE:
        b = unproject(cam, uv)  # z=1 plane, radius tan(theta)
        r = jnp.sqrt(b[..., 0] ** 2 + b[..., 1] ** 2)
        s = jnp.minimum(1.0, 9.5 / jnp.maximum(r, 1e-9))  # theta <= ~84 deg
        u = cam.fx * b[..., 0] * s + cam.cx
        v = cam.fy * b[..., 1] * s + cam.cy
        return jnp.stack([u, v], axis=-1)
    b = unproject(cam, uv)
    u = cam.fx * b[..., 0] + cam.cx
    v = cam.fy * b[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


# Jit public entry points (eager dispatch is slow in this environment;
# nested use inside larger jits inlines). `kind` is a static dataclass
# field so each camera model compiles its own specialization.
project = jax.jit(project, static_argnames=("distort",))
unproject = jax.jit(unproject, static_argnames=("iters",))
project_jacobian = jax.jit(project_jacobian)
undistort_points = jax.jit(undistort_points)
project_jit = project
