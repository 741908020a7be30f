"""Camera model tests: project/unproject round-trips for pinhole+radtan
and KB8 fisheye (parity targets: src/CameraModels/{Pinhole,KannalaBrandt8}.cpp)."""

import numpy as np
import jax
import jax.numpy as jnp

from orbslam3_cpp_fork_tpu.ops.camera import Camera, project, unproject, project_jacobian, undistort_points

RNG = np.random.default_rng(1)


def rand_points(n=256, zmin=0.5, zmax=10.0, spread=0.6):
    z = RNG.uniform(zmin, zmax, size=(n, 1))
    xy = RNG.uniform(-spread, spread, size=(n, 2)) * z
    return jnp.asarray(np.concatenate([xy, z], axis=1), dtype=jnp.float32)


def euroc_pinhole():
    # EuRoC cam0 intrinsics (Examples/Monocular/EuRoC.yaml).
    return Camera.pinhole(
        458.654, 457.296, 367.215, 248.375,
        dist=(-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0),
    )


def tumvi_kb8():
    # TUM-VI 512x512 fisheye (Examples/Monocular-Inertial/TUM-VI.yaml).
    return Camera.kb8(
        190.97847715128717, 190.9733070521226, 254.93170605935475, 256.8974428996504,
        k1=0.0034823894022493434, k2=0.0007150348452162257,
        k3=-0.0020532361418706202, k4=0.00020293673591811182,
    )


def test_pinhole_ideal_roundtrip():
    cam = Camera.pinhole(458.0, 457.0, 367.0, 248.0)
    pc = rand_points()
    uv = project(cam, pc)
    b = unproject(cam, uv)
    np.testing.assert_allclose(
        np.asarray(b[..., :2]), np.asarray(pc[..., :2] / pc[..., 2:3]), atol=1e-5
    )


def test_pinhole_radtan_roundtrip():
    cam = euroc_pinhole()
    pc = rand_points(spread=0.5)
    uv = project(cam, pc)
    b = unproject(cam, uv)
    # b should align with pc direction (z=1 normalized).
    np.testing.assert_allclose(
        np.asarray(b[..., :2]), np.asarray(pc[..., :2] / pc[..., 2:3]), atol=1e-4
    )


def test_undistort_points_ideal_reproject():
    cam = euroc_pinhole()
    pc = rand_points(spread=0.4)
    uv_raw = project(cam, pc)  # distorted pixels
    uv_ideal = undistort_points(cam, uv_raw)
    # Ideal projection of the same points:
    uv_expect = project(cam, pc, distort=False)
    np.testing.assert_allclose(np.asarray(uv_ideal), np.asarray(uv_expect), atol=0.05)


def test_kb8_roundtrip():
    cam = tumvi_kb8()
    # Fisheye: wide angles allowed.
    pc = rand_points(spread=1.5)
    uv = project(cam, pc)
    b = unproject(cam, uv)
    dir_ref = np.asarray(pc) / np.linalg.norm(np.asarray(pc), axis=-1, keepdims=True)
    dir_got = np.asarray(b) / np.linalg.norm(np.asarray(b), axis=-1, keepdims=True)
    np.testing.assert_allclose(dir_got, dir_ref, atol=1e-4)


def test_pinhole_jacobian_matches_autodiff():
    cam = Camera.pinhole(458.0, 457.0, 367.0, 248.0)
    pc = rand_points(16)
    J = project_jacobian(cam, pc)
    J_ad = jax.vmap(jax.jacfwd(lambda p: project(cam, p, distort=False)))(pc)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad), atol=1e-3, rtol=1e-3)


def test_kb8_jacobian_matches_autodiff():
    cam = tumvi_kb8()
    pc = rand_points(16, spread=1.0)
    J = project_jacobian(cam, pc)
    J_ad = jax.vmap(jax.jacfwd(lambda p: project(cam, p)))(pc)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad), atol=1e-3, rtol=1e-3)
