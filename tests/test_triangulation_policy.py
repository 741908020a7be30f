"""New-landmark geometry policy (runtime.tracker.triangulate_and_check).

Regression for a systematic stereo drift: two-view DLT on a short
keyframe baseline amplifies pixel noise into biased depths. The
reference arbitrates per candidate between DLT and stereo-rig
unprojection by comparing ray parallax against the rig parallax
cos(2*atan2(b/2, z)) (LocalMapping::CreateNewMapPoints,
src/LocalMapping.cc:417-742). Without that policy a stereo tracker
accumulated ~15% scale drift over 40 frames (the map stretched along
track); with it, <1% (see test_stereo sequence tests).
"""

import jax.numpy as jnp
import numpy as np

from orbslam3_cpp_fork_tpu.runtime.tracker import triangulate_and_check

FX = 459.0
K = np.array([[FX, 0, 320.0], [0, FX, 240.0], [0, 0, 1.0]], np.float32)
BF = 0.11 * FX


def _project(K, R, t, X):
    pc = X @ R.T + t
    uv = pc @ K.T
    return (uv[:, :2] / uv[:, 2:3]).astype(np.float32), pc[:, 2]


def _setup(kf_baseline, z, n=64, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    X = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(z - 1, z + 1, n)],
        -1,
    ).astype(np.float32)
    R1 = np.eye(3, dtype=np.float32)
    t1 = np.zeros(3, np.float32)
    R2 = np.eye(3, dtype=np.float32)
    t2 = np.array([-kf_baseline, 0, 0], np.float32)  # cam2 at +x
    uv1, z1 = _project(K, R1, t1, X)
    uv2, z2 = _project(K, R2, t2, X)
    uv1 += rng.normal(0, noise, uv1.shape).astype(np.float32)
    uv2 += rng.normal(0, noise, uv2.shape).astype(np.float32)
    return X, R1, t1, R2, t2, uv1, uv2, z1, z2


def _run(kf_baseline, z, z_st_err=0.0, stereo=True, noise=0.0):
    X, R1, t1, R2, t2, uv1, uv2, z1, z2 = _setup(kf_baseline, z, noise=noise)
    n = len(X)
    z_st1 = (z1 * (1 + z_st_err)).astype(np.float32) if stereo else np.full(n, -1.0, np.float32)
    z_st2 = (z2 * (1 + z_st_err)).astype(np.float32) if stereo else np.full(n, -1.0, np.float32)
    ur1 = (uv1[:, 0] - BF / np.maximum(z_st1, 1e-6)).astype(np.float32) if stereo else np.full(n, -1.0, np.float32)
    ur2 = (uv2[:, 0] - BF / np.maximum(z_st2, 1e-6)).astype(np.float32) if stereo else np.full(n, -1.0, np.float32)
    Xo, good = triangulate_and_check(
        jnp.asarray(R1), jnp.asarray(t1), jnp.asarray(R2), jnp.asarray(t2),
        jnp.asarray(K), jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.ones(n, jnp.float32), jnp.ones(n, jnp.float32),
        jnp.asarray(z_st1), jnp.asarray(z_st2),
        jnp.asarray(ur1), jnp.asarray(ur2),
        jnp.float32(BF), jnp.ones(n, jnp.float32),
        jnp.ones(n, bool),
    )
    return X, np.asarray(Xo), np.asarray(good)


def test_low_parallax_uses_rig_depth():
    # KF baseline 0.03 m << rig baseline 0.11 m at z=6: ray parallax is
    # weaker than the rig's, so the rig unprojection must win. Detect it
    # by biasing the rig depth 5%: output depth must follow the rig.
    X, Xo, good = _run(kf_baseline=0.03, z=6.0, z_st_err=0.05)
    assert good.sum() > 40
    rel = (Xo[good, 2] - X[good, 2]) / X[good, 2]
    np.testing.assert_allclose(rel, 0.05, atol=0.01)


def test_high_parallax_uses_dlt():
    # KF baseline 1.0 m >> rig baseline: DLT wins; a biased rig depth
    # must NOT leak into the output.
    X, Xo, good = _run(kf_baseline=1.0, z=6.0, z_st_err=0.05)
    assert good.sum() > 40
    rel = np.abs(Xo[good, 2] - X[good, 2]) / X[good, 2]
    assert np.median(rel) < 0.005


def test_mono_features_still_triangulate():
    X, Xo, good = _run(kf_baseline=1.0, z=6.0, stereo=False)
    assert good.sum() > 40
    np.testing.assert_allclose(Xo[good], X[good], rtol=1e-2, atol=1e-2)


def test_mono_low_parallax_rejected():
    # No stereo depth available and near-zero baseline: nothing usable.
    _, _, good = _run(kf_baseline=1e-5, z=6.0, stereo=False)
    assert good.sum() == 0


def test_stereo_chi2_gate_rejects_bad_ur():
    # Consistent uv but wildly wrong ur on camera 1 -> stereo chi2 gate
    # must reject (the reference checks the 3D residual, :660-680).
    X, R1, t1, R2, t2, uv1, uv2, z1, z2 = _setup(1.0, 6.0)
    n = len(X)
    z_st1 = z1.astype(np.float32)
    ur1 = (uv1[:, 0] - BF / z_st1 + 25.0).astype(np.float32)  # broken
    z_st2 = z2.astype(np.float32)
    ur2 = (uv2[:, 0] - BF / z_st2).astype(np.float32)
    _, good = triangulate_and_check(
        jnp.asarray(R1), jnp.asarray(t1), jnp.asarray(R2), jnp.asarray(t2),
        jnp.asarray(K), jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.ones(n, jnp.float32), jnp.ones(n, jnp.float32),
        jnp.asarray(z_st1), jnp.asarray(z_st2),
        jnp.asarray(ur1), jnp.asarray(ur2),
        jnp.float32(BF), jnp.ones(n, jnp.float32),
        jnp.ones(n, bool),
    )
    assert np.asarray(good).sum() == 0
