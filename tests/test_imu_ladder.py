"""IMU ladder extensions: ScaleRefinement (scale/gravity-only
re-estimation, src/LocalMapping.cc:1465 + src/Optimizer.cc:3379) and
bad-IMU detection/active-map reset (src/LocalMapping.cc:170-179)."""

import numpy as np
import jax
import jax.numpy as jnp

from orbslam3_cpp_fork_tpu.optim import inertial
from orbslam3_cpp_fork_tpu.ops.camera import Camera
from orbslam3_cpp_fork_tpu.ops.orb import OrbParams
from orbslam3_cpp_fork_tpu.runtime.tracker import (
    FrameData, Sensor, Tracker, TrackerConfig, TrackState,
)

from test_inertial import make_kf_chain


def test_scale_refinement_mode_recovers_scale():
    """inertial_init with poses/velocities/biases all fixed recovers a
    residual map-scale error — the ScaleRefinement overload."""
    n_kf, kf_dt = 10, 0.5
    Rwb, p, v, pre = make_kf_chain(n_kf=n_kf, kf_dt=kf_dt)
    s_true = 1.12  # map is 12% too small: metric = s_true * map
    res = inertial.inertial_init(
        jnp.asarray(Rwb), jnp.asarray((p / s_true).astype(np.float32)),
        jnp.asarray((v / s_true).astype(np.float32)),
        jnp.arange(n_kf - 1, dtype=jnp.int32),
        jnp.arange(1, n_kf, dtype=jnp.int32),
        jnp.ones(n_kf - 1, bool), pre,
        jnp.float32(0.0), jnp.float32(0.0),
        bg0=jnp.zeros(3), ba0=jnp.zeros(3),
        iters=30, fix_bias=True, fix_vel=True,
    )
    assert abs(float(res.scale) - s_true) < 0.02, float(res.scale)
    # Gravity was already aligned: Rwg stays near identity.
    ang = np.degrees(
        np.arccos(np.clip((np.trace(np.asarray(res.Rwg)) - 1) / 2, -1, 1))
    )
    assert ang < 3.0, ang
    # Biases/velocities untouched by construction.
    np.testing.assert_allclose(np.asarray(res.bg), 0.0, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(res.vel), (v / s_true).astype(np.float32), atol=1e-9
    )


def _mini_vi_tracker():
    cam = Camera.pinhole(400.0, 400.0, 320.0, 240.0)
    cfg = TrackerConfig(
        camera=cam, width=640, height=480,
        sensor=Sensor.IMU_MONOCULAR,
        orb=OrbParams(n_features=64),
        enable_loop_closing=False,
    )
    return Tracker(cfg)


def _fake_frame(fid, ts, n=64):
    return FrameData(
        frame_id=fid, timestamp=ts,
        xy=np.zeros((n, 2), np.float32), level=np.zeros(n, np.int32),
        angle=np.zeros(n, np.float32), desc=np.zeros((n, 8), np.uint32),
        desc_i8=np.zeros((n, 256), np.int8), valid=np.ones(n, bool),
        R=np.eye(3, dtype=np.float32), t=np.zeros(3, np.float32),
        lm_idx=np.full(n, -1, np.int32),
    )


def test_bad_imu_resets_active_map():
    """Three near-stationary keyframes early after IMU init trip the
    bad-IMU guard and reset the active map."""
    tr = _mini_vi_tracker()
    m = tr.map
    n = 64
    ks = []
    for i in range(3):
        k = m.add_keyframe(
            R=np.eye(3, dtype=np.float32),
            t=np.array([0.001 * i, 0, 0], np.float32),  # ~1 mm steps
            xy=np.zeros((n, 2), np.float32), level=np.zeros(n, np.int32),
            angle=np.zeros(n, np.float32),
            desc_packed=np.zeros((n, 8), np.uint32),
            feat_valid=np.ones(n, bool), lm_idx=np.full(n, -1, np.int32),
            timestamp=float(i), frame_id=i,
        )
        ks.append(k)
    m.kf_prev[ks[1]] = ks[0]
    m.kf_prev[ks[2]] = ks[1]
    m.imu_stage = 1
    m.imu_t0 = 0.0
    old_map = tr.map
    tr._imu_ladder(_fake_frame(3, 2.0), ks[2])
    assert tr.map is not old_map or tr.map.n_keyframes() == 0
    assert tr.state == TrackState.NO_IMAGES_YET


def test_good_motion_does_not_trip_bad_imu():
    tr = _mini_vi_tracker()
    m = tr.map
    n = 64
    ks = []
    for i in range(3):
        k = m.add_keyframe(
            R=np.eye(3, dtype=np.float32),
            t=np.array([0.2 * i, 0, 0], np.float32),  # 20 cm steps
            xy=np.zeros((n, 2), np.float32), level=np.zeros(n, np.int32),
            angle=np.zeros(n, np.float32),
            desc_packed=np.zeros((n, 8), np.uint32),
            feat_valid=np.ones(n, bool), lm_idx=np.full(n, -1, np.int32),
            timestamp=float(i), frame_id=i,
        )
        ks.append(k)
    m.kf_prev[ks[1]] = ks[0]
    m.kf_prev[ks[2]] = ks[1]
    m.imu_stage = 3  # past the ladder: no VIBA reruns
    m.imu_t0 = 0.0
    old_map = tr.map
    tr._imu_ladder(_fake_frame(3, 2.0), ks[2])
    assert tr.map is old_map
    assert tr.map.n_keyframes() == 3
