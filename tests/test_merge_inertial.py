"""MergeInertialBA (Optimizer::MergeInertialBA, src/Optimizer.cc:
3919-4456): after an inertial map weld, the VI BA over the two temporal
chains around the seam — tied only by fused landmarks and each chain's
own preintegration edges — must pull the welded-in chain's residual
seam error out."""

import numpy as np
import pytest

from orbslam3_cpp_fork_tpu.ops.camera import Camera
from orbslam3_cpp_fork_tpu.ops.orb import OrbParams
from orbslam3_cpp_fork_tpu.runtime.tracker import (
    ImuSettings, Sensor, Tracker, TrackerConfig,
)

from test_inertial import G_W
from test_vi_tracking_e2e import BOB_A, BOB_W, OMEGA, RADIUS, bob_state

IMU_HZ = 200.0


def _imu_rows_between(t0, t1):
    n = max(int(round((t1 - t0) * IMU_HZ)), 1)
    dt = (t1 - t0) / n
    rows = []
    for i in range(n):
        t = t0 + (i + 0.5) * dt
        Rwb, _, _, a_w, w_body = bob_state(t)
        rows.append(np.concatenate([[dt], Rwb.T @ (a_w - G_W), w_body]))
    return np.asarray(rows, np.float32)


def test_merge_inertial_ba_fixes_seam():
    fx = fy = 400.0
    cx, cy = 320.0, 240.0
    nf = 128
    cfg = TrackerConfig(
        camera=Camera.pinhole(fx, fy, cx, cy), width=640, height=480,
        sensor=Sensor.IMU_MONOCULAR, orb=OrbParams(n_features=nf),
        imu=ImuSettings(freq=IMU_HZ),
        enable_loop_closing=False, async_mapping=False,
    )
    tr = Tracker(cfg)
    m = tr.map
    m.imu_stage = 3
    rng = np.random.default_rng(0)

    # Landmarks on the ring wall, visible from the circle's interior.
    n_lm = 256
    th = rng.uniform(0, 2 * np.pi, n_lm)
    r_lm = rng.uniform(8, 12, n_lm)
    Xw = np.stack(
        [r_lm * np.cos(th), r_lm * np.sin(th), rng.uniform(-2, 2, n_lm)], 1
    ).astype(np.float32)
    ids = m.add_landmarks(
        pos=Xw,
        desc_packed=rng.integers(0, 2**32, (n_lm, 8), dtype=np.uint32),
        desc_i8=np.zeros((n_lm, 256), np.int8),
        first_kf=0, level=np.zeros(n_lm, np.int32),
        normal=(-Xw / np.linalg.norm(Xw, axis=1, keepdims=True)).astype(np.float32),
        min_dist=np.full(n_lm, 0.5, np.float32),
        max_dist=np.full(n_lm, 50.0, np.float32),
    )

    # Two temporal chains on the same bobbing circle: A = t in [0,2.5],
    # B = t in [3.0,5.5] (a blind gap between; no preintegration across).
    # Chain B carries a seam offset delta (the residual weld error).
    delta = np.array([0.06, -0.04, 0.05], np.float32)
    kf_t = {}
    ks = []
    prev = -1
    t_chain = [0.0, 0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 3.5, 4.0, 4.5, 5.0, 5.5]
    for i, t in enumerate(t_chain):
        is_b = i >= 6
        Rwb, p, v, _, _ = bob_state(t)
        # Observations are generated from the TRUE pose (what the camera
        # actually saw, rebound to the merged map's landmarks), while the
        # STORED pose carries the residual weld offset — the seam tension
        # MergeInertialBA exists to remove.
        Rcw = Rwb.T.astype(np.float32)
        tcw_true = (-Rwb.T @ p).astype(np.float32)
        tcw = (-Rwb.T @ (p + delta)).astype(np.float32) if is_b else tcw_true
        pc = Xw @ Rcw.T + tcw_true
        vis = np.nonzero(pc[:, 2] > 0.5)[0]
        uv = np.stack(
            [fx * pc[vis, 0] / pc[vis, 2] + cx,
             fy * pc[vis, 1] / pc[vis, 2] + cy], 1
        )
        inb = (uv[:, 0] > 0) & (uv[:, 0] < 640) & (uv[:, 1] > 0) & (uv[:, 1] < 480)
        vis = vis[inb][:nf]
        xy = np.zeros((nf, 2), np.float32)
        lm_idx = np.full(nf, -1, np.int32)
        nv = len(vis)
        xy[:nv] = np.stack(
            [fx * pc[vis, 0] / pc[vis, 2] + cx,
             fy * pc[vis, 1] / pc[vis, 2] + cy], 1
        ) + rng.normal(0, 0.3, (nv, 2))
        lm_idx[:nv] = ids[vis]
        k = m.add_keyframe(
            R=Rcw, t=tcw, xy=xy, level=np.zeros(nf, np.int32),
            angle=np.zeros(nf, np.float32),
            desc_packed=rng.integers(0, 2**32, (nf, 8), dtype=np.uint32),
            feat_valid=np.concatenate([np.ones(nv, bool), np.zeros(nf - nv, bool)]),
            lm_idx=lm_idx, timestamp=t, frame_id=i,
        )
        ks.append(k)
        kf_t[k] = t
        if i == 6:
            prev = -1  # chain break: no preintegration across the gap
        raw = _imu_rows_between(t_chain[i - 1], t) if prev >= 0 else None
        m.set_keyframe_inertial(
            k, v.astype(np.float32), np.zeros(3, np.float32),
            np.zeros(3, np.float32), prev, raw,
        )
        prev = k

    # Seam error before: chain-B camera centers are offset by |delta|.
    def center(k):
        return -m.kf_R[k].T @ m.kf_t[k]

    def seam_err():
        errs = []
        for i, k in enumerate(ks[6:], start=6):
            _, p_gt, _, _, _ = bob_state(t_chain[i])
            errs.append(np.linalg.norm(center(k) - p_gt))
        return float(np.mean(errs))

    err0 = seam_err()
    assert err0 > 0.05  # the injected offset
    tr._merge_inertial_ba(k_new=ks[-1], c=ks[5])
    err1 = seam_err()
    assert err1 < 0.5 * err0, (err0, err1)
    # Chain A's gauge held (its poses barely move).
    for i, k in enumerate(ks[:3]):
        _, p_gt, _, _, _ = bob_state(t_chain[i])
        assert np.linalg.norm(center(k) - p_gt) < 0.02
