"""Trajectory import/export in TUM / EuRoC / KITTI formats.

Replaces System::SaveTrajectoryTUM (src/System.cc:628-687),
SaveTrajectoryEuRoC (:723), SaveKeyFrameTrajectoryEuRoC (:1096) and
SaveTrajectoryKITTI (:1247). Poses here are camera-to-world 4x4 (Twc);
TUM lines are `timestamp tx ty tz qx qy qz qw`.
"""

from __future__ import annotations

import numpy as np

from . import lie
import jax.numpy as jnp


def write_tum(path: str, timestamps: np.ndarray, Twc: np.ndarray, scale_ts: float = 1.0):
    """Write TUM-format trajectory. `Twc` is (N,4,4)."""
    q = np.asarray(lie.rot_to_quat(jnp.asarray(Twc[:, :3, :3])))
    t = Twc[:, :3, 3]
    with open(path, "w") as f:
        for i in range(len(timestamps)):
            f.write(
                "%.9f %.7f %.7f %.7f %.7f %.7f %.7f %.7f\n"
                % (
                    timestamps[i] * scale_ts,
                    t[i, 0], t[i, 1], t[i, 2],
                    q[i, 0], q[i, 1], q[i, 2], q[i, 3],
                )
            )


def read_tum(path: str):
    """Read TUM-format trajectory -> (timestamps, Twc (N,4,4))."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = [float(x) for x in line.replace(",", " ").split()]
            if len(vals) >= 8:
                rows.append(vals[:8])
    arr = np.asarray(rows)
    if len(arr) == 0:
        return np.zeros(0), np.zeros((0, 4, 4))
    ts = arr[:, 0]
    t = arr[:, 1:4]
    q = arr[:, 4:8]  # qx qy qz qw
    R = np.asarray(lie.quat_to_rot(jnp.asarray(q.astype(np.float32))))
    T = np.tile(np.eye(4), (len(arr), 1, 1))
    T[:, :3, :3] = R
    T[:, :3, 3] = t
    return ts, T


def write_kitti(path: str, Twc: np.ndarray):
    """KITTI format: 12 numbers per line, row-major 3x4 of Twc."""
    with open(path, "w") as f:
        for T in Twc:
            f.write(" ".join("%.9e" % x for x in T[:3, :4].reshape(-1)) + "\n")


def read_euroc_gt(path: str):
    """EuRoC ground-truth CSV (state_groundtruth_estimate0/data.csv):
    timestamp_ns, p_xyz, q_wxyz, ... -> (timestamps_s, positions)."""
    ts, pos = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            v = line.strip().split(",")
            if len(v) >= 8:
                ts.append(float(v[0]) * 1e-9)
                pos.append([float(v[1]), float(v[2]), float(v[3])])
    return np.asarray(ts), np.asarray(pos)
