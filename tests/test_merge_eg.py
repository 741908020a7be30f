"""Merge-variant essential graph (Optimizer::OptimizeEssentialGraph
merge overload, src/Optimizer.cc:1790-2109): after a weld + welding BA
corrects the seam window, the correction must propagate smoothly to the
rest of the merged-in map instead of leaving a kink at the window edge."""

import numpy as np

from orbslam3_cpp_fork_tpu.models.map_state import MapConfig, MapState
from orbslam3_cpp_fork_tpu.runtime.loop_closing import optimize_essential_graph_merge


def _make_line_map(n_kf=12, n_feat=64):
    """KFs along +x, each observing a band of landmarks shared with its
    neighbors (guarantees chain covisibility)."""
    cfg = MapConfig(max_keyframes=32, max_landmarks=512, n_features=n_feat)
    m = MapState(cfg)
    n_lm = 16 * (n_kf + 3)
    rng = np.random.default_rng(0)
    lm_pos = np.stack(
        [np.linspace(0, n_kf * 0.5, n_lm), rng.uniform(-1, 1, n_lm),
         np.full(n_lm, 5.0)], 1
    ).astype(np.float32)
    ids = m.add_landmarks(
        pos=lm_pos,
        desc_packed=rng.integers(0, 2**32, (n_lm, 8), dtype=np.uint32),
        desc_i8=np.zeros((n_lm, 256), np.int8),
        first_kf=0,
        level=np.zeros(n_lm, np.int32),
        normal=np.tile(np.array([0, 0, -1], np.float32), (n_lm, 1)),
        min_dist=np.full(n_lm, 0.5, np.float32),
        max_dist=np.full(n_lm, 50.0, np.float32),
    )
    for k in range(n_kf):
        cam_x = k * 0.5
        # Observe the 2*n_feat landmarks nearest in x, bind n_feat of them.
        near = np.argsort(np.abs(lm_pos[:, 0] - cam_x))[: n_feat]
        lm_idx = ids[near].astype(np.int32)
        m.add_keyframe(
            R=np.eye(3, dtype=np.float32),
            t=np.array([-cam_x, 0, 0], np.float32),
            xy=np.zeros((n_feat, 2), np.float32),
            level=np.zeros(n_feat, np.int32),
            angle=np.zeros(n_feat, np.float32),
            desc_packed=np.zeros((n_feat, 8), np.uint32),
            feat_valid=np.ones(n_feat, bool),
            lm_idx=lm_idx,
            timestamp=float(k),
            frame_id=k,
        )
    return m


def test_merge_eg_propagates_window_correction():
    m = _make_line_map()
    # Snapshot = the rigidly-welded (internally consistent) geometry.
    R_snap = m.kf_R.copy()
    t_snap = m.kf_t.copy()

    # "Welding BA" shifts the seam window (KFs 10, 11) by delta in y.
    delta = np.array([0.0, 0.3, 0.0], np.float32)
    for k in (10, 11):
        m.kf_t[k] = m.kf_t[k] - delta  # camera moves +y => tcw -= R @ delta

    # dst map = KFs 0..1 (fixed), window = 10..11 (fixed, already
    # corrected), free = the merged-in rest 2..9.
    free = list(range(2, 10))
    lm_before = m.lm_pos.copy()
    optimize_essential_graph_merge(m, free, R_snap, t_snap, mode="se3",
                                   covis_edge_weight=8)

    # Camera centers: c = -R^T t.
    def center(k):
        return -m.kf_R[k].T @ m.kf_t[k]

    shifts = np.array([center(k)[1] for k in range(12)])
    # Fixed vertices untouched.
    assert abs(shifts[0]) < 1e-6 and abs(shifts[1]) < 1e-6
    np.testing.assert_allclose(shifts[10], 0.3, atol=1e-3)
    # Free KFs interpolate the correction monotonically toward the window.
    assert shifts[9] > 0.15, shifts
    assert shifts[2] < shifts[9], shifts
    assert np.all(np.diff(shifts[2:11]) > -0.02), shifts
    # Landmarks anchored to free KFs moved with their anchors.
    moved = np.abs(m.lm_pos[:, 1] - lm_before[:, 1])
    assert moved[m.lm_valid].max() > 0.1
    # x geometry roughly preserved (pure-y correction; small yaw from the
    # interpolation is expected).
    np.testing.assert_allclose(
        m.lm_pos[m.lm_valid][:, 0], lm_before[m.lm_valid][:, 0], atol=0.12
    )
