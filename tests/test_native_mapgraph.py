"""Native C++ map-graph core vs a dense-numpy model.

Exercises the incremental covisibility maintenance, spanning tree with
cull re-parenting (reference KeyFrame::UpdateConnections/SetBadFlag),
loop edges and essential-graph edge enumeration against a brute-force
incidence-matrix reference."""

import numpy as np
import pytest

from orbslam3_cpp_fork_tpu import native


@pytest.fixture(scope="module")
def lib_available():
    if native.load() is None:
        pytest.skip("no native toolchain")


def _dense_weights(obs):
    # obs: (K, L) bool incidence -> (K, K) shared-landmark counts
    w = obs.astype(np.int32) @ obs.astype(np.int32).T
    np.fill_diagonal(w, 0)
    return w


def test_incremental_covisibility_matches_dense(lib_available):
    rng = np.random.default_rng(0)
    K, L = 24, 400
    g = native.MapGraph(K, L)
    obs = np.zeros((K, L), bool)
    alive = np.zeros(K, bool)
    # random adds and removes
    for step in range(200):
        k = int(rng.integers(0, K))
        alive[k] = True
        if rng.uniform() < 0.7:
            lms = rng.integers(0, L, size=rng.integers(1, 30))
            g.add_observations(k, lms)
            obs[k, lms] = True
        else:
            have = np.nonzero(obs[k])[0]
            if len(have):
                rm = rng.choice(have, size=min(len(have), 10), replace=False)
                g.remove_observations(k, rm)
                obs[k, rm] = False
    w_ref = _dense_weights(obs)
    for k in range(K):
        if alive[k]:
            row = g.covis_row(k)
            # dense ref counts only alive counterparts
            ref = np.where(alive, w_ref[k], 0)
            ref[k] = 0
            assert np.array_equal(row, ref), k


def test_covis_neighbors_sorted(lib_available):
    rng = np.random.default_rng(1)
    K, L = 12, 300
    g = native.MapGraph(K, L)
    obs = np.zeros((K, L), bool)
    for k in range(K):
        lms = rng.integers(0, L, size=60)
        g.add_observations(k, lms)
        obs[k, lms] = True
    w = _dense_weights(obs)
    for k in range(K):
        nb = g.covis_neighbors(k, min_w=15)
        want = [i for i in np.argsort(-w[k], kind="stable") if w[k, i] >= 15 and i != k]
        ws = w[k, nb]
        assert list(ws) == sorted(ws, reverse=True)
        assert set(nb.tolist()) == set(want)


def test_landmark_removal_updates_weights(lib_available):
    g = native.MapGraph(4, 10)
    g.add_observations(0, np.array([1, 2, 3]))
    g.add_observations(1, np.array([1, 2, 4]))
    assert g.covis_weight(0, 1) == 2
    g.remove_landmark(1)
    assert g.covis_weight(0, 1) == 1
    assert g.n_obs(1) == 0
    assert 1 not in g.kf_landmarks(0).tolist()


def test_spanning_tree_and_cull_reparenting(lib_available):
    g = native.MapGraph(8, 100)
    # kf0 alone (root), kf1 shares lots with kf0, kf2 shares most with kf1
    g.add_observations(0, np.arange(0, 30))
    g.add_observations(1, np.arange(10, 40))
    g.add_observations(2, np.arange(25, 55))
    assert g.parent(0) == -1
    assert g.parent(1) == 0
    assert g.parent(2) == 1  # overlap with 1 (15) > with 0 (5)
    # cull kf1: kf2 re-parents to its best remaining neighbor (kf0)
    g.remove_keyframe(1)
    assert g.parent(2) == 0
    # weights to the dead keyframe are gone
    assert g.covis_weight(2, 1) == 0
    assert g.covis_row(2)[1] == 0


def test_essential_edges(lib_available):
    g = native.MapGraph(6, 300)
    # chain of keyframes with strong consecutive overlap
    for k in range(5):
        g.add_observations(k, np.arange(k * 40, k * 40 + 150))
    g.add_loop_edge(0, 4)
    edges = g.essential_edges(min_w=100)
    e = {tuple(x) for x in edges.tolist()}
    assert (0, 4) in e  # loop edge
    for k in range(1, 5):
        assert (min(k, g.parent(k)), max(k, g.parent(k))) in e  # spanning tree
    # high-covisibility consecutive pairs (>=100 shared)
    assert (0, 1) in e and (3, 4) in e


def test_map_state_native_consistency(lib_available):
    """MapState's native-backed covisibility must match the dense formula
    through mediated mutations AND after direct obs writes + dirty mark."""
    from orbslam3_cpp_fork_tpu.models.map_state import MapConfig, MapState

    rng = np.random.default_rng(7)
    cfg = MapConfig(max_keyframes=16, max_landmarks=512, n_features=64)
    m = MapState(cfg)
    assert m._native is not None

    def dense(k):
        w = m.obs.astype(np.int32) @ m.obs[k].astype(np.int32)
        w[k] = 0
        w[~m.kf_valid] = 0
        return w

    kfs = []
    for i in range(8):
        m.add_landmarks(
            rng.normal(size=(24, 3)).astype(np.float32),
            np.zeros((24, 8), np.uint32),
            np.zeros((24, 256), np.int8),
            first_kf=-1,
            level=np.zeros(24, np.int32),
            normal=np.tile(np.array([0, 0, 1], np.float32), (24, 1)),
            min_dist=np.full(24, 0.1, np.float32),
            max_dist=np.full(24, 10.0, np.float32),
        )
        lm_idx = np.full(64, -1, np.int32)
        # bind to existing landmarks (mix of this kf's and previous)
        valid_lms = np.nonzero(m.lm_valid)[0]
        chosen = rng.choice(valid_lms, size=min(40, len(valid_lms)), replace=False)
        lm_idx[: len(chosen)] = chosen
        k = m.add_keyframe(
            np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
            np.zeros((64, 2), np.float32), np.zeros(64, np.int32),
            np.zeros(64, np.float32), np.zeros((64, 8), np.uint32),
            np.ones(64, bool), lm_idx, float(i), i,
        )
        kfs.append(k)
    for k in kfs:
        assert np.array_equal(m.covisibility_weights(k), dense(k)), k
    # mediated removal
    m.remove_landmarks(np.nonzero(m.lm_valid)[0][:30])
    m.remove_keyframe(kfs[2])
    for k in kfs:
        if m.kf_valid[k]:
            assert np.array_equal(m.covisibility_weights(k), dense(k))
    # direct write + dirty mark -> lazy rebuild
    m.obs[kfs[0], :] = False
    m.kf_lm_idx[kfs[0]] = -1
    m.mark_obs_dirty()
    for k in kfs:
        if m.kf_valid[k]:
            assert np.array_equal(m.covisibility_weights(k), dense(k))
