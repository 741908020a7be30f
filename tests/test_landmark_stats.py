"""Vectorized MapPoint statistics (models/map_state.py
update_landmark_stats) vs a straightforward per-landmark reference
implementation of ComputeDistinctiveDescriptors + UpdateNormalAndDepth
(src/MapPoint.cc:376-541)."""

import numpy as np

from orbslam3_cpp_fork_tpu.models.map_state import (
    MapConfig, MapState, N_LEVELS, SCALE_FACTOR,
)


def _reference_stats(m, lm):
    ks = np.nonzero(m.obs[:, lm])[0]
    descs, dirs, levels = [], [], []
    for k in ks:
        f = np.nonzero(m.kf_lm_idx[k] == lm)[0]
        if len(f) == 0:
            continue
        f = f[0]
        descs.append(m.kf_desc[k, f])
        cam_center = -m.kf_R[k].T @ m.kf_t[k]
        d = m.lm_pos[lm] - cam_center
        dirs.append(d / max(np.linalg.norm(d), 1e-9))
        levels.append(int(m.kf_level[k, f]))
    D = np.array(descs)
    x = D[:, None, :] ^ D[None, :, :]
    dist = np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)
    # Lower-middle median, exactly as the reference: vDists[0.5*(N-1)]
    # (src/MapPoint.cc:438) — NOT np.median's average-of-middles.
    ds = np.sort(dist, axis=1)
    med = ds[:, (dist.shape[1] - 1) // 2]
    best = int(np.argmin(med))
    normal = np.mean(dirs, axis=0)
    normal = normal / max(np.linalg.norm(normal), 1e-9)
    k_ref = ks[-1]
    f = np.nonzero(m.kf_lm_idx[k_ref] == lm)[0][0]
    lvl = int(m.kf_level[k_ref, f])
    cam_center = -m.kf_R[k_ref].T @ m.kf_t[k_ref]
    dist_ref = np.linalg.norm(m.lm_pos[lm] - cam_center)
    return (
        D[best], normal, lvl,
        dist_ref * SCALE_FACTOR**lvl * 1.2,
        dist_ref * SCALE_FACTOR ** (lvl - N_LEVELS + 1) / 1.2,
    )


def test_vectorized_stats_match_reference():
    rng = np.random.default_rng(0)
    cfg = MapConfig(max_keyframes=16, max_landmarks=128, n_features=32)
    m = MapState(cfg)
    n_lm, nf = 60, 32
    ids = m.add_landmarks(
        pos=rng.uniform(-3, 3, (n_lm, 3)).astype(np.float32),
        desc_packed=rng.integers(0, 2**32, (n_lm, 8), dtype=np.uint32),
        desc_i8=np.zeros((n_lm, 256), np.int8),
        first_kf=0, level=np.zeros(n_lm, np.int32),
        normal=np.tile(np.array([0, 0, 1], np.float32), (n_lm, 1)),
        min_dist=np.full(n_lm, 0.1, np.float32),
        max_dist=np.full(n_lm, 10.0, np.float32),
    )
    for k in range(8):
        take = rng.permutation(n_lm)[:nf]
        m.add_keyframe(
            R=np.eye(3, dtype=np.float32),
            t=rng.normal(0, 1, 3).astype(np.float32),
            xy=rng.uniform(0, 100, (nf, 2)).astype(np.float32),
            level=rng.integers(0, N_LEVELS, nf).astype(np.int32),
            angle=np.zeros(nf, np.float32),
            desc_packed=rng.integers(0, 2**32, (nf, 8), dtype=np.uint32),
            feat_valid=np.ones(nf, bool),
            lm_idx=ids[take].astype(np.int32),
            timestamp=float(k), frame_id=k,
        )

    expect = {int(lm): _reference_stats(m, lm) for lm in ids
              if m.obs[:, lm].any()}
    m.update_landmark_stats(ids)
    for lm, (desc, normal, lvl, maxd, mind) in expect.items():
        np.testing.assert_array_equal(m.lm_desc[lm], desc)
        np.testing.assert_allclose(m.lm_normal[lm], normal, atol=1e-5)
        assert m.lm_level[lm] == lvl
        np.testing.assert_allclose(m.lm_max_dist[lm], maxd, rtol=1e-5)
        np.testing.assert_allclose(m.lm_min_dist[lm], mind, rtol=1e-5)
