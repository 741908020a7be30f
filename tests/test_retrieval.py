"""Place-recognition recall test (the validation SURVEY.md §2.8 demands
for replacing the DBoW2 vocabulary): with the online-built codebook,
querying a revisited place must rank the right keyframe first, well
above unrelated places."""

import numpy as np
import jax.numpy as jnp

from orbslam3_cpp_fork_tpu.datasets import synthetic
from orbslam3_cpp_fork_tpu.ops.orb import OrbParams, extract_orb_jit
from orbslam3_cpp_fork_tpu.runtime.keyframe_database import KeyFrameDatabase


def _feats(scene, R, t, p):
    f = extract_orb_jit(jnp.asarray(synthetic.render_frame(scene, R, t)), p)
    return np.asarray(f.desc_i8), np.asarray(f.valid)


def test_revisit_ranks_first():
    p = OrbParams(n_features=500)
    db = KeyFrameDatabase(max_keyframes=32)
    scene = synthetic.make_ring_scene(seed=2)
    Rs, ts = synthetic.circle_trajectory(n_frames=36, total_angle=2 * np.pi)

    # Insert every-30-degree views as "keyframes" 0..11.
    for k, i in enumerate(range(0, 36, 3)):
        d, v = _feats(scene, Rs[i], ts[i], p)
        db.add(k, d, v)
    assert db.codebook is not None  # online vocab built

    # Query: a view 10 degrees after KF 0 — same place.
    dq, vq = _feats(scene, Rs[1], ts[1], p)
    hist = db.histogram(dq, vq)
    ids, scores = db.query(hist, n_best=3, min_score=0.0)
    assert ids[0] == 0, (ids, scores)

    # Unrelated places (90-270 degrees) must score well below.
    all_scores = np.full(12, -1.0)
    ids_all, sc_all = db.query(hist, n_best=12, min_score=-1.0)
    all_scores[ids_all] = sc_all
    distant = all_scores[3:10]
    assert all_scores[0] > distant.max() + 0.05, (all_scores[0], distant.max())


def test_query_excludes():
    p = OrbParams(n_features=500)
    db = KeyFrameDatabase(max_keyframes=32)
    scene = synthetic.make_ring_scene(seed=4)
    Rs, ts = synthetic.circle_trajectory(n_frames=12, total_angle=2 * np.pi)
    feats = [_feats(scene, Rs[k], ts[k], p) for k in range(12)]
    for k, (d, v) in enumerate(feats):
        db.add(k, d, v)
    hist = db.histogram(*feats[0])
    ids, scores = db.query(hist, exclude=np.asarray([0, 1, 11]), n_best=3, min_score=-1.0)
    assert all(i not in (0, 1, 11) for i in ids)
    # With the query's own place and both adjacent views excluded,
    # nothing similar remains: all scores below the default acceptance
    # threshold (a default query would return no candidates).
    assert len(ids) >= 1
    assert scores.max() < 0.03, (ids, scores)
    # And without exclusion the same query returns its own keyframe.
    ids2, _ = db.query(hist, n_best=1, min_score=0.0)
    assert ids2[0] == 0


def test_codebook_refresh_cross_scene():
    """Atlas-scale codebook lifecycle (VERDICT r3 item 6): scene B's
    keyframes are indexed under a codebook whose seed sample came
    entirely from scene A's first keyframes. After refresh_codebook
    (re-trained on the accumulated A+B corpus, every stored keyframe
    re-histogrammed) the aggregate recall over BOTH scenes must not be
    worse than under the frozen scene-A seed codebook — and a scene-B
    revisit must rank the right scene-B keyframe first."""
    p = OrbParams(n_features=500)
    scene_a = synthetic.make_ring_scene(seed=11)
    scene_b = synthetic.make_ring_scene(seed=12, n_points=700)
    Rs, ts = synthetic.circle_trajectory(n_frames=36, total_angle=2 * np.pi)
    feats_a = [_feats(scene_a, Rs[i], ts[i], p) for i in range(36)]
    feats_b = [_feats(scene_b, Rs[i], ts[i], p) for i in range(36)]

    db = KeyFrameDatabase(max_keyframes=64)
    for k, i in enumerate(range(0, 36, 3)):
        db.add(k, *feats_a[i])
    assert db.codebook is not None  # seeded entirely from scene A
    for k, i in enumerate(range(0, 36, 3)):
        db.add(12 + k, *feats_b[i])

    def recall():
        """Fraction of revisit queries (10 deg past each keyframe, both
        scenes) whose top in-scene hit is the right keyframe."""
        hits = 0
        for feats, base in ((feats_a, 0), (feats_b, 12)):
            for q in range(12):
                hist = db.histogram(*feats[q * 3 + 1])
                ids, sc = db.query(hist, n_best=24, min_score=-1.0)
                s = np.full(24, -1.0)
                s[ids] = sc
                hits += s[base + q] == s[base:base + 12].max()
        return hits / 24.0

    r_frozen = recall()
    db.refresh_codebook()
    assert db.n_refreshes == 1
    r_refreshed = recall()
    assert r_refreshed >= r_frozen, (r_refreshed, r_frozen)

    # Scene-B revisit resolves to the right keyframe post-refresh.
    hist = db.histogram(*feats_b[1])
    ids, scores = db.query(hist, n_best=3, min_score=0.0)
    assert ids[0] == 12, (ids, scores)


def test_pending_flush_before_vocab():
    """Keyframes added before the vocabulary exists are indexed once it
    is built (pending-flush path)."""
    p = OrbParams(n_features=300)
    db = KeyFrameDatabase(max_keyframes=8, n_words=1024)
    scene = synthetic.make_ring_scene(seed=6)
    Rs, ts = synthetic.circle_trajectory(n_frames=8, total_angle=2 * np.pi)
    d0, v0 = _feats(scene, Rs[0], ts[0], p)
    db.add(0, d0, v0)  # ~300 descriptors < 1024: no vocab yet
    assert db.codebook is None and not db.present[0]
    for k in range(1, 5):
        d, v = _feats(scene, Rs[k], ts[k], p)
        db.add(k, d, v)
    assert db.codebook is not None
    assert db.present[0]  # flushed retroactively


def test_relative_floor_tracks_distribution():
    """VERDICT r4 item 7: the loop-validation floor must be RELATIVE.
    Measured here: refresh_codebook shifts the whole idf-cosine
    distribution (true-revisit score 0.21 -> 0.13, aliases 0.01 ->
    0.05 on this ring), so the old fixed 0.12 floor would reject every
    true candidate post-refresh while a lower fixed floor would admit
    the aliases pre-refresh. The adaptive floor (robust outlier bound
    of the query's score distribution, the analog of the reference's
    covisible-derived minScore, src/KeyFrameDatabase.cc:92-115) must
    separate the true first-lap candidate from distant aliases under
    the seed codebook, after refresh, and on the noisy render tier."""
    p = OrbParams(n_features=500)
    scene = synthetic.make_ring_scene(seed=21)
    # Two identical laps: rows 0..11 = first lap (every 30 deg), rows
    # 12..23 = second lap at the same angles (the revisit pass).
    Rs, ts = synthetic.circle_trajectory(n_frames=72, total_angle=4 * np.pi)

    def run_tier(degraded):
        def feats(i, seed=0):
            img = synthetic.render_frame(scene, Rs[i], ts[i])
            if degraded:
                img = synthetic.degrade(
                    img, noise_sigma=4.0, blur_sigma=0.4, seed=seed
                )
            f = extract_orb_jit(jnp.asarray(img), p)
            return np.asarray(f.desc_i8), np.asarray(f.valid)

        db = KeyFrameDatabase(max_keyframes=64)
        for k, i in enumerate(range(0, 72, 3)):
            db.add(k, *feats(i, seed=k))

        def check():
            d, v = feats(40, seed=99)  # 40 deg, lap 2
            hist = db.histogram(d, v)
            # Detection excludes the temporally recent pass (12..23).
            excl = np.arange(12, 24)
            floor = db.adaptive_floor(hist, exclude=excl)
            assert floor is not None
            floor = max(0.03, floor)
            ids, scores = db.query(
                hist, exclude=excl, n_best=24, min_score=-1.0
            )
            s = dict(zip(ids.tolist(), scores.tolist()))
            s_true = s.get(1)  # first-lap 30 deg: the loop candidate
            assert s_true is not None and s_true >= floor, (s_true, floor)
            distant = [v2 for k2, v2 in s.items() if 3 <= k2 <= 9]
            assert max(distant) < floor, (max(distant), floor)

        check()  # seed codebook
        db.refresh_codebook()
        assert db.n_refreshes == 1
        check()  # wholesale distribution shift

    run_tier(degraded=False)
    run_tier(degraded=True)  # noisy render tier
