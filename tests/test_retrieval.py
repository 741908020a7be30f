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
