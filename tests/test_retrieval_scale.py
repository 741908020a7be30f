"""Place-recognition validation at realistic scale (SURVEY.md §7 hard
part #5 — the online codebook is the boldest DBoW2 substitution):

- 300 keyframes across three visually-similar 'rooms' (same ring
  statistics, different content) — top-1 retrieval must land in the
  right room near the right view, under aliasing pressure;
- cold start: the codebook freezes on the first handful of keyframes;
  a loop among the first 20 KFs must still be retrievable;
- the recall margin over the acceptance threshold (min_score=0.03) is
  measured and asserted, not assumed."""

import numpy as np
import jax.numpy as jnp
import pytest

from orbslam3_cpp_fork_tpu.datasets import synthetic
from orbslam3_cpp_fork_tpu.ops.orb import OrbParams, extract_orb_jit
from orbslam3_cpp_fork_tpu.runtime.keyframe_database import KeyFrameDatabase

pytestmark = pytest.mark.slow

P = OrbParams(n_features=500)
VIEWS_PER_ROOM = 100
N_ROOMS = 3


def _feats(scene, R, t):
    f = extract_orb_jit(jnp.asarray(synthetic.render_frame(scene, R, t)), P)
    return np.asarray(f.desc_i8), np.asarray(f.valid)


@pytest.fixture(scope="module")
def big_db():
    """300-KF database over three rooms; returns (db, per-room scenes,
    trajectories)."""
    db = KeyFrameDatabase(max_keyframes=512)
    rooms = []
    for r in range(N_ROOMS):
        scene = synthetic.make_ring_scene(seed=100 + r, n_points=900,
                                          size_range=(9, 15))
        Rs, ts = synthetic.circle_trajectory(
            n_frames=VIEWS_PER_ROOM, radius=2.5, total_angle=2 * np.pi
        )
        rooms.append((scene, Rs, ts))
    k = 0
    for r, (scene, Rs, ts) in enumerate(rooms):
        for i in range(VIEWS_PER_ROOM):
            d, v = _feats(scene, Rs[i], ts[i])
            db.add(k, d, v)
            k += 1
    assert db.codebook is not None
    return db, rooms


def test_recall_at_scale(big_db):
    """Held-out queries (views offset by one frame from stored KFs, 10
    per room): top-1 must land in the correct room within +-4 views.
    Recall >= 0.8 and a positive mean margin over min_score."""
    db, rooms = big_db
    hits, margins = [], []
    for r, (scene, Rs, ts) in enumerate(rooms):
        for qi in range(5, VIEWS_PER_ROOM - 5, 10):
            d, v = _feats(scene, Rs[qi], ts[qi])
            hist = db.histogram(d, v)
            ids, scores = db.query(hist, n_best=1, min_score=-1.0)
            if len(ids) == 0:
                hits.append(False)
                continue
            top = int(ids[0])
            room_of = top // VIEWS_PER_ROOM
            view_of = top % VIEWS_PER_ROOM
            # Ring wraps: view distance modulo the loop.
            dv = min(abs(view_of - qi), VIEWS_PER_ROOM - abs(view_of - qi))
            hits.append(room_of == r and dv <= 4)
            margins.append(float(scores[0]) - 0.03)
    recall = np.mean(hits)
    assert recall >= 0.8, (recall, len(hits))
    # The accepted matches clear the loop-detection threshold with real
    # margin (document it in the assertion message for the record).
    assert np.mean(margins) > 0.05, (recall, float(np.mean(margins)))


def test_cross_room_separation(big_db):
    """Scores of same-room vs other-room candidates stay separated under
    aliasing pressure (three rooms with identical geometry statistics)."""
    db, rooms = big_db
    scene, Rs, ts = rooms[1]
    d, v = _feats(scene, Rs[50], ts[50])
    hist = db.histogram(d, v)
    ids, scores = db.query(hist, n_best=20, min_score=-1.0)
    same = [s for i, s in zip(ids, scores)
            if VIEWS_PER_ROOM <= i < 2 * VIEWS_PER_ROOM]
    other = [s for i, s in zip(ids, scores)
             if not (VIEWS_PER_ROOM <= i < 2 * VIEWS_PER_ROOM)]
    assert same and same[0] == scores.max()
    if other:
        assert same[0] > max(other) + 0.05, (same[0], max(other))


def test_cold_start_loop_in_first_20_kfs():
    """A loop among the first 20 keyframes: the codebook freezes on the
    first few frames' descriptors, and the revisit still retrieves the
    original view (cold-start behavior, keyframe_database.py:42-55)."""
    db = KeyFrameDatabase(max_keyframes=64)
    scene = synthetic.make_ring_scene(seed=42, n_points=900, size_range=(9, 15))
    Rs, ts = synthetic.circle_trajectory(n_frames=20, radius=2.5,
                                         total_angle=2 * np.pi)
    for k in range(18):
        d, v = _feats(scene, Rs[k], ts[k])
        db.add(k, d, v)
    # Query: frame 19 closes the ring next to frame 0.
    d, v = _feats(scene, Rs[19], ts[19])
    hist = db.histogram(d, v)
    assert hist is not None  # vocabulary built within the first KFs
    ids, scores = db.query(hist, exclude=np.asarray([17, 16, 15]), n_best=3)
    assert len(ids) >= 1
    assert int(ids[0]) in (0, 1, 18), (ids, scores)
