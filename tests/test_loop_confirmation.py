"""3-consecutive-KF loop confirmation (src/LoopClosing.cc:407): a
transiently aliased place — one that validates geometrically on one or
two keyframes but not persistently — must NOT close a loop. A false
loop closure is catastrophic (it welds unrelated geometry), which is
why the reference demands three consecutive validations."""

import numpy as np

from orbslam3_cpp_fork_tpu.models.map_state import MapConfig, MapState
from orbslam3_cpp_fork_tpu.runtime.loop_closing import LoopCloser, LoopConfig


class _FakeAtlas:
    def __init__(self, m):
        self.maps = [m]

    @property
    def active(self):
        return self.maps[0]


class _FakeKFDB:
    """Always retrieves candidate KF 0 for any query."""

    def __init__(self, gid):
        self.gid = gid

    def histogram(self, bits, valid):
        return np.ones(8, np.float32)

    def query(self, hist, exclude=None, n_best=3, min_score=0.0):
        return np.asarray([self.gid]), np.asarray([0.9])

    def query_groups(self, hist, covis, exclude=None, n_best=3,
                     min_score=0.0, **kw):
        return np.asarray([self.gid]), np.asarray([0.9])

    def add(self, gid, bits, valid, hist=None):
        pass

    def adaptive_floor(self, hist, exclude=None, z=2.0, min_n=8):
        return None  # too few rows: detection falls back to the fixed floor


class _ScriptedCloser(LoopCloser):
    """LoopCloser whose geometric validation follows a script: element i
    is the validation outcome for the i-th processed keyframe (None =
    reject; number = projection-match count) — applied to BOTH the fresh
    BoW validation and the propagated-Sim3 re-validation paths.
    Corrections are recorded instead of applied."""

    def __init__(self, atlas, kfdb, script, cfg):
        super().__init__(atlas, kfdb, 400.0, 400.0, 320.0, 240.0, cfg)
        self.script = list(script)
        self.calls = 0
        self.corrected = []
        self._cur = None

    def process_keyframe(self, k):
        self._cur = self.script[min(self.calls, len(self.script) - 1)]
        out = super().process_keyframe(k)
        self.calls += 1
        return out

    def _validate_candidate(self, k, c, m_c=None):
        if self._cur is None:
            return None
        return (
            1.0, np.eye(3, dtype=np.float32), np.zeros(3, np.float32), self._cur
        )

    def _projection_matches(self, k, c, s, R, t, m_c=None):
        return 0 if self._cur is None else self._cur

    def _correct_loop(self, k, c, s, R, t):
        self.corrected.append((k, c))
        self.last_loop_kf = k


def _make_map(n_kf=20):
    cfg = MapConfig(max_keyframes=64, max_landmarks=256, n_features=8)
    m = MapState(cfg)
    for i in range(n_kf):
        m.add_keyframe(
            R=np.eye(3, dtype=np.float32),
            t=np.array([-0.1 * i, 0, 0], np.float32),
            xy=np.zeros((8, 2), np.float32), level=np.zeros(8, np.int32),
            angle=np.zeros(8, np.float32), desc_packed=np.zeros((8, 8), np.uint32),
            feat_valid=np.ones(8, bool), lm_idx=np.full(8, -1, np.int32),
            timestamp=float(i), frame_id=i,
        )
    return m


def _run(script):
    m = _make_map()
    atlas = _FakeAtlas(m)
    closer = _ScriptedCloser(
        atlas, _FakeKFDB(gid=0), script,
        LoopConfig(min_kfs=2, kf_gap_after_loop=0),
    )
    for k in range(12, 12 + len(script)):
        closer.process_keyframe(k)
    return closer


def test_two_consecutive_validations_do_not_close():
    """Transient alias: validates strongly twice, then the geometry
    diverges. With the old 2-KF rule this closed a FALSE loop."""
    closer = _run([120, 120, None, None, None])
    assert closer.corrected == []
    assert closer.pending is None


def test_three_consecutive_validations_close():
    closer = _run([120, 120, 120, None])
    assert len(closer.corrected) == 1


def test_interrupted_streak_resets():
    """validate, validate, miss, validate, validate: never 3 in a row."""
    closer = _run([120, 120, None, 120, 120, None, None])
    assert closer.corrected == []


def test_weak_validations_count_toward_streak():
    """Three consecutive weak-but-sufficient validations confirm."""
    closer = _run([55, 55, 55])
    assert len(closer.corrected) == 1
