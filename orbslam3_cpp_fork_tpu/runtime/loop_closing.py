"""Loop detection + correction.

Host-orchestrated redesign of the LoopClosing thread
(src/LoopClosing.cc): every heavy stage is a batched device program —
signature query (one matvec), descriptor matching (one MXU matmul),
Sim3 RANSAC (all hypotheses vmapped), Sim3 refinement (GN), guided
projection verification (masked dense match), essential-graph
optimization (optim/pose_graph.py).

Pipeline per keyframe (NewDetectCommonRegions :328 + CorrectLoop :1062):
 1. guards: enough KFs, distance from last correction
 2. KeyFrameDatabase query excluding the covisible group
 3. geometric validation per candidate:
      descriptor match on landmark-bound features  (SearchByBoW analog)
      -> Sim3 RANSAC on matched camera-frame points  (Sim3Solver)
      -> Sim3 GN refinement                          (OptimizeSim3)
      -> guided projection of the candidate window's landmarks
         into the current KF                          (SearchByProjection)
 4. temporal consistency: the hypothesis must validate on
    `LoopConfig.consecutive_kfs` (3, like the reference :407)
    consecutive keyframes at >= min_proj_weak guided-projection
    matches before it is acted on; each new KF first re-validates the
    pending hypothesis through the tracked relative motion
    (DetectAndReffineSim3FromLastKF :567) and only falls back to a
    fresh database query when none is pending
 5. correction: propagate the corrective Sim3 through the current
    covisible window, re-anchor their landmarks, fuse duplicates
    against the loop window (SearchAndFuse :2175), then essential-graph
    optimization over all keyframes (temporal chain + covisibility
    edges + the new loop edge) and landmark re-anchoring.
"""

from __future__ import annotations

import dataclasses
import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.map_state import LEVEL_SIGMA2, MapState, N_LEVELS
from ..ops import matching, ransac
from ..optim import pose_graph, sim3_opt
from ..utils import lie
from .keyframe_database import KeyFrameDatabase

log = logging.getLogger("orbslam3_tpu.loop")

# Padded landmark capacity for guided-projection verification: fixed
# shapes keep one compiled program across keyframes (variable-length
# inputs would recompile nearly every call on TPU).
_PROJ_CAP = 4096


@jax.jit
def _match_loop_pair(bits_k, bound_k, angle_k, bits_c, bound_c, angle_c):
    """SearchByBoW-analog matching between two keyframes' landmark-bound
    features (ratio 0.75, rotation histogram) as ONE device program."""
    dist = matching.hamming_matrix(bits_k, bits_c)
    idx, ok = matching.match_nn(
        dist, bound_k, bound_c, max_dist=matching.TH_LOW, ratio=0.75,
        cross_check=True,
    )
    ok = matching.rotation_consistency(angle_k, angle_c, idx, ok)
    return idx, ok


@jax.jit
def _unpack_bits(d):
    """(...,8) uint32 packed descriptors -> (...,256) int8 on device."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    b = (d[..., :, None] >> shifts) & jnp.uint32(1)
    return b.reshape(*d.shape[:-1], 256).astype(jnp.int8)


@jax.jit
def _proj_count(
    lm_desc, okp, uv, lvl, rad, kf_desc, kf_xy, kf_level, kf_valid
):
    """Guided-projection match count with packed descriptors unpacked on
    device; returns one scalar (a single small fetch)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)

    def unpack(d):
        b = (d[..., :, None] >> shifts) & jnp.uint32(1)
        return b.reshape(*d.shape[:-1], 256).astype(jnp.int8)

    idx, mok = matching.search_by_projection(
        unpack(lm_desc), okp, uv, lvl,
        unpack(kf_desc), kf_xy, kf_level, kf_valid, rad,
        max_dist=matching.TH_HIGH, ratio=0.95, level_band=1,
    )
    return jnp.sum(mok.astype(jnp.int32))


@partial(jax.jit, static_argnames=("fix_scale",))
def _validate_candidate_fused(
    bits_k, bound_k, angle_k, pc_k_all, uv_k_all, sig_k_all,
    bits_c, bound_c, angle_c, pc_c_all, uv_c_all, sig_c_all,
    w_desc, w_pos, w_maxd, w_ok,
    R_c, t_c,
    kf_desc_k, kf_xy_k, kf_level_k, kf_valid_k,
    key, fx, fy, cx, cy, width, height,
    fix_scale: bool,
):
    """The WHOLE geometric loop-candidate validation as ONE device
    program: BoW-style matching -> Sim3 RANSAC -> Sim3 GN refine ->
    guided projection count (the chain the reference runs across
    Sim3Solver + OptimizeSim3 + SearchByProjection,
    src/LoopClosing.cc:632-646). As four separate dispatches each
    synchronous fetch paid the tunneled ~25 ms RTT; validation runs at
    nearly every keyframe on the revisit half of a loopy trajectory, so
    the stage cost directly gates mapping throughput. Downstream stages
    compute on garbage when an upstream gate fails — the host applies
    the thresholds to the returned counters instead of branching
    mid-program.

    pc_*_all/uv_*_all/sig_*_all are PER-FEATURE tables (landmark
    camera-frame position / centered pixel / sigma^2 of the feature's
    bound landmark, zeros where unbound) so all match-dependent gathers
    happen on device. w_* are the candidate's window landmarks padded
    to a fixed cap for the projection count."""
    from ..ops import ransac as _ransac
    from ..optim import sim3_opt as _sim3_opt
    from ..models.map_state import SCALE_FACTOR as _SF

    dist = matching.hamming_matrix(bits_k, bits_c)
    idx, ok = matching.match_nn(
        dist, bound_k, bound_c, max_dist=matching.TH_LOW, ratio=0.75,
        cross_check=True,
    )
    ok = matching.rotation_consistency(angle_k, angle_c, idx, ok)
    n_bow = jnp.sum(ok.astype(jnp.int32))

    pc_k = pc_k_all
    pc_c = pc_c_all[idx]
    s0, R0, t0, _, n_ransac, ok_r = _ransac.sim3_ransac(
        pc_c, pc_k, ok, key, fix_scale=fix_scale
    )
    res = _sim3_opt.optimize_sim3(
        s0, R0, t0, pc_k, pc_c, uv_k_all, uv_c_all[idx],
        sig_k_all, sig_c_all[idx], ok, fx, fy, fix_scale=fix_scale,
    )
    s, R, t = res.s, res.R, res.t

    # Corrected pose S_kw = S_kc o T_cw; project the candidate window.
    R_kw = R @ R_c
    t_kw = s * (R @ t_c) + t
    pc = (w_pos @ R_kw.T) * s + t_kw
    z = pc[:, 2]
    zs = jnp.maximum(z, 1e-6)
    u = fx * pc[:, 0] / zs + cx
    v = fy * pc[:, 1] / zs + cy
    okp = (
        w_ok & (z > 0.05)
        & (u >= 0) & (u < width) & (v >= 0) & (v < height)
    )
    uv = jnp.stack([u, v], -1)
    # PredictScale + scale-banded radius (MapPoint::PredictScale,
    # src/MapPoint.cc:557) with distances in candidate-map units.
    dist_w = jnp.linalg.norm(pc, axis=-1) / jnp.maximum(s, 1e-9)
    ratio = jnp.maximum(w_maxd / jnp.maximum(dist_w, 1e-9), 1e-9)
    lvl = jnp.clip(
        jnp.ceil(jnp.log(ratio) / jnp.log(_SF)), 0, N_LEVELS - 1
    ).astype(jnp.int32)
    rad = (8.0 * _SF ** lvl.astype(jnp.float32)).astype(jnp.float32)
    idx_p, mok_p = matching.search_by_projection(
        _unpack_bits(w_desc), okp, uv, lvl,
        _unpack_bits(kf_desc_k), kf_xy_k, kf_level_k, kf_valid_k, rad,
        max_dist=matching.TH_HIGH, ratio=0.95, level_band=1,
    )
    n_proj = jnp.sum(mok_p.astype(jnp.int32))
    return dict(
        n_bow=n_bow, ok_r=ok_r, n_ransac=n_ransac,
        s=s, R=R, t=t, n_opt=res.n_inliers, n_proj=n_proj,
    )


@dataclasses.dataclass
class LoopConfig:
    min_kfs: int = 12  # guard (src/LoopClosing.cc:361)
    min_bow_matches: int = 20  # nBoWMatches (:642)
    min_ransac_inliers: int = 12  # nBoWInliers=15 relaxed: RANSAC is pre-refine
    min_sim3_inliers: int = 20  # nSim3Inliers (:645)
    min_proj_weak: int = 50  # nProjMatches (:646)
    min_proj_strong: int = 80  # nProjOptMatches refined-accept bar
    covis_edge_weight: int = 100  # minFeat essential-graph covis edges (:1522)
    kf_gap_after_loop: int = 10
    # Temporal consistency: the same region must validate on this many
    # consecutive keyframes before correction (src/LoopClosing.cc:407).
    consecutive_kfs: int = 3
    fix_scale: bool = False  # stereo/RGB-D/inertial
    # Retrieval-score floor below which a candidate is not worth the
    # geometric validation (a ~50-100 ms Sim3 RANSAC + projection
    # program per candidate). The PRIMARY floor is RELATIVE — a robust
    # outlier bound on the query's own score distribution
    # (KeyFrameDatabase.adaptive_floor, the analog of the reference's
    # covisible-derived minScore, src/KeyFrameDatabase.cc:92-115) — so
    # the gate tracks the idf-cosine distribution across scenes,
    # codebook refreshes and noise tiers. min_candidate_score is only
    # the FALLBACK when too few rows exist to estimate a distribution
    # (e.g. right after a map spawn).
    min_candidate_score: float = 0.12
    loop_floor_z: float = 2.0
    # Absolute lower clamp on the derived floor (scores below this are
    # indistinguishable from the signature noise floor regardless of
    # scene).
    min_floor: float = 0.03


MAX_MAPS = 16  # gid namespace width shared with the Tracker


def _sim3_mul_np(s1, R1, t1, s2, R2, t2):
    """Sim3 composition on host (action x -> s R x + t). These 3x3
    composes run hundreds of times per loop event (one per essential-
    graph edge); as device calls each cost a ~25 ms round-trip."""
    return float(s1) * float(s2), R1 @ R2, float(s1) * (R1 @ t2) + t1


def _sim3_inv_np(s, R, t):
    Rt = R.T
    return 1.0 / float(s), Rt, -(Rt @ t) / float(s)


def _covis_pairs(m: MapState, order: np.ndarray, min_weight: int):
    """(a_slot, b_slot) pairs (b_slot >= a_slot+2) with covisibility >=
    min_weight, via one float32 BLAS matmul over the incidence rows —
    O(K^2 L) in BLAS instead of a Python K^2 loop over an int matmul."""
    ob = m.obs[order].astype(np.float32)
    Wm = ob @ ob.T
    iu = np.triu_indices(len(order), 2)
    hit = Wm[iu] >= min_weight
    return iu[0][hit], iu[1][hit]


def optimize_essential_graph_merge(
    m: MapState,
    free_ids,
    R_snap: np.ndarray,
    t_snap: np.ndarray,
    mode: str,
    covis_edge_weight: int = 100,
    iters: int = 12,
):
    """Merge-variant essential graph (Optimizer::OptimizeEssentialGraph
    merge overload, src/Optimizer.cc:1790-2109): after a map weld, the
    welding BA has corrected only the window around the seam; this pose
    graph propagates that correction to the REST of the merged-in map.

    Vertices: all valid keyframes, seeded at current poses. Fixed:
    everything except `free_ids` (the non-window source-map KFs). Edge
    measurements come from the pre-welding-BA snapshot (R_snap/t_snap) —
    the merged-in map's internally consistent geometry. Landmarks
    anchored to a free keyframe ride its correction."""
    free_ids = [int(x) for x in free_ids]
    free_set = set(free_ids)
    valid = np.nonzero(m.kf_valid)[0]
    if len(valid) < 3 or not free_set:
        return
    order = valid[np.argsort(m.kf_frame_id[valid])]
    K = len(order)
    slot = {int(kf): i for i, kf in enumerate(order)}

    s0 = np.ones(K, np.float32)
    R0 = m.kf_R[order].copy()
    t0 = m.kf_t[order].copy()

    ei, ej, es, eR, et, ew = [], [], [], [], [], []

    def add_edge_snap(a, b, wgt=1.0):
        if a not in free_set and b not in free_set:
            return  # both endpoints fixed: no information
        sm, Rm, tm = _sim3_mul_np(
            1.0, R_snap[b], t_snap[b],
            *_sim3_inv_np(1.0, R_snap[a], t_snap[a]),
        )
        ei.append(slot[a]); ej.append(slot[b])
        es.append(float(sm)); eR.append(Rm); et.append(tm); ew.append(wgt)

    # Temporal chain over the merged map + covisibility edges.
    for a, b in zip(order[:-1], order[1:]):
        add_edge_snap(int(a), int(b))
    for ii, jj in zip(*_covis_pairs(m, order, covis_edge_weight)):
        add_edge_snap(int(order[ii]), int(order[jj]))
    if not ei:
        return

    fixed = np.ones(K, bool)
    for f in free_ids:
        if f in slot:
            fixed[slot[f]] = False
    s_n, R_n, t_n, cost = pose_graph.optimize_pose_graph_padded(
        s0, R0, t0, fixed,
        np.asarray(ei, np.int32), np.asarray(ej, np.int32),
        np.asarray(es, np.float32), np.stack(eR), np.stack(et),
        np.asarray(ew, np.float32), pose_graph.FREE_DIMS[mode],
        iters=iters,
    )

    # Re-anchor landmarks owned by free keyframes: X' = S_new^-1(S_snap(X)).
    lm_ids = np.nonzero(m.lm_valid)[0]
    if len(lm_ids):
        obs_sub = m.obs[order][:, lm_ids]
        seen = obs_sub.any(axis=0)
        first_slot = np.argmax(obs_sub, axis=0)
        for sl in np.unique(first_slot[seen]):
            i = int(order[sl])
            if i not in free_set:
                continue
            selm = lm_ids[(first_slot == sl) & seen]
            if len(selm) == 0:
                continue
            pc = m.lm_pos[selm] @ R_snap[i].T + t_snap[i]
            sinv, Rinv, tinv = _sim3_inv_np(s_n[sl], R_n[sl], t_n[sl])
            m.lm_pos[selm] = (pc @ Rinv.T) * sinv + tinv

    # Write back optimized poses (SE3 via t/s) for the free set only.
    for f in free_ids:
        if f in slot:
            sl = slot[f]
            m.kf_R[f] = R_n[sl]
            m.kf_t[f] = t_n[sl] / s_n[sl]
    log.info(
        "merge essential graph: %d free / %d KFs, %d edges, cost %.3f",
        len(free_ids), K, len(ei), cost,
    )


class LoopCloser:
    def __init__(
        self,
        atlas,
        kfdb: KeyFrameDatabase,
        fx: float, fy: float, cx: float, cy: float,
        cfg: LoopConfig = LoopConfig(),
    ):
        self.atlas = atlas
        self.kfdb = kfdb
        self.fx, self.fy, self.cx, self.cy = fx, fy, cx, cy
        self.cfg = cfg
        # Device placement for the detection/validation programs; the
        # Tracker overrides this with its mapping-backend put function
        # (host-CPU pinning behind high-latency links).
        self._put = jnp.asarray
        self.kf_store = None  # shared DeviceKFStore (set by the Tracker)
        self.last_loop_kf = -10**9
        self.pending: tuple[int, int] | None = None  # (kf, candidate)
        self.n_loops_closed = 0
        self.n_merges = 0
        # Event trail for diagnostics/bench: one dict per acted loop
        # closure with frame ids and the corrective scale (a scale far
        # from 1.0 quantifies how much monocular scale drift the map
        # had accumulated by the revisit; a match frame far from the
        # true revisit exposes a false loop).
        self.events: list[dict] = []
        # Whole-map bundle adjustment after loop correction, bound by the
        # Tracker (the reference spawns RunGlobalBundleAdjustment,
        # src/LoopClosing.cc:1346,2306). Called as hook(kf, candidate).
        self.global_ba_hook = None
        # Map mutation lock, shared with the Tracker when the mapping
        # pipeline runs this closer on a background thread (the
        # Map::mMutexMapUpdate analog held through CorrectLoop).
        import contextlib

        self.lock = contextlib.nullcontext()
        # Persisted loop edges: (map_id, i, j, (s, R, t)).
        self.loop_edges: list[tuple[int, int, int, tuple]] = []
        self._rng = np.random.default_rng(7)

    @property
    def m(self) -> MapState:
        return self.atlas.active

    def _gid(self, k: int, map_id: int | None = None) -> int:
        mid = self.m.map_id if map_id is None else map_id
        return mid % MAX_MAPS * self.m.cfg.max_keyframes + k

    def on_merge(self, src_map_id: int, dst_map_id: int, kf_remap: dict):
        """Remap persisted loop edges of a merged-away map."""
        edges = []
        for (mid, i, j, S) in self.loop_edges:
            if mid == src_map_id:
                if i in kf_remap and j in kf_remap:
                    edges.append((dst_map_id, kf_remap[i], kf_remap[j], S))
            else:
                edges.append((mid, i, j, S))
        self.loop_edges = edges

    # ------------------------------------------------------------------

    def _dev_rows(self, k: int, m_c: MapState):
        """Shared device keyframe store rows for KF k, or None when the
        KF lives in a non-active map (merge candidates) or no store is
        attached (then callers upload host rows)."""
        st = self.kf_store
        if st is None or m_c is not self.m:
            return None
        with self.lock:
            st.sync(m_c, [int(k)])
        return st

    def _kf_bits(self, k: int, m: MapState | None = None) -> np.ndarray:
        m = self.m if m is None else m
        return np.unpackbits(
            m.kf_desc[k].view(np.uint8), axis=-1, bitorder="little"
        ).astype(np.int8)

    def _sigma2(self, level: np.ndarray) -> np.ndarray:
        return LEVEL_SIGMA2[np.clip(level, 0, N_LEVELS - 1)]

    @staticmethod
    def _predict_level_radius(max_dist, dist, r_base):
        """MapPoint::PredictScale (src/MapPoint.cc:557) + the matcher's
        scale-dependent search radius (radius = th * scaleFactor^level,
        src/ORBmatcher.cc:1149-1329)."""
        from ..models.map_state import SCALE_FACTOR

        ratio = np.maximum(max_dist / np.maximum(dist, 1e-9), 1e-9)
        level = np.clip(
            np.ceil(np.log(ratio) / np.log(SCALE_FACTOR)), 0, N_LEVELS - 1
        ).astype(np.int32)
        radius = (r_base * SCALE_FACTOR ** level).astype(np.float32)
        return level, radius

    def process_keyframe(self, k: int, detect: bool = True):
        """Detect + (maybe) correct a loop at the new keyframe k, or
        propose an Atlas map merge. Returns None, or a merge proposal
        (dst_map_idx, candidate_kf, (s, R, t)) for the Tracker to
        execute. The keyframe is added to the database afterwards either
        way (the reference adds mpCurrentKF to the DB at the end of the
        detection attempt, src/LoopClosing.cc:563). `detect=False`
        registers the keyframe only (used by the mapping stage's
        catch-up mode under queue backlog — detection resumes on the
        next uncongested keyframe)."""
        m = self.m
        bits = self._kf_bits(k)
        # One signature computation per keyframe, shared by the
        # detection query and the database insertion.
        hist = self.kfdb.histogram(bits, m.kf_feat_valid[k])
        proposal = None
        # Inertial guard: no loop/merge attempts until the IMU ladder has
        # completed VIBA2 — scale/gravity are still moving before that
        # (src/LoopClosing.cc:345).
        imu_ready = m._imu_calib is None or m.imu_stage >= 3
        try:
            if (
                imu_ready
                and m.n_keyframes() >= self.cfg.min_kfs
                and k - self.last_loop_kf > self.cfg.kf_gap_after_loop
                # `detect=False` (mapping catch-up under backlog) skips
                # FRESH database queries, but a pending hypothesis is
                # always re-validated — confirmation needs consecutive
                # keyframes and the re-observation window is short.
                and (detect or self.pending is not None)
            ):
                proposal = self._detect_and_correct(
                    k, bits, hist, fresh=detect
                )
        finally:
            self.kfdb.add(self._gid(k), bits, m.kf_feat_valid[k], hist=hist)
        return proposal

    # ------------------------------------------------------------------
    # Detection
    # ------------------------------------------------------------------

    def _detect_and_correct(self, k: int, bits: np.ndarray,
                            hist: np.ndarray | None = None,
                            fresh: bool = True):
        """Returns a merge proposal (dst_map_idx, c, (s,R,t)) or None.
        Same-map detections are corrected in place (loop closing);
        other-map detections become merge proposals
        (the loop-vs-merge split of NewDetectCommonRegions :497).

        A hypothesis must validate on `consecutive_kfs` consecutive
        keyframes before it is acted on (src/LoopClosing.cc:407); each
        new KF first re-validates the pending hypothesis (the
        DetectAndReffineSim3FromLastKF analog, :567) and only falls back
        to a fresh database query when there is none."""
        m = self.m
        max_k = m.cfg.max_keyframes
        maps_by_ns = {mm.map_id % MAX_MAPS: (i, mm) for i, mm in enumerate(self.atlas.maps)}

        def act(g, c_idx, m_c, c, s, R, t, n_proj, count):
            """Confirmed-enough? correct / propose, else keep pending."""
            if count >= self.cfg.consecutive_kfs:
                self.pending = None
                if m_c is m:
                    self._correct_loop(k, c, s, R, t)
                    return None, True
                self.n_merges += 1
                log.info(
                    "map-merge detected: KF %d (map %d) -> KF %d (map %d), %d proj",
                    k, m.map_id, c, m_c.map_id, n_proj,
                )
                # The proposal crosses a thread boundary (executed by
                # the track thread at the next frame): identify maps by
                # ID, never by Atlas index — resets/spawns/merges can
                # reorder `atlas.maps` before execution.
                return (m_c.map_id, c, (s, R, t), m.map_id, k), True
            self.pending = (int(g), count, (float(s), np.asarray(R), np.asarray(t)), k)
            return None, True

        # 1) Re-validate the pending hypothesis on this keyframe by
        # propagating the validated Sim3 through the tracked camera
        # motion and re-counting guided projection matches
        # (DetectAndReffineSim3FromLastKF, src/LoopClosing.cc:567-631).
        if self.pending is not None:
            g, count, (sp, Rp, tp), last_k = self.pending
            ns, c = int(g) // max_k, int(g) % max_k
            if ns in maps_by_ns and m.kf_valid[last_k]:
                c_idx, m_c = maps_by_ns[ns]
                if m_c.kf_valid[c]:
                    # S_k'c = T_k'k o S_kc with T_k'k from current poses.
                    Tk = _sim3_mul_np(
                        1.0, m.kf_R[k], m.kf_t[k],
                        *_sim3_inv_np(1.0, m.kf_R[last_k], m.kf_t[last_k]),
                    )
                    s2, R2, t2 = _sim3_mul_np(*Tk, sp, Rp, tp)
                    n_proj = self._projection_matches(k, c, s2, R2, t2, m_c)
                    if n_proj >= self.cfg.min_proj_weak:
                        count += 1
                        if count >= self.cfg.consecutive_kfs:
                            # Refine the hypothesis once more at full
                            # strength before acting; keep the propagated
                            # Sim3 if the refine is (harshly) rejected.
                            res = self._validate_candidate(k, c, m_c)
                            if res is not None:
                                s2, R2, t2, n_proj = res
                        out, handled = act(
                            g, c_idx, m_c, c, s2, R2, t2, n_proj, count
                        )
                        if handled:
                            return out
                    else:
                        log.info(
                            "pending loop hypothesis KF %d -> %d dropped "
                            "at KF %d (%d proj)", last_k, c, k, n_proj,
                        )
            # The hypothesis did not survive this keyframe: drop it and
            # fall through to a FRESH database detection in the SAME
            # call — returning here would waste a whole keyframe of the
            # (short) re-observation window.
            self.pending = None

        if not fresh:
            return None
        # 2) Fresh detection from the keyframe database. Exclusion set:
        # TEMPORALLY recent keyframes + k itself. The reference excludes
        # the covisible group (src/KeyFrameDatabase.cc:629) because in
        # its pipeline covisibility implies temporal adjacency until a
        # loop is corrected — here the tracker's frustum-augmented
        # local map re-binds OLD landmarks the moment a drifted revisit
        # overlaps them, which makes the true loop keyframes covisible
        # BEFORE detection ever sees them. A temporally-distant
        # covisible is not a trivial neighbor: it is an already
        # geometrically-verified loop whose accumulated drift still
        # needs the essential-graph correction, so it must stay in the
        # candidate set.
        exclude = [self._gid(k)]
        recent = np.nonzero(
            m.kf_valid & (m.kf_frame_id > m.kf_frame_id[k] - 3 * 30)
        )[0]
        exclude += [self._gid(int(x)) for x in recent]
        if hist is None:
            return None

        def covis_gids(g):
            ns2, c2 = int(g) // max_k, int(g) % max_k
            if ns2 not in maps_by_ns:
                return []
            _, mm = maps_by_ns[ns2]
            if not mm.kf_valid[c2]:
                return []
            nb, _ = mm.covisible_keyframes(c2, min_weight=1, top=10)
            return [ns2 * max_k + int(x) for x in nb]

        gids, scores = self.kfdb.query_groups(
            hist, covis_gids, np.asarray(exclude), n_best=3
        )
        # Relative validation floor (see LoopConfig.loop_floor_z): the
        # query's score distribution over the old-map rows bounds what
        # aliasing noise scores like in the CURRENT vocabulary.
        floor = self.cfg.min_candidate_score
        adaptive = self.kfdb.adaptive_floor(
            hist, exclude=np.asarray(exclude), z=self.cfg.loop_floor_z
        )
        if adaptive is not None:
            floor = max(self.cfg.min_floor, adaptive)
        if len(gids):
            log.debug("KF %d: %d loop candidates %s (floor %.3f)", k,
                      len(gids),
                      [(int(g) % max_k, round(float(s_), 3))
                       for g, s_ in zip(gids, scores)], floor)
        for g, sc in zip(gids, scores):
            if float(sc) < floor:
                continue  # aliasing noise: not worth a validation
            ns, c = int(g) // max_k, int(g) % max_k
            if ns not in maps_by_ns:
                continue
            c_idx, m_c = maps_by_ns[ns]
            if not m_c.kf_valid[c]:
                continue
            res = self._validate_candidate(k, c, m_c)
            if res is None:
                continue
            s, R, t, n_proj = res
            if n_proj >= self.cfg.min_proj_weak:
                out, handled = act(g, c_idx, m_c, c, s, R, t, n_proj, 1)
                if handled:
                    return out
        self.pending = None
        return None

    def _validate_candidate(self, k: int, c: int, m_c: MapState | None = None):
        """Geometric validation; returns (s, R, t, n_proj) for S_kc
        (candidate-camera -> current-camera Sim3) or None. The candidate
        may live in another Atlas map (merge detection)."""
        m = self.m
        m_c = m if m_c is None else m_c
        cfg = self.cfg
        lm_k = m.kf_lm_idx[k]
        lm_c = m_c.kf_lm_idx[c]
        bound_k = m.kf_feat_valid[k] & (lm_k >= 0)
        bound_c = m_c.kf_feat_valid[c] & (lm_c >= 0)
        if bound_k.sum() < cfg.min_bow_matches or bound_c.sum() < cfg.min_bow_matches:
            return None
        # Keyframe descriptor rows come from the shared device store
        # when the KF lives in the active map (the overlap half of a
        # loopy trajectory validates candidates at nearly every KF —
        # the 2x256 KB bit uploads dominated that cost).
        st_k = self._dev_rows(k, m)
        st_c = self._dev_rows(c, m_c)

        # Per-FEATURE tables of the bound landmark's geometry so every
        # match-dependent gather happens inside the fused program
        # (zeros where unbound; masked by `bound_*` device-side).
        def feat_tables(mm, kf, lm, bound):
            pc = np.zeros((lm.shape[0], 3), np.float32)
            pc[bound] = mm.lm_pos[lm[bound]] @ mm.kf_R[kf].T + mm.kf_t[kf]
            uv = (mm.kf_xy[kf] - [self.cx, self.cy]).astype(np.float32)
            sig = self._sigma2(mm.kf_level[kf])
            return pc, uv, sig

        pc_k, uv_k, sig_k = feat_tables(m, k, lm_k, bound_k)
        pc_c, uv_c, sig_c = feat_tables(m_c, c, lm_c, bound_c)

        # Candidate-window landmarks for the guided-projection count.
        lms = self._loop_window_landmarks(c, m_c)
        n = min(len(lms), _PROJ_CAP)
        pad = _PROJ_CAP - n

        def padf(x, fill=0):
            x = x[:n]
            return np.concatenate(
                [x, np.full((pad, *x.shape[1:]), fill, x.dtype)]
            )

        key = self._put(
            np.asarray([0, self._rng.integers(2**31)], np.uint32)
        )
        out = _validate_candidate_fused(
            _unpack_bits(st_k.desc[k]) if st_k is not None
            else self._put(self._kf_bits(k)),
            self._put(bound_k),
            st_k.angle[k] if st_k is not None else self._put(m.kf_angle[k]),
            self._put(pc_k), self._put(uv_k), self._put(sig_k),
            _unpack_bits(st_c.desc[c]) if st_c is not None
            else self._put(self._kf_bits(c, m_c)),
            self._put(bound_c),
            st_c.angle[c] if st_c is not None
            else self._put(m_c.kf_angle[c]),
            self._put(pc_c), self._put(uv_c), self._put(sig_c),
            self._put(padf(m_c.lm_desc[lms])),
            self._put(padf(m_c.lm_pos[lms]).astype(np.float32)),
            self._put(padf(m_c.lm_max_dist[lms], 1.0)),
            self._put(padf(np.ones(n, bool), False)),
            self._put(m_c.kf_R[c]), self._put(m_c.kf_t[c]),
            st_k.desc[k] if st_k is not None else self._put(m.kf_desc[k]),
            st_k.xy[k] if st_k is not None else self._put(m.kf_xy[k]),
            st_k.level[k] if st_k is not None else self._put(m.kf_level[k]),
            st_k.valid[k] if st_k is not None
            else self._put(m.kf_feat_valid[k]),
            key, self.fx, self.fy, self.cx, self.cy,
            float(2 * self.cx), float(2 * self.cy),
            fix_scale=cfg.fix_scale,
        )
        out = jax.device_get(out)
        n_bow = int(out["n_bow"])
        if n_bow < cfg.min_bow_matches:
            log.debug("cand KF %d: %d bow matches < %d", c, n_bow,
                      cfg.min_bow_matches)
            return None
        if not bool(out["ok_r"]) or int(out["n_ransac"]) < cfg.min_ransac_inliers:
            log.debug("cand KF %d: sim3 ransac %d inl (ok=%s)", c,
                      int(out["n_ransac"]), bool(out["ok_r"]))
            return None
        if int(out["n_opt"]) < cfg.min_sim3_inliers:
            log.debug("cand KF %d: sim3 refine %d inl", c, int(out["n_opt"]))
            return None
        s, R, t = float(out["s"]), np.asarray(out["R"]), np.asarray(out["t"])
        n_proj = int(out["n_proj"])
        if n_proj < cfg.min_proj_weak:
            log.debug("cand KF %d: %d proj matches < %d", c, n_proj,
                      cfg.min_proj_weak)
            return None
        log.info(
            "loop candidate KF %d -> %d: %d bow, %d sim3 inl, %d proj",
            k, c, n_bow, int(out["n_opt"]), n_proj,
        )
        return s, R, t, n_proj

    def _loop_window_landmarks(self, c: int, m_c: MapState | None = None, top: int = 10) -> np.ndarray:
        m = self.m if m_c is None else m_c
        nb, _ = m.covisible_keyframes(c, min_weight=1, top=top)
        kfs = np.concatenate([[c], nb]).astype(np.int64)
        return m.local_map_landmarks(kfs)

    def _projection_matches(self, k: int, c: int, s, R, t, m_c: MapState | None = None) -> int:
        """Count matches when projecting the candidate's window landmarks
        into KF k through the corrected pose S_kw = S_kc o S_cw."""
        m = self.m
        m_c = m if m_c is None else m_c
        lms = self._loop_window_landmarks(c, m_c)
        if len(lms) == 0:
            return 0
        # Corrected k pose as Sim3 (scale folded into translation later).
        s_kw, R_kw, t_kw = _sim3_mul_np(
            s, R, t, 1.0, m_c.kf_R[c], m_c.kf_t[c]
        )
        pc = (m_c.lm_pos[lms] @ R_kw.T) * s_kw + t_kw
        z = pc[:, 2]
        u = self.fx * pc[:, 0] / np.maximum(z, 1e-6) + self.cx
        v = self.fy * pc[:, 1] / np.maximum(z, 1e-6) + self.cy
        okp = (z > 0.05) & (u >= 0) & (u < 2 * self.cx) & (v >= 0) & (v < 2 * self.cy)
        if okp.sum() < 3:
            return 0
        uv = np.stack([u, v], 1).astype(np.float32)
        # Scale-aware gating: the predicted pyramid level follows from
        # the viewing distance in CANDIDATE-map units (|pc| / s_kw).
        lvl, rad = self._predict_level_radius(
            m_c.lm_max_dist[lms], np.linalg.norm(pc, axis=1) / max(s_kw, 1e-9),
            r_base=8.0,
        )
        # Fixed-capacity padding -> single compiled program; packed
        # descriptors unpacked on device (_proj_count).
        n = min(len(lms), _PROJ_CAP)
        pad = _PROJ_CAP - n

        def padf(x, fill=0):
            x = x[:n]
            return np.concatenate(
                [x, np.full((pad, *x.shape[1:]), fill, x.dtype)]
            )

        st = self._dev_rows(k, m)
        n_proj = _proj_count(
            self._put(padf(m_c.lm_desc[lms])),
            self._put(padf(okp, False)),
            self._put(padf(uv)), self._put(padf(lvl)),
            self._put(padf(rad)),
            st.desc[k] if st is not None else self._put(m.kf_desc[k]),
            st.xy[k] if st is not None else self._put(m.kf_xy[k]),
            st.level[k] if st is not None else self._put(m.kf_level[k]),
            st.valid[k] if st is not None
            else self._put(m.kf_feat_valid[k]),
        )
        return int(n_proj)

    # ------------------------------------------------------------------
    # Correction
    # ------------------------------------------------------------------

    def _correct_loop(self, k: int, c: int, s, R, t):
        """Propagate the corrective Sim3, fuse, optimize essential graph
        (CorrectLoop, src/LoopClosing.cc:1062-1355)."""
        with self.lock:
            self._correct_loop_locked(k, c, s, R, t)

    def _correct_loop_locked(self, k: int, c: int, s, R, t):
        m = self.m
        log.info(
            "closing loop: KF %d (frame %d) -> KF %d (frame %d), scale %.4f",
            k, int(m.kf_frame_id[k]), c, int(m.kf_frame_id[c]), s,
        )
        self.events.append({
            "kind": "loop", "kf": int(k),
            "kf_frame": int(m.kf_frame_id[k]), "match": int(c),
            "match_frame": int(m.kf_frame_id[c]), "scale": float(s),
        })

        # Corrected Sim3 pose of k: S_kw_corr = S_kc o S_cw.
        s_corr, R_corr, t_corr = _sim3_mul_np(
            s, R, t, 1.0, m.kf_R[c], m.kf_t[c]
        )

        # Snapshot of pre-correction poses: essential-graph edge
        # measurements must come from the ORIGINAL (drifted) geometry
        # (the reference's NonCorrectedSim3, src/LoopClosing.cc:1119).
        R_snap = m.kf_R.copy()
        t_snap = m.kf_t.copy()

        # Current covisible window (CorrectedSim3 map in the reference).
        nb, _ = m.covisible_keyframes(k, min_weight=1, top=20)
        window = np.concatenate([[k], nb]).astype(np.int64)
        S_old = {}
        S_new = {}
        R_kw, t_kw = m.kf_R[k].copy(), m.kf_t[k].copy()
        for i in window:
            i = int(i)
            S_old[i] = (1.0, m.kf_R[i].copy(), m.kf_t[i].copy())
            # S_ik = S_iw_old o S_kw_old^-1
            si, Ri, ti = _sim3_mul_np(
                1.0, m.kf_R[i], m.kf_t[i],
                *_sim3_inv_np(1.0, R_kw, t_kw),
            )
            sn, Rn, tn = _sim3_mul_np(si, Ri, ti, s_corr, R_corr, t_corr)
            S_new[i] = (float(sn), Rn, tn)

        # Re-anchor the window's landmarks: X' = S_iw_new^-1(S_iw_old(X)),
        # each via its first observing window KF. Remember the anchors so
        # the essential-graph landmark update stays consistent.
        lms = m.local_map_landmarks(window)
        lm_anchor: dict[int, int] = {}
        if len(lms):
            anchor = np.full(len(lms), -1, np.int64)
            for i in window:
                unset = anchor < 0
                anchor[np.nonzero(m.obs[i, lms] & unset)[0]] = int(i)
            for i in window:
                i = int(i)
                selm = lms[anchor == i]
                if len(selm) == 0:
                    continue
                so, Ro, to = S_old[i]
                sn, Rn, tn = S_new[i]
                pc = (m.lm_pos[selm] @ Ro.T) * so + to
                sinv, Rinv, tinv = _sim3_inv_np(sn, Rn, tn)
                m.lm_pos[selm] = (pc @ Rinv.T) * sinv + tinv
                for lm in selm:
                    lm_anchor[int(lm)] = i

        # Write corrected window poses (SE3: t/s like the reference).
        for i in window:
            sn, Rn, tn = S_new[int(i)]
            m.kf_R[i] = Rn
            m.kf_t[i] = tn / sn

        # Fuse duplicates: project loop-window landmarks into each
        # corrected window KF (SearchAndFuse).
        self._search_and_fuse(window, c)

        # Essential-graph optimization over all valid keyframes.
        self._essential_graph(k, c, window, S_new, R_snap, t_snap, lm_anchor)

        self.last_loop_kf = k
        self.n_loops_closed += 1
        m.big_change_idx += 1
        # Persist the loop edge for future essential graphs.
        sji, Rji, tji = pose_graph.relative_sim3(
            np.ones(m.cfg.max_keyframes, np.float32), m.kf_R, m.kf_t, c, k
        )
        self.loop_edges.append(
            (m.map_id, c, k,
             (float(np.asarray(sji)), np.asarray(Rji), np.asarray(tji)))
        )
        # Whole-map bundle adjustment: the essential graph repairs poses
        # but leaves landmark/structure error; the reference follows with
        # a full BA (RunGlobalBundleAdjustment, src/LoopClosing.cc:1346).
        if self.global_ba_hook is not None:
            self.global_ba_hook(k, c)

    def _search_and_fuse(self, window: np.ndarray, c: int):
        m = self.m
        loop_lms = self._loop_window_landmarks(c)
        if len(loop_lms) == 0:
            return
        bits = np.unpackbits(
            m.lm_desc[loop_lms].view(np.uint8), axis=-1, bitorder="little"
        ).astype(np.int8)
        bits_dev = self._put(bits)  # one upload, shared by every target
        n_fused = 0
        # Phase 1: dispatch each window keyframe's projection match
        # asynchronously (device-store keyframe rows), then fetch the
        # whole wave — one round-trip for the window instead of one per
        # keyframe (the fuse runs inside the mapping stage whose stalls
        # back-pressure turns into tracking losses).
        pending = []
        for i in window:
            pc = m.lm_pos[loop_lms] @ m.kf_R[i].T + m.kf_t[i]
            z = pc[:, 2]
            u = self.fx * pc[:, 0] / np.maximum(z, 1e-6) + self.cx
            v = self.fy * pc[:, 1] / np.maximum(z, 1e-6) + self.cy
            okp = (z > 0.05) & (u >= 0) & (u < 2 * self.cx) & (v >= 0) & (v < 2 * self.cy)
            if okp.sum() < 3:
                continue
            uv = np.stack([u, v], 1).astype(np.float32)
            # Fuse with scale-predicted levels and radii (SearchAndFuse
            # -> ORBmatcher::Fuse, src/ORBmatcher.cc:1149-1329: radius
            # 3.0 * scaleFactor^predictedLevel, level within [l-1, l+1]).
            lvl, rad = self._predict_level_radius(
                m.lm_max_dist[loop_lms], np.linalg.norm(pc, axis=1),
                r_base=3.0,
            )
            st = self._dev_rows(i, m)
            idx, mok = matching.search_by_projection(
                bits_dev, self._put(okp), self._put(uv),
                self._put(lvl),
                _unpack_bits(st.desc[int(i)]) if st is not None
                else self._put(self._kf_bits(i)),
                st.xy[int(i)] if st is not None else self._put(m.kf_xy[i]),
                st.level[int(i)] if st is not None
                else self._put(m.kf_level[i]),
                st.valid[int(i)] if st is not None
                else self._put(m.kf_feat_valid[i]),
                self._put(rad),
                max_dist=matching.TH_LOW, ratio=0.9, level_band=1,
            )
            pending.append((int(i), idx, mok))
        for _, idx, mok in pending:
            idx.copy_to_host_async()
            mok.copy_to_host_async()
        for i, idx, mok in pending:
            idx = np.asarray(idx)
            mok = np.asarray(mok)
            for j in np.nonzero(mok)[0]:
                loop_lm = int(loop_lms[j])
                f = int(idx[j])
                cur_lm = int(m.kf_lm_idx[i, f])
                if cur_lm == loop_lm:
                    continue
                if cur_lm >= 0:
                    # Replace the window landmark with the (older) loop
                    # landmark everywhere (MapPoint::Replace).
                    self._replace_landmark(cur_lm, loop_lm)
                else:
                    m.add_observation(int(i), np.asarray([f]), np.asarray([loop_lm]))
                n_fused += 1
        if n_fused:
            log.info("loop fuse: %d duplicate bindings merged", n_fused)

    def _replace_landmark(self, old: int, new: int):
        self.m.replace_landmark(old, new)

    def _essential_graph(
        self, k: int, c: int, window, S_new, R_snap, t_snap, lm_anchor
    ):
        """Pose-graph over all keyframes. Edge measurements come from the
        pre-correction snapshot (the original relative geometry); window
        vertices are seeded with their corrected Sim3 (CorrectedSim3);
        the loop-candidate KF is the fixed gauge."""
        m = self.m
        valid = np.nonzero(m.kf_valid)[0]
        if len(valid) < 3:
            return
        order = valid[np.argsort(m.kf_frame_id[valid])]
        K = len(order)
        slot = {int(kf): i for i, kf in enumerate(order)}
        win = {int(i) for i in window}

        s0 = np.ones(K, np.float32)
        R0 = m.kf_R[order].copy()
        t0 = m.kf_t[order].copy()
        for i in win:
            if i in slot:
                sn, Rn, tn = S_new[i]
                s0[slot[i]] = sn
                R0[slot[i]] = Rn
                t0[slot[i]] = tn

        ei, ej, es, eR, et, ew = [], [], [], [], [], []

        def add_edge_snap(a, b, wgt=1.0):
            # measurement S_ji = S_b o S_a^-1 from the pre-correction
            # snapshot (scale 1).
            sm, Rm, tm = _sim3_mul_np(
                1.0, R_snap[b], t_snap[b],
                *_sim3_inv_np(1.0, R_snap[a], t_snap[a]),
            )
            ei.append(slot[a]); ej.append(slot[b])
            es.append(float(sm)); eR.append(Rm); et.append(tm); ew.append(wgt)

        # Temporal chain (the spanning-tree analog).
        for a, b in zip(order[:-1], order[1:]):
            add_edge_snap(int(a), int(b))
        # Covisibility edges with weight >= covis_edge_weight.
        for ii, jj in zip(
            *_covis_pairs(m, order, self.cfg.covis_edge_weight)
        ):
            add_edge_snap(int(order[ii]), int(order[jj]))
        # Previous loop edges (of this map only).
        for (mid, a, b, (sm, Rm, tm)) in self.loop_edges:
            if mid == m.map_id and a in slot and b in slot:
                ei.append(slot[a]); ej.append(slot[b])
                es.append(sm); eR.append(Rm); et.append(tm); ew.append(1.0)
        # The new loop edge: measured from the corrected relative pose
        # S_k_corr o S_c^-1 (by construction ~ the Sim3 from validation).
        sk, Rk, tk = S_new[k]
        sm, Rm, tm = _sim3_mul_np(
            sk, Rk, tk, *_sim3_inv_np(1.0, m.kf_R[c], m.kf_t[c])
        )
        ei.append(slot[c]); ej.append(slot[k])
        es.append(float(sm)); eR.append(Rm); et.append(tm); ew.append(2.0)

        fixed = np.zeros(K, bool)
        fixed[slot[c]] = True
        # Inertial maps: gravity-aligned world makes roll/pitch/scale
        # observable, so the pose graph optimizes yaw+translation only
        # (OptimizeEssentialGraph4DoF selection, src/LoopClosing.cc:1335).
        if m.imu_stage >= 1:
            mode = "4dof"
        else:
            mode = "se3" if self.cfg.fix_scale else "sim3"
        s_n, R_n, t_n, _cost = pose_graph.optimize_pose_graph_padded(
            s0, R0, t0, fixed,
            np.asarray(ei, np.int32), np.asarray(ej, np.int32),
            np.asarray(es, np.float32), np.stack(eR), np.stack(et),
            np.asarray(ew, np.float32), pose_graph.FREE_DIMS[mode],
            put=self._put,
        )

        # Re-anchor every landmark via the pose it is currently
        # consistent with: window-corrected landmarks use their recorded
        # window anchor (with its corrected Sim3), everything else its
        # first observing keyframe's snapshot pose.
        lm_ids = np.nonzero(m.lm_valid)[0]
        if len(lm_ids):
            first_slot = np.argmax(m.obs[order][:, lm_ids], axis=0)
            seen = m.obs[order][:, lm_ids].any(axis=0)
            anchor_slot = first_slot.copy()
            use_corrected = np.zeros(len(lm_ids), bool)
            for j, lm in enumerate(lm_ids):
                a = lm_anchor.get(int(lm))
                if a is not None and a in slot:
                    anchor_slot[j] = slot[a]
                    use_corrected[j] = True
            for sl in np.unique(anchor_slot[seen]):
                for corrected in (False, True):
                    selm_mask = (anchor_slot == sl) & seen & (use_corrected == corrected)
                    selm = lm_ids[selm_mask]
                    if len(selm) == 0:
                        continue
                    i = int(order[sl])
                    if corrected:
                        so, Ro, to = S_new[i]
                    else:
                        so, Ro, to = 1.0, R_snap[i], t_snap[i]
                    pc = (m.lm_pos[selm] @ Ro.T) * so + to
                    sinv, Rinv, tinv = _sim3_inv_np(s_n[sl], R_n[sl], t_n[sl])
                    m.lm_pos[selm] = (pc @ Rinv.T) * sinv + tinv

        # Write optimized poses back as SE3 (t / s).
        m.kf_R[order] = R_n
        m.kf_t[order] = t_n / s_n[:, None]
