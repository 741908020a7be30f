"""Fully-fused per-frame tracking step: one device program.

The reference's per-frame hot path (Tracking::Track, src/Tracking.cc:1773
— extract, project local map, match, motion-only pose optimization) runs
as ONE jitted XLA program with no host round-trips except the final
scalar readbacks the keyframe policy needs (SURVEY.md §7 "fixed
per-frame program + small scalar readbacks").

This is the flagship compile target: image in, optimized pose + match
bindings out.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.map_state import SCALE_FACTOR, N_LEVELS
from ..ops import matching, orb
from ..optim import pose_opt
from ..utils import lie
from .tracker import project_landmarks


@partial(jax.jit, static_argnames=("orb_params",))
def fused_track_step(
    img: jax.Array,  # (H,W) float32 grayscale 0..255
    R_pred: jax.Array,  # (3,3) predicted Tcw
    t_pred: jax.Array,  # (3,)
    lm_pos: jax.Array,  # (L,3) local-map landmarks (padded)
    lm_normal: jax.Array,  # (L,3)
    lm_min_dist: jax.Array,  # (L,)
    lm_max_dist: jax.Array,  # (L,)
    lm_bits: jax.Array,  # (L,256) int8 descriptors
    lm_valid: jax.Array,  # (L,)
    fx, fy, cx, cy, width, height,
    orb_params: orb.OrbParams = orb.OrbParams(),
):
    """Extract ORB -> frustum-project local map -> windowed Hamming match
    -> motion-only pose optimization. Returns (features, R, t, lm_to_feat,
    match_ok, inliers, n_inliers)."""
    feats = orb.extract_orb(img, orb_params)

    uv, level, dist, ok = project_landmarks(
        R_pred, t_pred, lm_pos, lm_normal, lm_min_dist, lm_max_dist, lm_valid,
        fx, fy, cx, cy, width, height,
    )
    sigma = SCALE_FACTOR ** level.astype(jnp.float32)
    radius = 15.0 * sigma
    idx, mok = matching.search_by_projection(
        lm_bits, ok, uv, level,
        feats.desc_i8, feats.xy, feats.level, feats.valid,
        radius, max_dist=matching.TH_HIGH, ratio=0.9, level_band=1,
    )

    # Build the pose-opt problem directly from matches (landmark-major).
    uv_obs = feats.xy[idx] - jnp.stack([cx, cy])
    lvl_obs = feats.level[idx]
    sigma2 = SCALE_FACTOR ** (2.0 * lvl_obs.astype(jnp.float32))
    # 4 rounds as the reference (chi2 re-classification between rounds);
    # 2 GN iterations per round instead of 10: validated numerically
    # equivalent (pose identical to the 4x10 schedule even from
    # reloc-scale perturbations with 15% gross outliers — GN converges
    # quadratically; the reference's 10 is g2o's fixed LM budget, not a
    # convergence requirement).
    res = pose_opt.pose_optimization(
        R_pred, t_pred, lm_pos, uv_obs, sigma2, mok, fx, fy,
        rounds=4, iters=2,
    )
    return feats, res.R, res.t, idx, mok, res.inliers, res.n_inliers


def _track_stages_core(
    xy_ud, f_level, f_desc_i8, f_valid,
    R_pred, t_pred,
    lm_pos, lm_normal, lm_min_dist, lm_max_dist, lm_desc, lm_valid,
    stage1_mask, min_stage1,
    fx, fy, cx, cy, width, height,
    # 4 chi2-reclassification rounds as the reference; 3 GN iterations
    # per round instead of g2o's fixed 10-iteration LM budget (GN on
    # this problem converges quadratically — see fused_track_step's
    # equivalence note; with three chained match/opt passes per frame
    # the saving is ~8 ms of device time per frame).
    pose_iters: int = 3,
):
    """Shared body of the per-frame matching + optimization hot path:
    motion-model matching vs the last frame's landmarks (radius 15, wide
    30 retry: Tracking::TrackWithMotionModel src/Tracking.cc:2719) ->
    pose opt -> local-map matching (radius 6:
    Tracking::TrackLocalMap/SearchLocalPoints src/Tracking.cc:3186) ->
    pose opt.

    Returns (R, t, lm_to_feat, bound_mask, inlier_mask, n_inliers,
    n_stage1, visible_mask).
    """
    # Unpack map descriptors on device (64 KB packed upload instead of
    # 512 KB of int8 bits; little-endian order matches np.unpackbits).
    L = lm_desc.shape[0]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    lm_bits = (
        (lm_desc[:, :, None] >> shifts[None, None, :]) & 1
    ).reshape(L, 256).astype(jnp.int8)

    # One Hamming matrix, reused by all three matching passes.
    dmat = matching.hamming_matrix(lm_bits, f_desc_i8)

    def match_pass(uv, level, ok_lm, ok_feat, radius_base):
        sigma = SCALE_FACTOR ** level.astype(jnp.float32)
        pen = matching.window_penalty(
            uv, xy_ud, radius_base * sigma, f_level,
            level - 1, level + 1,
        )
        return matching.match_nn(
            dmat, ok_lm, ok_feat, matching.TH_HIGH, 0.9,
            cross_check=True, extra_penalty=pen,
        )

    def pose_pass(R0, t0, idx, mask):
        uv_obs = xy_ud[idx] - jnp.stack([cx, cy])
        sigma2 = SCALE_FACTOR ** (
            2.0 * f_level[idx].astype(jnp.float32)
        )
        return pose_opt.pose_optimization(
            R0, t0, lm_pos, uv_obs, sigma2, mask, fx, fy,
            rounds=4, iters=pose_iters,
        )

    # --- Stage 1: motion-model tracking vs last-frame landmarks. A
    # thin carry set (the bound-mask chain can only shrink between
    # local-map passes) falls back to the whole snapshot — wide
    # acquisition beats optimizing a pose from a starved match set.
    uv1, lvl1, _, ok_p1 = project_landmarks(
        R_pred, t_pred, lm_pos, lm_normal, lm_min_dist, lm_max_dist,
        lm_valid, fx, fy, cx, cy, width, height,
    )
    thin = jnp.sum((stage1_mask & lm_valid).astype(jnp.int32)) < 20
    ok1 = ok_p1 & jnp.where(thin, lm_valid, stage1_mask)
    idx_a, mok_a = match_pass(uv1, lvl1, ok1, f_valid, 15.0)
    n_a = jnp.sum(mok_a.astype(jnp.int32))
    idx_b, mok_b = match_pass(uv1, lvl1, ok1, f_valid, 30.0)
    wide = n_a < min_stage1
    idx1 = jnp.where(wide, idx_b, idx_a)
    mok1 = jnp.where(wide, mok_b, mok_a)
    n_stage1 = jnp.sum(mok1.astype(jnp.int32))
    res1 = pose_pass(R_pred, t_pred, idx1, mok1)

    N = f_valid.shape[0]

    def bound_mask(keep, idx):
        # Scatter only kept entries (idx holds an argmin index for
        # EVERY landmark row, matched or not; .at[].set with duplicate
        # indices has unspecified order, so an unmatched row could
        # clear a kept one).
        return jnp.zeros(N + 1, bool).at[
            jnp.where(keep, idx, N)
        ].set(True, mode="drop")[:N]

    def local_pass(R0, t0, prev_keep, prev_idx, radius):
        """Project the local map from (R0, t0), match unbound features,
        merge with carried matches, re-optimize (TrackLocalMap)."""
        fb = bound_mask(prev_keep, prev_idx)
        uv, lvl, _, ok_p = project_landmarks(
            R0, t0, lm_pos, lm_normal, lm_min_dist, lm_max_dist,
            lm_valid, fx, fy, cx, cy, width, height,
        )
        ok_lm = ok_p & ~prev_keep
        idx_n, mok_n = match_pass(uv, lvl, ok_lm, f_valid & ~fb, radius)
        idx_m = jnp.where(prev_keep, prev_idx, idx_n)
        mok_m = prev_keep | mok_n
        res = pose_pass(R0, t0, idx_m, mok_m)
        return res, idx_m, mok_m, ok_p

    # --- Stage 2: local-map tracking from the refined pose. When
    # stage 1 was weak its pose is noisy — widen the search so the
    # local-map pass can still re-acquire (the reference widens th for
    # the same reason, src/Tracking.cc:3208-3218).
    keep1 = mok1 & res1.inliers
    r2 = jnp.where(res1.n_inliers < 40, 12.0, 6.0)
    res2, idx_m2, mok_m2, ok_p2 = local_pass(
        res1.R, res1.t, keep1, idx1, r2
    )

    # --- Stage 3: one more local-map pass from the stage-2 pose. The
    # refined pose re-projects within a tight window and recovers the
    # matches stage 2 missed through its noisy projections — this is
    # what keeps the per-frame inlier count from sawtoothing between
    # mapping events.
    keep2 = mok_m2 & res2.inliers
    res3, idx_m3, mok_m3, ok_p3 = local_pass(
        res2.R, res2.t, keep2, idx_m2, 4.0
    )

    visible = ok_p1 | ok_p2 | ok_p3
    return (
        res3.R, res3.t, idx_m3, mok_m3, res3.inliers,
        res3.n_inliers, n_stage1, visible,
    )


fused_track_stages = jax.jit(_track_stages_core)


@partial(jax.jit, static_argnames=("orb_params",))
def fused_frame_program(
    img_u8: jax.Array,  # (H,W) uint8 raw camera frame
    cam,  # ops.camera.Camera pytree (static kind)
    R_pred: jax.Array,  # (3,3) predicted Tcw for THIS frame
    t_pred: jax.Array,
    R_prev: jax.Array,  # optimized pose of the PREVIOUS frame
    t_prev: jax.Array,  # (velocity base for the next prediction)
    lm_pos: jax.Array,  # (L,3) local-map snapshot (padded)
    lm_normal: jax.Array,
    lm_min_dist: jax.Array,
    lm_max_dist: jax.Array,
    lm_desc: jax.Array,  # (L,8) uint32 packed descriptors
    lm_valid: jax.Array,
    prev_bound: jax.Array,  # (L,) bool: prev frame's bound mask (its slots)
    remap: jax.Array,  # (L,) int32: this snapshot's slot -> prev slot (-1 none)
    min_stage1,  # scalar: wide-window retry threshold
    min_ok,  # scalar: inlier gate below which the pose falls back to pred
    fx, fy, cx, cy, width, height,
    orb_params: orb.OrbParams = orb.OrbParams(),
):
    """The WHOLE per-frame tracking step as one chained device program:
    raw image in -> ORB extraction -> undistortion -> two-stage
    match/pose-opt -> next-frame constant-velocity prediction.

    Designed for software-pipelined tracking (runtime pipeline lag k):
    `R_pred/t_pred/R_prev/t_prev/prev_bound` are normally the DEVICE
    HANDLES of the previous call's outputs, so consecutive frames chain
    on-device with no host round-trip in the prediction loop; the host
    fetches the small result block k frames late via copy_to_host_async
    (a tunneled TPU pays ~25 ms per synchronous fetch; chained dispatch
    costs ~0.3 ms). The constant-velocity motion model
    (Tracking::TrackWithMotionModel src/Tracking.cc:2719) runs INSIDE
    the program; on tracking failure (n_inliers < min_ok) the program
    keeps the predicted pose — dead-reckoning through short dropouts
    exactly like the reference's RECENTLY_LOST prediction — and the
    host intervenes when it observes the failure at retirement.

    `remap` re-indexes the previous frame's bound mask when the host
    swapped in a new local-map snapshot between the two dispatches
    (slot j of this snapshot was slot remap[j] of the previous one).
    """
    from ..ops.camera import undistort_points

    feats = orb.extract_orb(img_u8.astype(jnp.float32), orb_params)
    xy_ud = undistort_points(cam, feats.xy)

    # Previous bound mask carried through the snapshot swap (identity
    # remap when no swap happened).
    L = lm_valid.shape[0]
    mapped = jnp.where(remap >= 0, remap, L)
    pb = jnp.concatenate([prev_bound, jnp.zeros((1,), bool)])[mapped]
    # A thin carried set (post-swap/recovery) falls back to the whole
    # snapshot inside _track_stages_core.
    stage1 = pb & lm_valid

    (R, t, idx_m, mok_m, inl, n_in, n_stage1, visible) = _track_stages_core(
        xy_ud, feats.level, feats.desc_i8, feats.valid,
        R_pred, t_pred,
        lm_pos, lm_normal, lm_min_dist, lm_max_dist, lm_desc, lm_valid,
        stage1, min_stage1,
        fx, fy, cx, cy, width, height,
    )

    ok = n_in >= min_ok
    R_out = jnp.where(ok, R, R_pred)
    t_out = jnp.where(ok, t, t_pred)
    bound_out = mok_m & inl & ok

    # Constant-velocity prediction for the next frame:
    # V = T_out o T_prev^-1 ; T_pred_next = V o T_out.
    Rv = R_out @ R_prev.T
    tv = t_out - Rv @ t_prev
    R_pred_next = Rv @ R_out
    t_pred_next = Rv @ t_out + tv

    return dict(
        R=R_out, t=t_out,
        R_pred_next=R_pred_next, t_pred_next=t_pred_next,
        idx=idx_m, bound=bound_out, visible=visible,
        n_inliers=n_in, n_stage1=n_stage1, ok=ok,
        f_xy=xy_ud, f_level=feats.level, f_angle=feats.angle,
        f_desc=feats.desc, f_valid=feats.valid,
        f_desc_i8=feats.desc_i8, f_score=feats.score,
    )


@partial(jax.jit, static_argnames=("orb_params",))
def fused_track_scan(
    imgs: jax.Array,  # (T,H,W) float32 frames
    R0: jax.Array,
    t0: jax.Array,
    lm_pos: jax.Array,
    lm_normal: jax.Array,
    lm_min_dist: jax.Array,
    lm_max_dist: jax.Array,
    lm_bits: jax.Array,
    lm_valid: jax.Array,
    fx, fy, cx, cy, width, height,
    orb_params: orb.OrbParams = orb.OrbParams(),
):
    """Device-resident tracking over a frame batch: `lax.scan` of
    fused_track_step carrying the pose (constant-velocity handoff), ONE
    dispatch for T frames. This is how localization-only tracking /
    offline trajectory processing runs at full chip throughput — the
    per-call host-dispatch overhead (~0.9 ms through a tunneled backend)
    amortizes across the batch. Returns per-frame (R, t, n_inliers)."""

    def body(carry, img):
        R, t = carry
        _, R2, t2, _, _, _, n_in = fused_track_step(
            img, R, t, lm_pos, lm_normal, lm_min_dist, lm_max_dist,
            lm_bits, lm_valid, fx, fy, cx, cy, width, height,
            orb_params=orb_params,
        )
        return (R2, t2), (R2, t2, n_in)

    (_, _), outs = jax.lax.scan(body, (R0, t0), imgs)
    return outs
