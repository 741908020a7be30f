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


@jax.jit
def fused_track_stages(
    xy_ud: jax.Array,  # (N,2) undistorted keypoints (device)
    f_level: jax.Array,  # (N,)
    f_desc_i8: jax.Array,  # (N,256)
    f_valid: jax.Array,  # (N,)
    R_pred: jax.Array,
    t_pred: jax.Array,
    lm_pos: jax.Array,  # (L,3) local-map landmarks (padded)
    lm_normal: jax.Array,
    lm_min_dist: jax.Array,
    lm_max_dist: jax.Array,
    lm_desc: jax.Array,  # (L,8) uint32 packed descriptors
    lm_valid: jax.Array,
    stage1_mask: jax.Array,  # (L,) last-frame-visible landmark subset
    min_stage1: jax.Array,  # scalar: wide-window retry threshold
    fx, fy, cx, cy, width, height,
):
    """The runtime's per-frame matching + optimization hot path as ONE
    program: motion-model matching vs the last frame's landmarks
    (radius 15, wide 30 retry: Tracking::TrackWithMotionModel
    src/Tracking.cc:2719) -> pose opt -> local-map matching (radius 6:
    Tracking::TrackLocalMap/SearchLocalPoints src/Tracking.cc:3186) ->
    pose opt. Fed by the (separately dispatched, still device-resident)
    extraction output. On a tunneled accelerator every synchronous
    dispatch costs ~25 ms, so the split-phase host path runs at ~2 fps
    while this path needs one image upload in and one small result
    fetch out per frame.

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
            rounds=4, iters=10,
        )

    # --- Stage 1: motion-model tracking vs last-frame landmarks.
    uv1, lvl1, _, ok_p1 = project_landmarks(
        R_pred, t_pred, lm_pos, lm_normal, lm_min_dist, lm_max_dist,
        lm_valid, fx, fy, cx, cy, width, height,
    )
    ok1 = ok_p1 & stage1_mask
    idx_a, mok_a = match_pass(uv1, lvl1, ok1, f_valid, 15.0)
    n_a = jnp.sum(mok_a.astype(jnp.int32))
    idx_b, mok_b = match_pass(uv1, lvl1, ok1, f_valid, 30.0)
    wide = n_a < min_stage1
    idx1 = jnp.where(wide, idx_b, idx_a)
    mok1 = jnp.where(wide, mok_b, mok_a)
    n_stage1 = jnp.sum(mok1.astype(jnp.int32))
    res1 = pose_pass(R_pred, t_pred, idx1, mok1)

    # --- Stage 2: local-map tracking from the refined pose.
    keep1 = mok1 & res1.inliers
    feat_bound = jnp.zeros(f_valid.shape, bool).at[idx1].set(
        keep1, mode="drop"
    )
    uv2, lvl2, _, ok_p2 = project_landmarks(
        res1.R, res1.t, lm_pos, lm_normal, lm_min_dist, lm_max_dist,
        lm_valid, fx, fy, cx, cy, width, height,
    )
    ok2 = ok_p2 & ~keep1
    idx2, mok2 = match_pass(uv2, lvl2, ok2, f_valid & ~feat_bound, 6.0)
    idx_m = jnp.where(keep1, idx1, idx2)
    mok_m = keep1 | mok2
    res2 = pose_pass(res1.R, res1.t, idx_m, mok_m)

    visible = ok_p1 | ok_p2
    return (
        res2.R, res2.t, idx_m, mok_m, res2.inliers,
        res2.n_inliers, n_stage1, visible,
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
