"""Stereo correspondence kernels.

TPU-native replacement for Frame::ComputeStereoMatches
(reference src/Frame.cc:944-1114) and ComputeStereoFromRGBD
(src/Frame.cc:1115-1159):

- The reference's per-row candidate lists + per-keypoint loops become a
  single dense L x R Hamming matrix (MXU int8 matmul) with additive
  penalties for the epipolar row band (|vR - vL| <= 2 sigma_L), the
  disparity range, and the +-1 octave gate.
- The sub-pixel SAD refinement (11x11 patch slid +-5 px along the row,
  parabola fit, src/Frame.cc:1030-1087) is one batched gather + shifted
  reduction over all matches at once.
- The reference's outlier cut at 1.5 * 1.4 * median(SAD) is a masked
  median (src/Frame.cc:1101-1112).

RGB-D (`depth_to_stereo`) samples the registered depth map at the raw
keypoint and synthesizes the right coordinate ur = u - bf/d exactly like
the reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import matching
from .image import SCALE_FACTOR

INF = jnp.float32(1e9)
# (TH_HIGH + TH_LOW) / 2 — the coarse acceptance used by
# ComputeStereoMatches (src/Frame.cc:957 `thOrbDist`).
TH_ORB = (matching.TH_HIGH + matching.TH_LOW) // 2
SAD_W = 5  # half window of the 11x11 SAD patch (src/Frame.cc:1032 `w`)
SAD_L = 5  # slide range +-L (src/Frame.cc:1044)


def _row_band_penalty(xy_l, level_l, xy_r, level_r, min_disp, max_disp):
    """(N,M) penalty: 0 where right feature r is a legal epipolar
    candidate for left feature l."""
    band = 2.0 * SCALE_FACTOR ** level_l.astype(jnp.float32)  # src/Frame.cc:966
    dv = jnp.abs(xy_l[:, None, 1] - xy_r[None, :, 1])
    disp = xy_l[:, None, 0] - xy_r[None, :, 0]
    dlvl = level_r[None, :] - level_l[:, None]
    ok = (
        (dv <= band[:, None])
        & (disp >= min_disp)
        & (disp <= max_disp)
        & (dlvl >= -1)
        & (dlvl <= 1)  # octave gate (src/Frame.cc:997)
    )
    return jnp.where(ok, 0.0, INF)


@jax.jit
def match_stereo_coarse(
    bits_l, xy_l, level_l, valid_l, bits_r, xy_r, level_r, valid_r,
    min_disp, max_disp,
):
    """Coarse descriptor match along epipolar rows.

    Returns (idx_r (N,), ok (N,)): best right feature per left feature,
    accepted at Hamming < TH_ORB inside the row/disparity/octave band.
    """
    dist = matching.hamming_matrix(bits_l, bits_r)
    pen = _row_band_penalty(xy_l, level_l, xy_r, level_r, min_disp, max_disp)
    idx, ok = matching.match_nn(
        dist, valid_l, valid_r, max_dist=TH_ORB, ratio=1.0,
        cross_check=False, extra_penalty=pen,
    )
    return idx, ok


def _gather_patch(img, cy, cx, hh: int, hw: int):
    """Batched (2*hh+1, 2*hw+1) patch gather around integer centers,
    clamped at borders. img (H,W); cy,cx (N,) int32."""
    H, W = img.shape
    dy = jnp.arange(-hh, hh + 1)
    dx = jnp.arange(-hw, hw + 1)
    yy = jnp.clip(cy[:, None, None] + dy[None, :, None], 0, H - 1)
    xx = jnp.clip(cx[:, None, None] + dx[None, None, :], 0, W - 1)
    return img[yy, xx]  # (N, 2hh+1, 2hw+1)


@jax.jit
def subpixel_refine(img_l, img_r, xy_l, ur_coarse, ok):
    """Sub-pixel disparity by sliding SAD + parabola fit
    (src/Frame.cc:1030-1087), batched over all matches.

    Works at full resolution (level-0); the reference slides in the
    matched octave's pyramid image — equivalent up to the pyramid's
    smoothing for the low octaves where nearly all stereo matches live.

    Returns (ur_refined (N,), sad_best (N,), ok (N,))."""
    cy = jnp.round(xy_l[:, 1]).astype(jnp.int32)
    cxl = jnp.round(xy_l[:, 0]).astype(jnp.int32)
    cxr = jnp.round(ur_coarse).astype(jnp.int32)

    pl = _gather_patch(img_l, cy, cxl, SAD_W, SAD_W)  # (N,11,11)
    pr = _gather_patch(img_r, cy, cxr, SAD_W, SAD_W + SAD_L)  # (N,11,21)
    # Center-intensity normalization (src/Frame.cc:1036 `IL - center`).
    pl = pl - pl[:, SAD_W, SAD_W][:, None, None]
    pr = pr - pr[:, SAD_W, SAD_W + SAD_L][:, None, None]

    # SAD for each of the 11 shifts: one stacked slice + reduction.
    n_shift = 2 * SAD_L + 1
    wins = jnp.stack(
        [pr[:, :, s : s + 2 * SAD_W + 1] for s in range(n_shift)], axis=1
    )  # (N, 11, 11, 11)
    sad = jnp.sum(jnp.abs(wins - pl[:, None]), axis=(-2, -1))  # (N, 11)

    best = jnp.argmin(sad, axis=1)
    ctr = jnp.clip(best, 1, n_shift - 2)
    d0 = jnp.take_along_axis(sad, (ctr - 1)[:, None], 1)[:, 0]
    d1 = jnp.take_along_axis(sad, ctr[:, None], 1)[:, 0]
    d2 = jnp.take_along_axis(sad, (ctr + 1)[:, None], 1)[:, 0]
    denom = d0 + d2 - 2.0 * d1
    delta = jnp.where(jnp.abs(denom) > 1e-6, (d0 - d2) / (2.0 * denom), 0.0)
    # Reject fits outside (-1, 1) (src/Frame.cc:1081) and edge minima.
    good = ok & (jnp.abs(delta) < 1.0) & (best == ctr)
    ur = cxr.astype(jnp.float32) + (ctr - SAD_L).astype(jnp.float32) + delta
    sad_best = d1
    return ur, sad_best, good


@jax.jit
def median_outlier_cut(sad, ok):
    """Drop matches with SAD above 1.5*1.4*median (src/Frame.cc:1101)."""
    big = jnp.where(ok, sad, jnp.inf)
    n_ok = jnp.sum(ok)
    order = jnp.sort(big)
    med = order[jnp.clip(n_ok // 2, 0, sad.shape[0] - 1)]
    # Floor the cut so a near-zero median (synthetic / low-texture scenes
    # where many patches match exactly) doesn't reject everything.
    th = jnp.maximum(1.5 * 1.4 * med, 1.0)
    return ok & (sad <= th) & (n_ok > 0)


@jax.jit
def compute_stereo_matches(
    img_l, img_r,
    bits_l, xy_l, level_l, valid_l,
    bits_r, xy_r, level_r, valid_r,
    bf, min_z,
):
    """Full stereo pipeline: coarse match -> SAD sub-pixel -> median cut.

    Returns per-left-feature (ur (N,), depth (N,), has_depth (N,)).
    ur/depth are -1 where no stereo match (mvuRight/mvDepth semantics,
    src/Frame.cc:944-953).
    """
    max_disp = bf / min_z  # src/Frame.cc:961 (minD=0, maxD=bf/minZ)
    idx, ok = match_stereo_coarse(
        bits_l, xy_l, level_l, valid_l, bits_r, xy_r, level_r, valid_r,
        0.0, max_disp,
    )
    ur0 = xy_r[idx, 0]
    ur, sad, ok = subpixel_refine(img_l, img_r, xy_l, ur0, ok)
    disp = xy_l[:, 0] - ur
    # Clamp near-zero disparity exactly like the reference
    # (src/Frame.cc:1090-1094).
    tiny = (disp >= 0.0) & (disp < 0.01)
    disp = jnp.where(tiny, 0.01, disp)
    ur = jnp.where(tiny, xy_l[:, 0] - 0.01, ur)
    ok = ok & (disp > 0.0) & (disp < max_disp)
    ok = median_outlier_cut(jnp.where(ok, sad, jnp.inf), ok)
    depth = jnp.where(ok, bf / jnp.maximum(disp, 1e-6), -1.0)
    ur = jnp.where(ok, ur, -1.0)
    return ur, depth, ok


@jax.jit
def depth_to_stereo(depth_map, xy_raw, bf, depth_factor):
    """RGB-D: sample the registered depth image at raw keypoint positions
    and synthesize the virtual right coordinate (ComputeStereoFromRGBD,
    src/Frame.cc:1115-1159).

    depth_map (H,W) raw sensor units; depth_factor converts to meters
    (reference mDepthMapFactor). Returns (ur, depth, has_depth) against
    the *raw* (distorted) u — callers that undistort keypoints should
    pass the raw xy here and keep ur consistent with their undistorted u
    by u_ud - bf/d, which is what this returns via the second output.
    """
    H, W = depth_map.shape
    yi = jnp.clip(jnp.round(xy_raw[:, 1]).astype(jnp.int32), 0, H - 1)
    xi = jnp.clip(jnp.round(xy_raw[:, 0]).astype(jnp.int32), 0, W - 1)
    d = depth_map[yi, xi] * depth_factor
    ok = d > 0
    depth = jnp.where(ok, d, -1.0)
    ur = jnp.where(ok, xy_raw[:, 0] - bf / jnp.maximum(d, 1e-6), -1.0)
    return ur, depth, ok


@partial(jax.jit, static_argnames=())
def match_stereo_fisheye(
    bits_l, xy_l, level_l, valid_l,
    bits_r, xy_r, level_r, valid_r,
    cam_l, cam_r, R_rl, t_rl,
    lap_l_start, lap_r_end,
    max_hamming=TH_ORB, max_cos_parallax=0.9998, chi2_th=5.991,
):
    """Unrectified (fisheye) stereo matching + triangulation.

    TPU redesign of Frame::ComputeStereoFishEyeMatches (src/Frame.cc:1304)
    + KannalaBrandt8::TriangulateMatches (src/CameraModels/
    KannalaBrandt8.cpp:364): instead of BoW-node-aligned candidate loops,
    one dense Hamming matrix restricted to the lapping areas
    (u_L >= lap_l_start, u_R <= lap_r_end), mutual-best + threshold, then
    batched midpoint-free DLT triangulation on the unprojected rays with
    the reference's acceptance gates: parallax (cos < 0.9998), positive
    depth in both cameras, reprojection chi2 < 5.991 * sigma2 in both.

    R_rl/t_rl: left-camera -> right-camera transform (reference mTrl).
    Returns (depth_l (N,), ray_l (N,3) unit bearings, ok (N,)).
    Depth is the z-coordinate in the left camera of the triangulated
    point (used to seed stereo observations like the rectified path).
    """
    from . import camera as cam_mod
    from . import geometry

    dist = matching.hamming_matrix(bits_l, bits_r).astype(jnp.float32)
    in_lap = (xy_l[:, 0:1] >= lap_l_start) & (xy_r[None, :, 0] <= lap_r_end)
    pen = jnp.where(in_lap, 0.0, INF)
    # Same-or-adjacent pyramid level gate (reference checks scale
    # consistency through the BoW node structure; +-1 octave here).
    lvl_ok = jnp.abs(level_l[:, None] - level_r[None, :]) <= 1
    pen = jnp.where(lvl_ok, pen, INF)
    idx, ok = matching.match_nn(
        dist, valid_l, valid_r, max_dist=max_hamming, ratio=1.0,
        cross_check=True, extra_penalty=pen,
    )

    ray_l = cam_mod.unproject(cam_l, xy_l)  # (N,3) unit-ish bearings
    ray_r = cam_mod.unproject(cam_r, xy_r[idx])
    ray_l = ray_l / jnp.linalg.norm(ray_l, axis=-1, keepdims=True)
    ray_r = ray_r / jnp.linalg.norm(ray_r, axis=-1, keepdims=True)
    # Parallax between rays expressed in the left frame
    # (KannalaBrandt8.cpp:380-388).
    ray_r_in_l = jnp.einsum("ji,nj->ni", R_rl, ray_r - 0.0)  # R_lr = R_rl^T
    cosp = jnp.sum(ray_l * ray_r_in_l, axis=-1)
    ok = ok & (cosp < max_cos_parallax) & (cosp > 0.0)

    # Triangulate on the normalized image planes of both cameras.
    eye = jnp.eye(3, dtype=xy_l.dtype)
    P1 = jnp.concatenate([eye, jnp.zeros((3, 1), xy_l.dtype)], axis=1)
    P2 = jnp.concatenate([R_rl, t_rl[:, None]], axis=1)
    x1 = ray_l[:, :2] / jnp.maximum(ray_l[:, 2:3], 1e-6)
    x2 = ray_r[:, :2] / jnp.maximum(ray_r[:, 2:3], 1e-6)
    X = geometry.triangulate_dlt(
        jnp.broadcast_to(P1, (x1.shape[0], 3, 4)),
        jnp.broadcast_to(P2, (x1.shape[0], 3, 4)),
        x1, x2,
    )  # (N,3) in left camera
    z1 = X[:, 2]
    Xr = jnp.einsum("ij,nj->ni", R_rl, X) + t_rl
    z2 = Xr[:, 2]
    ok = ok & (z1 > 0) & (z2 > 0)
    # Reprojection gates in both images (KannalaBrandt8.cpp:414-433).
    uv1 = cam_mod.project(cam_l, X)
    uv2 = cam_mod.project(cam_r, Xr)
    sigma2_l = SCALE_FACTOR ** (2.0 * level_l.astype(jnp.float32))
    sigma2_r = SCALE_FACTOR ** (2.0 * level_r[idx].astype(jnp.float32))
    e1 = jnp.sum((uv1 - xy_l) ** 2, axis=-1)
    e2 = jnp.sum((uv2 - xy_r[idx]) ** 2, axis=-1)
    ok = ok & (e1 <= chi2_th * sigma2_l) & (e2 <= chi2_th * sigma2_r)
    depth = jnp.where(ok, z1, -1.0)
    return depth, ray_l, ok
