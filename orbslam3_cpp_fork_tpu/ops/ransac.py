"""Batched-hypothesis RANSAC solvers.

The reference runs sequential RANSAC loops (200 iterations for two-view
init in two std::threads, src/TwoViewReconstruction.cc:94-141; up to 300
for Sim3, src/Sim3Solver.cc:154; adaptive for MLPnP,
src/MLPnPsolver.cpp:105). On TPU every hypothesis is generated, solved
(batched SVD/eigendecomposition), and scored against all points in one
vmapped program — RANSAC becomes three fused kernels with no host loop.

Solvers:
- `reconstruct_two_views`: monocular initializer. 8-point F and DLT H on
  the same hypothesis sets, model selection by score ratio RH>0.5, motion
  recovery from E (4 candidates) or Faugeras H decomposition
  (8 candidates), cheirality scoring — mirroring
  TwoViewReconstruction::{Reconstruct,ReconstructF,ReconstructH}.
- `mlpnp_ransac`: relocalization PnP with the reference's
  maximum-likelihood nullspace formulation (MLPnPsolver::computePose,
  src/MLPnPsolver.cpp:355-560, after Urban et al. MLPnP): per-bearing
  2D nullspace residuals, 12-unknown (or 9-unknown planar) linear
  system per hypothesis, then Gauss-Newton refinement of the winning
  pose on all inliers minimizing the nullspace residuals
  (mlpnp_gn, src/MLPnPsolver.cpp:701). `pnp_ransac` keeps the simpler
  6-point DLT resection as a baseline.
- `sim3_ransac`: Horn closed-form Sim3/SE3 alignment (Sim3Solver) with
  the 4x4 quaternion eigen-system solved by batched `eigh`.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from . import geometry
from ..utils import lie

CHI2_1DOF = 3.841
CHI2_2DOF = 5.991


def _sample_indices(key, n_hyp: int, k: int, valid: jax.Array) -> jax.Array:
    """(n_hyp, k) random index sets drawn from *valid* slots only.

    Inputs are fixed-capacity masked arrays, so uniform sampling over the
    raw range would almost never produce an all-valid minimal set when
    the fill ratio is low; instead sample positions modulo the valid
    count and map through a valid-first permutation. Duplicate indices
    within a hypothesis produce degenerate models that score poorly, so
    no rejection loop is needed."""
    n = valid.shape[0]
    order = jnp.argsort(~valid)  # stable: valid indices first
    nv = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)
    raw = jax.random.randint(key, (n_hyp, k), 0, n)
    return order[raw % nv]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TwoViewResult:
    success: jax.Array  # bool
    R: jax.Array  # (3,3) cam1->cam2
    t: jax.Array  # (3,)
    points: jax.Array  # (N,3) in cam1 frame
    good: jax.Array  # (N,) triangulated-inlier mask
    parallax: jax.Array  # scalar, degrees (median of inliers)


def _score_fundamental(F, x1, x2, valid, sigma2):
    e1, e2 = geometry.epipolar_sq_errors(F, x1, x2)
    chi1 = e1 / sigma2
    chi2 = e2 / sigma2
    ok1 = chi1 <= CHI2_1DOF
    ok2 = chi2 <= CHI2_1DOF
    score = jnp.where(ok1 & valid, CHI2_2DOF - chi1, 0.0) + jnp.where(
        ok2 & valid, CHI2_2DOF - chi2, 0.0
    )
    return jnp.sum(score), ok1 & ok2 & valid


def _score_homography(H, x1, x2, valid, sigma2):
    e1, e2 = geometry.homography_sq_errors(H, x1, x2)
    chi1 = e1 / sigma2
    chi2 = e2 / sigma2
    ok1 = chi1 <= CHI2_2DOF
    ok2 = chi2 <= CHI2_2DOF
    score = jnp.where(ok1 & valid, CHI2_2DOF - chi1, 0.0) + jnp.where(
        ok2 & valid, CHI2_2DOF - chi2, 0.0
    )
    return jnp.sum(score), ok1 & ok2 & valid


def _faugeras_solutions(H: jax.Array, K: jax.Array):
    """8 (R, t) candidates from a homography (ReconstructH,
    src/TwoViewReconstruction.cc:637-814)."""
    A = jnp.linalg.inv(K) @ H @ K
    U, d, Vt = jnp.linalg.svd(A)
    V = Vt.T
    s = jnp.linalg.det(U) * jnp.linalg.det(V)
    d1, d2, d3 = d[0], d[1], d[2]
    denom = jnp.maximum(d1 * d1 - d3 * d3, 1e-12)
    aux1 = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) / denom, 0.0, None))
    aux3 = jnp.sqrt(jnp.clip((d2 * d2 - d3 * d3) / denom, 0.0, None))
    x1s = jnp.array([1.0, 1.0, -1.0, -1.0]) * aux1
    x3s = jnp.array([1.0, -1.0, 1.0, -1.0]) * aux3

    Rs, ts = [], []
    # Case d' = +d2.
    den_p = jnp.maximum((d1 + d3) * d2, 1e-12)
    aux_st = jnp.sqrt(
        jnp.clip((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0, None)
    ) / den_p
    ct = (d2 * d2 + d1 * d3) / den_p
    st_signs = jnp.array([1.0, -1.0, -1.0, 1.0])
    for i in range(4):
        st = st_signs[i] * aux_st
        Rp = jnp.array(
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
        )
        Rp = Rp.at[0, 0].set(ct).at[2, 2].set(ct).at[0, 2].set(-st).at[2, 0].set(st)
        R = s * U @ Rp @ Vt
        tp = jnp.array([1.0, 0.0, -1.0]) * jnp.stack([x1s[i], 0.0, x3s[i]]) * (d1 - d3)
        t = U @ tp
        Rs.append(R)
        ts.append(t / jnp.maximum(jnp.linalg.norm(t), 1e-12))
    # Case d' = -d2.
    den_m = jnp.maximum((d1 - d3) * d2, 1e-12)
    aux_sp = jnp.sqrt(
        jnp.clip((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0, None)
    ) / den_m
    cp = (d1 * d3 - d2 * d2) / den_m
    sp_signs = jnp.array([1.0, -1.0, -1.0, 1.0])
    for i in range(4):
        sp = sp_signs[i] * aux_sp
        Rp = jnp.array(
            [[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]]
        )
        Rp = Rp.at[0, 0].set(cp).at[2, 2].set(-cp).at[0, 2].set(sp).at[2, 0].set(sp)
        R = s * U @ Rp @ Vt
        tp = jnp.stack([x1s[i], 0.0, x3s[i]]) * (d1 + d3)
        t = U @ tp
        Rs.append(R)
        ts.append(t / jnp.maximum(jnp.linalg.norm(t), 1e-12))
    return jnp.stack(Rs), jnp.stack(ts)


@partial(jax.jit, static_argnames=("n_hyp",))
def reconstruct_two_views(
    x1: jax.Array,
    x2: jax.Array,
    valid: jax.Array,
    K: jax.Array,
    key: jax.Array,
    n_hyp: int = 256,
    sigma: float = 1.0,
    min_parallax_deg: float = 1.0,
    min_triangulated: int = 50,
) -> TwoViewResult:
    """Monocular map initialization from matched undistorted pixels.

    x1, x2: (N,2) pixel correspondences (same index = same match),
    valid: (N,) mask. Returns pose of camera 2 w.r.t camera 1 (R21, t21)
    and triangulated points in camera-1 coordinates.
    """
    sigma2 = sigma * sigma
    n = x1.shape[0]
    x1n, T1 = geometry.normalize_points(x1, valid)
    x2n, T2 = geometry.normalize_points(x2, valid)
    idx = _sample_indices(key, n_hyp, 8, valid)
    hyp_ok = jnp.all(valid[idx], axis=1)

    # --- Fundamental hypotheses (normalized space, then denormalize).
    Fn = jax.vmap(geometry.fundamental_8pt)(x1n[idx], x2n[idx])
    F = jnp.einsum("ji,njk,kl->nil", T2, Fn, T1)  # T2^T Fn T1
    sF, _ = jax.vmap(lambda f: _score_fundamental(f, x1, x2, valid, sigma2))(F)
    sF = jnp.where(hyp_ok, sF, -1.0)
    bF = jnp.argmax(sF)
    # Polish: refit on all inliers of the winning hypothesis (twice).
    F_best = F[bF]
    for _ in range(2):
        _, inl = _score_fundamental(F_best, x1, x2, valid, sigma2)
        Fn_ref = geometry.fundamental_weighted(x1n, x2n, inl.astype(x1.dtype))
        F_best = T2.T @ Fn_ref @ T1
    score_F, inl_F = _score_fundamental(F_best, x1, x2, valid, sigma2)

    # --- Homography hypotheses.
    Hn = jax.vmap(geometry.homography_dlt)(x1n[idx], x2n[idx])
    T2inv = jnp.linalg.inv(T2)
    H = jnp.einsum("ij,njk,kl->nil", T2inv, Hn, T1)
    sH, _ = jax.vmap(lambda h: _score_homography(h, x1, x2, valid, sigma2))(H)
    sH = jnp.where(hyp_ok, sH, -1.0)
    bH = jnp.argmax(sH)
    H_best = H[bH]
    for _ in range(2):
        _, inl = _score_homography(H_best, x1, x2, valid, sigma2)
        Hn_ref = geometry.homography_weighted(x1n, x2n, inl.astype(x1.dtype))
        H_best = jnp.linalg.inv(T2) @ Hn_ref @ T1
    score_H, inl_H = _score_homography(H_best, x1, x2, valid, sigma2)

    rh = score_H / jnp.maximum(score_H + score_F, 1e-9)
    use_H = rh > 0.5

    # --- Motion candidates: 4 from E, 8 from H; inactive set masked out.
    E = K.T @ F_best @ K
    R1e, R2e, te = geometry.decompose_essential(E)
    R_E = jnp.stack([R1e, R1e, R2e, R2e])
    t_E = jnp.stack([te, -te, te, -te])
    R_H, t_H = _faugeras_solutions(H_best, K)
    R_all = jnp.concatenate([R_E, R_H])  # (12,3,3)
    t_all = jnp.concatenate([t_E, t_H])
    active = jnp.concatenate(
        [jnp.full((4,), ~use_H), jnp.full((8,), use_H)]
    )
    inliers = jnp.where(use_H, inl_H, inl_F)

    th2 = 4.0 * sigma2

    def eval_rt(R, t):
        return geometry.check_rt(R, t, x1, x2, K, inliers, th2)

    n_good, good, par, X = jax.vmap(eval_rt)(R_all, t_all)
    n_good = jnp.where(active, n_good, -1)
    best = jnp.argmax(n_good)
    n_best = n_good[best]
    n_inl = jnp.sum(inliers.astype(jnp.int32))
    # Uniqueness: second-best candidate must be clearly worse (reference
    # requires nsimilar<=1 with 0.75*maxGood threshold).
    n_sorted = jnp.sort(n_good)
    second = n_sorted[-2]
    unique = second.astype(jnp.float32) < 0.75 * n_best.astype(jnp.float32)

    good_best = good[best]
    # Median parallax over good points (reference takes the 50th smallest).
    par_best = par[best]
    n_g = jnp.maximum(jnp.sum(good_best.astype(jnp.int32)), 1)
    par_sorted = jnp.sort(jnp.where(good_best, par_best, jnp.inf))
    med_par = par_sorted[jnp.minimum(n_g // 2, n - 1)]
    med_par = jnp.where(jnp.isfinite(med_par), med_par, 0.0)

    success = (
        (n_best >= min_triangulated)
        & (n_best.astype(jnp.float32) > 0.8 * n_inl.astype(jnp.float32))
        & unique
        & (med_par > min_parallax_deg)
    )
    return TwoViewResult(
        success=success,
        R=R_all[best],
        t=t_all[best],
        points=X[best],
        good=good_best,
        parallax=med_par,
    )


# ----------------------------------------------------------------------------
# PnP (relocalization) — DLT resection hypotheses + reprojection scoring.
# ----------------------------------------------------------------------------


def _dlt_pnp(Xw: jax.Array, xn: jax.Array):
    """Camera resection from 6 3D-2D pairs; xn are ideal (K-free)
    normalized image coordinates. Returns (R, t)."""
    X, Y, Z = Xw[:, 0], Xw[:, 1], Xw[:, 2]
    u, v = xn[:, 0], xn[:, 1]
    o = jnp.ones_like(X)
    z = jnp.zeros_like(X)
    r1 = jnp.stack([X, Y, Z, o, z, z, z, z, -u * X, -u * Y, -u * Z, -u], axis=-1)
    r2 = jnp.stack([z, z, z, z, X, Y, Z, o, -v * X, -v * Y, -v * Z, -v], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)  # (12,12)
    _, _, vt = jnp.linalg.svd(A)
    P = vt[11].reshape(3, 4)
    M = P[:, :3]
    # Orthonormalize: M = s R.
    U, S, Vt = jnp.linalg.svd(M)
    R = U @ Vt
    detR = jnp.linalg.det(R)
    R = R * jnp.sign(detR)
    scale = jnp.mean(S) * jnp.sign(detR)
    t = P[:, 3] / jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
    # Cheirality: majority of points must have positive depth; else flip.
    zc = (R @ Xw.T).T[:, 2] + t[2]
    flip = jnp.sum(jnp.sign(zc)) < 0
    R = jnp.where(flip, -R, R)
    t = jnp.where(flip, -t, t)
    # Re-orthonormalize sign flip (det(-R) = -1 for 3x3).
    U2, _, Vt2 = jnp.linalg.svd(R)
    D = jnp.diag(jnp.array([1.0, 1.0, jnp.linalg.det(U2 @ Vt2)]))
    R = U2 @ D @ Vt2
    return R, t


@partial(jax.jit, static_argnames=("n_hyp",))
def pnp_ransac(
    Xw: jax.Array,
    uv: jax.Array,
    valid: jax.Array,
    K: jax.Array,
    key: jax.Array,
    n_hyp: int = 128,
    px_threshold: float = 5.99,
    sigma2: jax.Array | None = None,
):
    """RANSAC PnP: world points (N,3) vs undistorted pixels (N,2).

    Returns (R, t, inliers, n_inliers, success). Pixel threshold is on
    squared reprojection error / sigma^2, with `sigma2` (N,) the
    per-observation octave variance (defaults to 1).
    """
    n = Xw.shape[0]
    if sigma2 is None:
        sigma2 = jnp.ones(n, Xw.dtype)
    Kinv = jnp.linalg.inv(K)
    uvh = jnp.concatenate([uv, jnp.ones_like(uv[:, :1])], axis=-1)
    xn = (uvh @ Kinv.T)[:, :2]
    idx = _sample_indices(key, n_hyp, 6, valid)
    hyp_ok = jnp.all(valid[idx], axis=1)
    R_h, t_h = jax.vmap(_dlt_pnp)(Xw[idx], xn[idx])

    def score(R, t):
        Xc = (R @ Xw.T).T + t
        uv_p = (K @ (Xc / jnp.maximum(Xc[:, 2:3], 1e-9)).T).T[:, :2]
        e = jnp.sum((uv_p - uv) ** 2, axis=-1)
        inl = valid & (Xc[:, 2] > 0) & (e < px_threshold * sigma2)
        return jnp.sum(inl.astype(jnp.int32)), inl

    n_inl, inl = jax.vmap(score)(R_h, t_h)
    n_inl = jnp.where(hyp_ok, n_inl, -1)
    best = jnp.argmax(n_inl)
    return (
        R_h[best],
        t_h[best],
        inl[best],
        n_inl[best],
        n_inl[best] >= 10,
    )


# ----------------------------------------------------------------------------
# ML-PnP (relocalization) — nullspace bearing-vector formulation.
# ----------------------------------------------------------------------------


def _bearing_nullspaces(v: jax.Array) -> jax.Array:
    """(N,3) unit bearings -> (N,2,3) orthonormal nullspace bases
    (the r/s tangent vectors of MLPnPsolver::computePose,
    src/MLPnPsolver.cpp:367-381, computed by cross products instead of
    per-vector SVDs)."""
    ex = jnp.array([1.0, 0.0, 0.0], v.dtype)
    ey = jnp.array([0.0, 1.0, 0.0], v.dtype)
    e = jnp.where(jnp.abs(v[:, :1]) > 0.9, ey[None, :], ex[None, :])
    r = jnp.cross(v, e)
    r = r / jnp.maximum(jnp.linalg.norm(r, axis=-1, keepdims=True), 1e-12)
    s = jnp.cross(v, r)
    return jnp.stack([r, s], axis=1)


def _so3_frobenius(M: jax.Array) -> jax.Array:
    """Closest-rotation projection with the sign convention of the
    reference (negate the whole matrix when det<0 — valid because the
    linear solution is defined only up to global sign)."""
    U, _, Vt = jnp.linalg.svd(M)
    R = U @ Vt
    return R * jnp.sign(jnp.linalg.det(R))


def _mlpnp_linear(X: jax.Array, ns: jax.Array, v: jax.Array):
    """One ML-PnP linear solve from a minimal set.

    X: (k,3) world points, ns: (k,2,3) bearing nullspaces, v: (k,3)
    unit bearings (for disambiguation only). Returns
    (R, t) with camera-frame point p = R X + t. Solves both the general
    12-unknown system and the planar 9-unknown eigenframe system
    (src/MLPnPsolver.cpp:384-406,445-478) and selects by a rank test on
    sum(X X^T); sign/direction ambiguities are resolved by bearing
    alignment over the minimal set."""
    k = X.shape[0]
    n_flat = ns.reshape(2 * k, 3)  # nullspace rows, point-major
    X2 = jnp.repeat(X, 2, axis=0)  # matching world point per row

    # --- General case: unknowns m = [R row-major (9), t (3)].
    # Flattened unknown layout after the reshape is row-interleaved:
    # [R00 R01 R02 t0 | R10 R11 R12 t1 | R20 R21 R22 t2].
    A12 = jnp.concatenate(
        [n_flat[:, :, None] * X2[:, None, :], n_flat[:, :, None]], axis=2
    ).reshape(2 * k, 12)
    _, V12 = jnp.linalg.eigh(A12.T @ A12)
    m = V12[:, 0]
    M = m[jnp.array([0, 1, 2, 4, 5, 6, 8, 9, 10])].reshape(3, 3)
    col_n = jnp.linalg.norm(M, axis=0)
    scale_g = jnp.cbrt(jnp.maximum(col_n[0] * col_n[1] * col_n[2], 1e-12))
    R_g = _so3_frobenius(M)
    t_g = m[jnp.array([3, 7, 11])] / scale_g

    # --- Planar case: rotate points into the eigenframe of sum X X^T
    # (first axis = plane normal); only eigen-columns 2,3 of R' = R E
    # are observable. Unknowns m9 = [R'[:,1] | R'[:,2] | t].
    S = X.T @ X
    w_eig, E = jnp.linalg.eigh(S)  # ascending
    # eigh may return an improper basis; flip the (sign-arbitrary)
    # normal column so E is a rotation, else R' E^T is a reflection.
    E = E.at[:, 0].multiply(jnp.sign(jnp.linalg.det(E)))
    planar = w_eig[0] < 1e-5 * jnp.maximum(w_eig[2], 1e-12)
    Xp = X @ E
    Xp2 = jnp.repeat(Xp, 2, axis=0)
    A9 = jnp.concatenate(
        [
            n_flat[:, :, None] * Xp2[:, None, 1:2],
            n_flat[:, :, None] * Xp2[:, None, 2:3],
            n_flat[:, :, None],
        ],
        axis=2,
    ).reshape(2 * k, 9)[:, [0, 3, 6, 1, 4, 7, 2, 5, 8]]
    # column order: [c1 (3), c2 (3), t (3)]
    _, V9 = jnp.linalg.eigh(A9.T @ A9)
    m9 = V9[:, 0]
    c1 = m9[0:3]
    c2 = m9[3:6]
    scale_p = jnp.sqrt(
        jnp.maximum(jnp.linalg.norm(c1) * jnp.linalg.norm(c2), 1e-12)
    )
    c0 = jnp.cross(c1, c2)
    c0 = c0 / jnp.maximum(jnp.linalg.norm(c0), 1e-12) * scale_p
    t_p = m9[6:9] / scale_p

    # Sign ambiguities (src/MLPnPsolver.cpp:566-600): the plane-normal
    # column c0 is unobservable up to sign (s0), and the solution vector
    # is global-sign ambiguous, flipping (c1, c2, t) together (s1):
    # four planar candidates. General case: R fixed, t sign ambiguous.
    def planar_cand(s0, s1):
        Mp = jnp.stack([s0 * c0, s1 * c1, s1 * c2], axis=1)
        return _so3_frobenius(Mp) @ E.T, s1 * t_p

    Rp1, tp1 = planar_cand(1.0, 1.0)
    Rp2, tp2 = planar_cand(1.0, -1.0)
    Rp3, tp3 = planar_cand(-1.0, 1.0)
    Rp4, tp4 = planar_cand(-1.0, -1.0)
    cands_R = jnp.where(
        planar,
        jnp.stack([Rp1, Rp2, Rp3, Rp4]),
        jnp.stack([R_g, R_g, R_g, R_g]),
    )
    cands_t = jnp.where(
        planar,
        jnp.stack([tp1, tp2, tp3, tp4]),
        jnp.stack([t_g, -t_g, t_g, -t_g]),
    )

    # Resolve by bearing alignment + cheirality on the minimal set
    # (src/MLPnPsolver.cpp:585-646).
    def align_err(R, t):
        p = (R @ X.T).T + t
        u = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-12)
        d = jnp.sum(u * v, axis=-1)
        return jnp.sum(1.0 - d) + 10.0 * jnp.sum(p[:, 2] < 0)

    errs = jax.vmap(align_err)(cands_R, cands_t)
    best = jnp.argmin(errs)
    return cands_R[best], cands_t[best]


def _mlpnp_gn(R, t, Xw, ns, w, iters: int):
    """Gauss-Newton on the nullspace residuals over the inlier set
    (mlpnp_gn, src/MLPnPsolver.cpp:701-819; Jacobians by autodiff
    instead of the generated mlpnpJacs)."""

    def residuals(dx, R, t):
        Rp = lie.so3_exp(dx[:3]) @ R
        tp = t + dx[3:]
        p = (Rp @ Xw.T).T + tp
        u = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-12)
        r = jnp.einsum("nkj,nj->nk", ns, u)
        return (r * w[:, None]).reshape(-1)

    def body(_, state):
        R, t = state
        z = jnp.zeros((6,), Xw.dtype)
        r0 = residuals(z, R, t)
        J = jax.jacfwd(residuals)(z, R, t)
        H = J.T @ J + 1e-8 * jnp.eye(6, dtype=Xw.dtype)
        dx = -jnp.linalg.solve(H, J.T @ r0)
        ok = jnp.all(jnp.isfinite(dx))
        dx = jnp.where(ok, dx, 0.0)
        return (lie.so3_exp(dx[:3]) @ R, t + dx[3:])

    return jax.lax.fori_loop(0, iters, body, (R, t))


@partial(jax.jit, static_argnames=("n_hyp", "gn_iters"))
def mlpnp_ransac(
    Xw: jax.Array,
    uv: jax.Array,
    valid: jax.Array,
    K: jax.Array,
    key: jax.Array,
    n_hyp: int = 128,
    px_threshold: float = 5.99,
    gn_iters: int = 4,
    sigma2: jax.Array | None = None,
):
    """Maximum-likelihood PnP RANSAC (MLPnPsolver::iterate,
    src/MLPnPsolver.cpp:105): world points (N,3) vs ideal-pinhole
    pixels (N,2) with intrinsics K. Every minimal set is solved with
    the nullspace formulation in one vmap, the winner's pose is
    Gauss-Newton-refined on its inliers, and scoring is the reference's
    pixel reprojection + cheirality check (CheckInliers,
    src/MLPnPsolver.cpp:307-340). `sigma2` (N,) scales the squared-pixel
    gate per observation octave (mvMaxError[i] = mvSigma2[i]*th2,
    src/MLPnPsolver.cpp:263-289) so coarse-pyramid keypoints are not
    systematically rejected.

    Returns (R, t, inliers, n_inliers, success).
    """
    if sigma2 is None:
        sigma2 = jnp.ones(Xw.shape[0], Xw.dtype)
    Kinv = jnp.linalg.inv(K)
    uvh = jnp.concatenate([uv, jnp.ones_like(uv[:, :1])], axis=-1)
    bear = uvh @ Kinv.T
    bear = bear / jnp.maximum(
        jnp.linalg.norm(bear, axis=-1, keepdims=True), 1e-12
    )
    ns = _bearing_nullspaces(bear)

    idx = _sample_indices(key, n_hyp, 6, valid)
    hyp_ok = jnp.all(valid[idx], axis=1)
    R_h, t_h = jax.vmap(_mlpnp_linear)(Xw[idx], ns[idx], bear[idx])

    def score(R, t):
        Xc = (R @ Xw.T).T + t
        uv_p = (K @ (Xc / jnp.maximum(Xc[:, 2:3], 1e-9)).T).T[:, :2]
        e = jnp.sum((uv_p - uv) ** 2, axis=-1)
        inl = valid & (Xc[:, 2] > 0) & (e < px_threshold * sigma2)
        return jnp.sum(inl.astype(jnp.int32)), inl

    n_inl, inl = jax.vmap(score)(R_h, t_h)
    n_inl = jnp.where(hyp_ok, n_inl, -1)
    best = jnp.argmax(n_inl)
    R_b, t_b = R_h[best], t_h[best]
    # Refine on the winning hypothesis' inliers, then rescore.
    w = inl[best].astype(Xw.dtype)
    R_r, t_r = _mlpnp_gn(R_b, t_b, Xw, ns, w, gn_iters)
    n_ref, inl_ref = score(R_r, t_r)
    use_ref = n_ref >= n_inl[best]
    R_f = jnp.where(use_ref, R_r, R_b)
    t_f = jnp.where(use_ref, t_r, t_b)
    n_f = jnp.where(use_ref, n_ref, n_inl[best])
    inl_f = jnp.where(use_ref, inl_ref, inl[best])
    return R_f, t_f, inl_f, n_f, n_f >= 10


# ----------------------------------------------------------------------------
# Sim3 (loop closing) — Horn closed form.
# ----------------------------------------------------------------------------


def horn_sim3(pa: jax.Array, pb: jax.Array, fix_scale: bool = False):
    """Closed-form similarity aligning point sets: pb ~ s R pa + t
    (Sim3Solver::ComputeSim3, src/Sim3Solver.cc:310, Horn 1987)."""
    ca = jnp.mean(pa, axis=0)
    cb = jnp.mean(pb, axis=0)
    a = pa - ca
    b = pb - cb
    M = a.T @ b  # (3,3)
    Sxx, Sxy, Sxz = M[0, 0], M[0, 1], M[0, 2]
    Syx, Syy, Syz = M[1, 0], M[1, 1], M[1, 2]
    Szx, Szy, Szz = M[2, 0], M[2, 1], M[2, 2]
    N = jnp.array(
        [
            [Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx],
            [Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz],
            [Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy],
            [Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz],
        ]
    )
    vals, vecs = jnp.linalg.eigh(N)
    q_wxyz = vecs[:, 3]  # largest eigenvalue
    q = jnp.stack([q_wxyz[1], q_wxyz[2], q_wxyz[3], q_wxyz[0]])  # (x,y,z,w)
    R = lie.quat_to_rot(q)
    Ra = (R @ a.T).T
    if fix_scale:
        s = jnp.float32(1.0)
    else:
        s = jnp.sum(b * Ra) / jnp.maximum(jnp.sum(Ra * Ra), 1e-12)
    t = cb - s * (R @ ca)
    return s, R, t


@partial(jax.jit, static_argnames=("n_hyp", "fix_scale"))
def sim3_ransac(
    pa: jax.Array,
    pb: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    n_hyp: int = 128,
    fix_scale: bool = False,
    threshold: float = 0.05,
):
    """RANSAC Horn alignment of matched 3D point sets (camera-frame map
    points of two keyframes, as in Sim3Solver). `threshold` is a relative
    euclidean error (|| s R pa + t - pb || / depth-scale); the reference
    checks reprojection instead — callers can re-verify by projection.
    Returns (s, R, t, inliers, n_inliers, success)."""
    n = pa.shape[0]
    idx = _sample_indices(key, n_hyp, 3, valid)
    hyp_ok = jnp.all(valid[idx], axis=1)

    def solve(i):
        return horn_sim3(pa[i], pb[i], fix_scale)

    s_h, R_h, t_h = jax.vmap(solve)(idx)

    scale_ref = jnp.maximum(jnp.mean(jnp.linalg.norm(pb, axis=-1), where=valid), 1e-6)

    def score(s, R, t):
        pred = s * (R @ pa.T).T + t
        e = jnp.linalg.norm(pred - pb, axis=-1) / scale_ref
        inl = valid & (e < threshold)
        return jnp.sum(inl.astype(jnp.int32)), inl

    n_inl, inl = jax.vmap(score)(s_h, R_h, t_h)
    n_inl = jnp.where(hyp_ok, n_inl, -1)
    best = jnp.argmax(n_inl)
    # Refine on the inliers of the best hypothesis (one LS pass).
    inl_b = inl[best]
    w = inl_b.astype(jnp.float32)[:, None]
    nw = jnp.maximum(jnp.sum(w), 3.0)
    # Weighted Horn: re-run on inlier-weighted centroids.
    ca = jnp.sum(pa * w, axis=0) / nw
    cb = jnp.sum(pb * w, axis=0) / nw
    a = (pa - ca) * w
    b = (pb - cb) * w
    M = a.T @ b
    N = jnp.array(
        [
            [M[0, 0] + M[1, 1] + M[2, 2], M[1, 2] - M[2, 1], M[2, 0] - M[0, 2], M[0, 1] - M[1, 0]],
            [M[1, 2] - M[2, 1], M[0, 0] - M[1, 1] - M[2, 2], M[0, 1] + M[1, 0], M[2, 0] + M[0, 2]],
            [M[2, 0] - M[0, 2], M[0, 1] + M[1, 0], -M[0, 0] + M[1, 1] - M[2, 2], M[1, 2] + M[2, 1]],
            [M[0, 1] - M[1, 0], M[2, 0] + M[0, 2], M[1, 2] + M[2, 1], -M[0, 0] - M[1, 1] + M[2, 2]],
        ]
    )
    vals, vecs = jnp.linalg.eigh(N)
    qw = vecs[:, 3]
    q = jnp.stack([qw[1], qw[2], qw[3], qw[0]])
    R = lie.quat_to_rot(q)
    Ra = (R @ ((pa - ca) * w).T).T
    if fix_scale:
        s = jnp.float32(1.0)
    else:
        s = jnp.sum((pb - cb) * w * Ra) / jnp.maximum(jnp.sum(Ra * Ra), 1e-12)
    t = cb - s * (R @ ca)
    n_ref, inl_ref = score(s, R, t)
    return s, R, t, inl_ref, n_ref, n_ref >= 6
