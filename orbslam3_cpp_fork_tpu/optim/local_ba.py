"""Local bundle adjustment: batched sparse GN/LM with Schur complement.

Replaces g2o's BlockSolver + OptimizationAlgorithmLevenberg pipeline used
by Optimizer::LocalBundleAdjustment (src/Optimizer.cc:1077-1488) and
GlobalBundleAdjustemnt (:46-377) with a TPU-shaped solver:

- The problem is fixed-capacity SoA: K keyframe slots, L landmark slots,
  O observation slots (COO triplets kf x lm x uv), each with validity
  masks — insert/cull never changes shapes, so one compiled program
  serves every local window.
- Per-iteration: all residuals/Jacobians batched (optim/residuals.py),
  normal-equation blocks reduced with segment-sums, landmarks eliminated
  by the Schur complement where the cross term W (K,L,6,3) is kept
  *dense-blocked* — the K^2 L contraction runs on the MXU — and the
  reduced (6K,6K) camera system is solved with Cholesky.
- g2o's edge-level outlier switching (chi2 5.991/7.815) becomes a
  carried inlier mask re-evaluated mid-schedule, and "fixed" vertices
  are rows/cols masked out of the reduced system.
- Levenberg damping is multiplicative on the block diagonals with a
  device-side accept/reject carried through `lax.scan` (no host sync).

The same routine serves the welding BA of map merge (explicit
adjust/fixed KF sets, src/Optimizer.cc:3484) by choosing kf_fixed.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..utils import lie
from . import residuals


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BAProblem:
    """Fixed-capacity BA problem. All observations use centered pixels
    (u-cx, v-cy[, ur-cx]); mono rows carry ur=0 and is_stereo=False."""

    R: jax.Array  # (K,3,3) Tcw rotations
    t: jax.Array  # (K,3)
    kf_valid: jax.Array  # (K,)
    kf_fixed: jax.Array  # (K,)
    Xw: jax.Array  # (L,3)
    lm_valid: jax.Array  # (L,)
    obs_kf: jax.Array  # (O,) int32
    obs_lm: jax.Array  # (O,) int32
    obs_uvr: jax.Array  # (O,3)
    obs_sigma2: jax.Array  # (O,)
    obs_stereo: jax.Array  # (O,)
    obs_valid: jax.Array  # (O,)
    fx: jax.Array
    fy: jax.Array
    bf: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BAResult:
    R: jax.Array
    t: jax.Array
    Xw: jax.Array
    obs_inlier: jax.Array  # (O,) post-gating inlier mask
    cost: jax.Array
    # Slice-chaining state (see local_ba it0/inlier0/lam0).
    inlier_carry: jax.Array = None
    lam: jax.Array = None


def _inv3x3_sym(H: jax.Array) -> jax.Array:
    """Closed-form inverse of batched symmetric 3x3 blocks (...,3,3)."""
    h00, h01, h02 = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    h11, h12, h22 = H[..., 1, 1], H[..., 1, 2], H[..., 2, 2]
    c00 = h11 * h22 - h12 * h12
    c01 = h02 * h12 - h01 * h22
    c02 = h01 * h12 - h02 * h11
    c11 = h00 * h22 - h02 * h02
    c12 = h01 * h02 - h00 * h12
    c22 = h00 * h11 - h01 * h01
    det = h00 * c00 + h01 * c01 + h02 * c02
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    row0 = jnp.stack([c00, c01, c02], -1)
    row1 = jnp.stack([c01, c11, c12], -1)
    row2 = jnp.stack([c02, c12, c22], -1)
    return jnp.stack([row0, row1, row2], -2) / det[..., None, None]


def _residuals(p: BAProblem, R, t, Xw):
    Ro = R[p.obs_kf]
    to = t[p.obs_kf]
    Xo = Xw[p.obs_lm]
    r3, Jp3, Jl3, z = residuals.stereo_reprojection(
        Ro, to, Xo, p.obs_uvr, p.fx, p.fy, p.bf
    )
    row_w = jnp.where(
        p.obs_stereo[:, None], 1.0, jnp.array([1.0, 1.0, 0.0], r3.dtype)
    )
    return r3 * row_w, Jp3 * row_w[..., None], Jl3 * row_w[..., None], z


def _chi2(p: BAProblem, r):
    return jnp.sum(r * r, axis=-1) / p.obs_sigma2


def _delta2(p: BAProblem):
    return jnp.where(p.obs_stereo, residuals.CHI2_STEREO, residuals.CHI2_MONO)


@partial(jax.jit, static_argnames=("iters", "robust"))
def local_ba(
    p: BAProblem,
    iters: int = 10,
    gate_at: int | jax.Array = 5,
    robust: bool = True,
    damping_init: float = 1e-4,
    it0: int | jax.Array = 0,
    inlier0: jax.Array | None = None,
    lam0: jax.Array | None = None,
) -> BAResult:
    """One LM schedule (or a SLICE of one: pass it0/inlier0/lam0 from
    the previous slice's result to chain short dispatches device-side —
    the mapping stage slices its window BA so the tracker's per-frame
    program never queues behind more than ~2 LM iterations of device
    work on a single chip)."""
    K = p.R.shape[0]
    L = p.Xw.shape[0]

    kf_free = p.kf_valid & ~p.kf_fixed  # (K,)
    free_f = kf_free.astype(jnp.float32)

    def build_cost(R, t, Xw, inlier):
        r, _, _, z = _residuals(p, R, t, Xw)
        chi2 = _chi2(p, r)
        active = inlier & p.obs_valid & (z > 0)
        d2 = _delta2(p)
        if robust:
            # Huber cost: chi2 below delta2, 2 delta sqrt(chi2) - delta2 above.
            rho = jnp.where(
                chi2 <= d2, chi2, 2.0 * jnp.sqrt(d2 * jnp.maximum(chi2, 0.0)) - d2
            )
        else:
            rho = chi2
        return jnp.sum(jnp.where(active, rho, 0.0))

    def step(carry, it):
        R, t, Xw, inlier, lam = carry
        r, Jp, Jl, z = _residuals(p, R, t, Xw)
        chi2 = _chi2(p, r)
        # Mid-schedule outlier gate (reference re-classifies after the
        # first optimization pass) — from the residuals of THIS state,
        # shared with the normal-equation build below.
        gate_now = it == jnp.int32(gate_at)  # gate_at traced: one program
        # per (shape-bucket, iters) pair regardless of schedule length.
        new_inlier = p.obs_valid & (chi2 <= _delta2(p)) & (z > 0)
        inlier = jnp.where(gate_now, new_inlier, inlier)

        active = inlier & p.obs_valid & (z > 0)
        w_huber = (
            residuals.huber_weight(chi2, _delta2(p)) if robust else jnp.ones_like(chi2)
        )
        wgt = active.astype(r.dtype) * w_huber / p.obs_sigma2  # (O,)

        # Normal-equation blocks.
        JpW = Jp * wgt[:, None, None]  # (O,3,6) pre-weighted
        Hcc = jnp.zeros((K, 6, 6)).at[p.obs_kf].add(
            jnp.einsum("ori,orj->oij", JpW, Jp)
        )
        bc = jnp.zeros((K, 6)).at[p.obs_kf].add(
            -jnp.einsum("ori,or->oi", JpW, r)
        )
        Hll = jnp.zeros((L, 3, 3)).at[p.obs_lm].add(
            jnp.einsum("ori,orj->oij", Jl * wgt[:, None, None], Jl)
        )
        bl = jnp.zeros((L, 3)).at[p.obs_lm].add(
            -jnp.einsum("ori,or->oi", Jl * wgt[:, None, None], r)
        )
        Wd = jnp.zeros((K, L, 6, 3)).at[p.obs_kf, p.obs_lm].add(
            jnp.einsum("ori,orj->oij", JpW, Jl)
        )

        # Damped landmark blocks and their inverses (explicit adjugate:
        # batched-small jnp.linalg.inv lowers to a scalarized LU loop on
        # TPU; the closed form is pure elementwise VPU work).
        dHll = Hll + (lam * jnp.einsum("lii->l", Hll) / 3.0 + 1e-9)[
            :, None, None
        ] * jnp.eye(3)
        Hll_inv = _inv3x3_sym(dHll)
        Hll_inv = jnp.where(p.lm_valid[:, None, None], Hll_inv, 0.0)

        # Schur complement on the MXU.
        T = jnp.einsum("alip,lpq->aliq", Wd, Hll_inv)  # (K,L,6,3)
        S = -jnp.einsum("aliq,bljq->aibj", T, Wd)  # (K,6,K,6)
        S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(Hcc)
        rhs = bc - jnp.einsum("aliq,lq->ai", T, bl)  # (K,6)

        # Camera damping + freeze fixed/invalid KFs.
        diag_scale = 1.0 + lam
        Sm = S.reshape(K * 6, K * 6)
        dmask = (free_f[:, None] * free_f[None, :])[:, None, :, None] * jnp.ones(
            (1, 6, 1, 6)
        )
        Sm = (S * dmask).reshape(K * 6, K * 6)
        idx = jnp.arange(K * 6)
        diag = Sm[idx, idx]
        free6 = jnp.repeat(free_f, 6)
        # Fixed rows get identity; free diagonal gets LM scaling.
        Sm = Sm.at[idx, idx].set(
            jnp.where(free6 > 0, diag * diag_scale + 1e-8, 1.0)
        )
        rhs_v = (rhs * free_f[:, None]).reshape(K * 6)

        dxc = jnp.linalg.solve(Sm, rhs_v).reshape(K, 6)
        dxc = dxc * free_f[:, None]
        # Back-substitute landmarks.
        bl_corr = bl - jnp.einsum("alip,ai->lp", Wd, dxc)
        dxl = jnp.einsum("lpq,lq->lp", Hll_inv, bl_corr)
        dxl = dxl * p.lm_valid[:, None].astype(dxl.dtype)

        # Candidate update.
        dR, dt = lie.se3_exp(dxc)
        R_new = jnp.einsum("kij,kjl->kil", dR, R)
        t_new = jnp.einsum("kij,kj->ki", dR, t) + dt
        R_new = lie.so3_normalize(R_new)
        Xw_new = Xw + dxl

        ok = (
            jnp.all(jnp.isfinite(dxc))
            & jnp.all(jnp.isfinite(dxl))
        )
        # cost_old from the already-computed residuals (no extra pass).
        d2 = _delta2(p)
        if robust:
            rho = jnp.where(
                chi2 <= d2,
                chi2,
                2.0 * jnp.sqrt(d2 * jnp.maximum(chi2, 0.0)) - d2,
            )
        else:
            rho = chi2
        cost_old = jnp.sum(jnp.where(active, rho, 0.0))
        cost_new = build_cost(R_new, t_new, Xw_new, inlier)
        accept = ok & (cost_new < cost_old)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-7), jnp.minimum(lam * 4.0, 1e2))
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        Xw = jnp.where(accept, Xw_new, Xw)
        return (R, t, Xw, inlier, lam), cost_old

    init = (
        p.R, p.t, p.Xw,
        p.obs_valid if inlier0 is None else inlier0,
        jnp.float32(damping_init) if lam0 is None else lam0,
    )
    # `it0` is TRACED (a dynamic slice offset): making it static would
    # compile one program per slice position of the chained schedule.
    (R, t, Xw, inlier, lam), costs = jax.lax.scan(
        step, init, jnp.int32(it0) + jnp.arange(iters, dtype=jnp.int32)
    )
    # Final inlier classification.
    r, _, _, z = _residuals(p, R, t, Xw)
    inlier_final = p.obs_valid & (_chi2(p, r) <= _delta2(p)) & (z > 0)
    return BAResult(
        R=R, t=t, Xw=Xw, obs_inlier=inlier_final,
        cost=build_cost(R, t, Xw, inlier_final),
        inlier_carry=inlier, lam=lam,
    )
