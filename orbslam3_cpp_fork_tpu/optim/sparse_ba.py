"""Map-scale bundle adjustment: block-sparse Schur with matrix-free PCG.

This is the scalable counterpart of optim/local_ba.py (visual) and
optim/inertial.py:visual_inertial_ba (visual-inertial), covering the
reference entry points that operate on the WHOLE map:

- Optimizer::BundleAdjustment / GlobalBundleAdjustemnt
  (src/Optimizer.cc:46-377) — run after loop closure
  (src/LoopClosing.cc:1346, 2306-2541).
- Optimizer::FullInertialBA (src/Optimizer.cc:378-784) — whole-map
  visual-inertial BA for the IMU-init ladder and inertial GBA.

Why a second solver: the dense-blocked Schur of local_ba materializes the
camera-landmark cross term W as a (K, L, 6, 3) tensor. That is the right
shape for a covisibility window (K<=24, L<=4k: one MXU contraction), but
at map scale (K~300, L~50k) it is tens of GB. Here landmark elimination
is *implicit*: the reduced camera system

    S x = (Hpp - W Hll^-1 W^T) x

is applied matrix-free in O(observations) work and memory —
per-observation 6x3 W blocks, two segment-sums, one batched 3x3 solve —
and solved by conjugate gradients preconditioned with the exact block
diagonal of S (per-keyframe 6x6 / 15x15 Cholesky inverses). This is the
TPU shape of the problem: every CG iteration is a handful of batched
einsums and scatter-adds over flat observation arrays, with no
data-dependent shapes. The g2o analogy is BlockSolver + a
preconditioned-CG linear solver instead of sparse Cholesky.

The LM loop (damping, chi2 gating 5.991/7.815, Huber IRLS, mid-schedule
inlier re-classification, accept/reject on cost) matches local_ba so the
two solvers are interchangeable per problem size.

Observation sharding for multi-chip: `shard_obs` tells the solver to
treat the observation arrays as sharded along an existing `obs` mesh
axis (see parallel/dist_ba.py): the per-observation work partitions and
the segment-sums become psums over ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils import lie
from . import residuals
from .local_ba import BAProblem, BAResult, _chi2, _delta2, _residuals
from .inertial import (
    VIBAProblem,
    VIBAResult,
    _edge_sqrt_info,
    _inertial_residual_gs,
    _retract,
    _vi_states,
    _walk_infos,
    _whiten,
)


def _psum_if(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name else x


def _pcg(matvec, b, precond, iters: int, rtol: float = 1e-6):
    """Preconditioned conjugate gradients with convergence masking
    (fixed trip count, compiler-friendly). b and x are (K,D) arrays."""
    bb = jnp.sum(b * b)
    x = jnp.zeros_like(b)
    r = b
    z = precond(r)
    pv = z
    rz = jnp.sum(r * z)

    def body(carry, _):
        x, r, pv, rz = carry
        Ap = matvec(pv)
        pAp = jnp.sum(pv * Ap)
        active = (jnp.sum(r * r) > rtol * rtol * bb) & (pAp > 1e-20)
        alpha = jnp.where(active, rz / jnp.maximum(pAp, 1e-20), 0.0)
        x = x + alpha * pv
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(active, rz_new / jnp.maximum(rz, 1e-20), 0.0)
        pv = z + beta * pv
        rz = jnp.where(active, rz_new, rz)
        return (x, r, pv, rz), None

    (x, _, _, _), _ = jax.lax.scan(body, (x, r, pv, rz), None, length=iters)
    return x


# ----------------------------------------------------------------------------
# Visual global BA
# ----------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("iters", "gate_at", "cg_iters", "robust", "axis_name"),
)
def sparse_ba(
    p: BAProblem,
    iters: int = 12,
    gate_at: int = 6,
    cg_iters: int = 60,
    robust: bool = True,
    damping_init: float = 1e-4,
    axis_name: str | None = None,
) -> BAResult:
    """Whole-map visual BA (GlobalBundleAdjustemnt semantics) on a
    BAProblem of any size. With `axis_name` set, the obs_* arrays are the
    local shard of an `axis_name`-sharded observation set (run under
    shard_map; states/landmarks replicated)."""
    K = p.R.shape[0]
    L = p.Xw.shape[0]

    kf_free = p.kf_valid & ~p.kf_fixed
    free_f = kf_free.astype(jnp.float32)[:, None]  # (K,1)
    lm_f = p.lm_valid.astype(jnp.float32)[:, None]

    def build_cost(R, t, Xw, inlier):
        r, _, _, z = _residuals(p, R, t, Xw)
        chi2 = _chi2(p, r)
        active = inlier & p.obs_valid & (z > 0)
        d2 = _delta2(p)
        if robust:
            rho = jnp.where(
                chi2 <= d2, chi2, 2.0 * jnp.sqrt(d2 * jnp.maximum(chi2, 0.0)) - d2
            )
        else:
            rho = chi2
        return _psum_if(jnp.sum(jnp.where(active, rho, 0.0)), axis_name)

    def step(carry, it):
        R, t, Xw, inlier, lam = carry
        r0, _, _, z0 = _residuals(p, R, t, Xw)
        gate_now = it == gate_at
        new_inlier = p.obs_valid & (_chi2(p, r0) <= _delta2(p)) & (z0 > 0)
        inlier = jnp.where(gate_now, new_inlier, inlier)

        r, Jp, Jl, z = _residuals(p, R, t, Xw)
        chi2 = _chi2(p, r)
        active = inlier & p.obs_valid & (z > 0)
        w_h = (
            residuals.huber_weight(chi2, _delta2(p))
            if robust
            else jnp.ones_like(chi2)
        )
        wgt = active.astype(r.dtype) * w_h / p.obs_sigma2

        JpW = Jp * wgt[:, None, None]  # (O,3,6)
        JlW = Jl * wgt[:, None, None]  # (O,3,3)
        # Per-observation blocks. Each (kf, lm) pair has at most one
        # observation, so these ARE the block-sparse W/H entries.
        Wo = jnp.einsum("ori,orj->oij", JpW, Jl)  # (O,6,3)
        Hcc = _psum_if(
            jnp.zeros((K, 6, 6)).at[p.obs_kf].add(
                jnp.einsum("ori,orj->oij", JpW, Jp)
            ),
            axis_name,
        )
        bc = _psum_if(
            jnp.zeros((K, 6)).at[p.obs_kf].add(-jnp.einsum("ori,or->oi", JpW, r)),
            axis_name,
        )
        Hll = _psum_if(
            jnp.zeros((L, 3, 3)).at[p.obs_lm].add(
                jnp.einsum("ori,orj->oij", JlW, Jl)
            ),
            axis_name,
        )
        bl = _psum_if(
            jnp.zeros((L, 3)).at[p.obs_lm].add(-jnp.einsum("ori,or->oi", JlW, r)),
            axis_name,
        )

        dHll = Hll + (lam * jnp.einsum("lii->l", Hll) / 3.0 + 1e-9)[
            :, None, None
        ] * jnp.eye(3)
        Hll_inv = jnp.linalg.inv(dHll) * lm_f[..., None]

        # Reduced RHS: bc - W Hll^-1 bl.
        hb = jnp.einsum("lpq,lq->lp", Hll_inv, bl)  # (L,3)
        rhs = bc - _psum_if(
            jnp.zeros((K, 6)).at[p.obs_kf].add(
                jnp.einsum("oij,oj->oi", Wo, hb[p.obs_lm])
            ),
            axis_name,
        )
        rhs = rhs * free_f

        # Damped diagonal of Hpp.
        dvec = jnp.einsum("kii->ki", Hcc)  # (K,6)

        def matvec(x):
            xm = x * free_f
            u = jnp.einsum("oij,oi->oj", Wo, xm[p.obs_kf])  # (O,3)
            v = _psum_if(jnp.zeros((L, 3)).at[p.obs_lm].add(u), axis_name)
            w = jnp.einsum("lpq,lq->lp", Hll_inv, v)
            y = jnp.einsum("oij,oj->oi", Wo, w[p.obs_lm])  # (O,6)
            zz = _psum_if(jnp.zeros((K, 6)).at[p.obs_kf].add(y), axis_name)
            Hx = jnp.einsum("kij,kj->ki", Hcc, xm)
            out = Hx - zz + (lam * dvec + 1e-8) * xm
            return out * free_f + x * (1.0 - free_f)

        # Exact block diagonal of S for the preconditioner.
        WH = jnp.einsum("oij,ojq->oiq", Wo, Hll_inv[p.obs_lm])  # (O,6,3)
        Sdiag = Hcc - _psum_if(
            jnp.zeros((K, 6, 6)).at[p.obs_kf].add(
                jnp.einsum("oiq,ojq->oij", WH, Wo)
            ),
            axis_name,
        )
        Sdiag = Sdiag + jnp.eye(6) * (lam * dvec + 1e-6)[:, :, None] * jnp.eye(6)
        Sdiag = Sdiag + 1e-6 * jnp.eye(6)
        Pinv = jnp.linalg.inv(Sdiag)
        Pinv = jnp.where(kf_free[:, None, None], Pinv, jnp.eye(6))

        def precond(rv):
            return jnp.einsum("kij,kj->ki", Pinv, rv)

        dxc = _pcg(matvec, rhs, precond, cg_iters) * free_f

        # Landmark back-substitution.
        bl_corr = bl - _psum_if(
            jnp.zeros((L, 3)).at[p.obs_lm].add(
                jnp.einsum("oij,oi->oj", Wo, dxc[p.obs_kf])
            ),
            axis_name,
        )
        dxl = jnp.einsum("lpq,lq->lp", Hll_inv, bl_corr) * lm_f

        dR, dt = lie.se3_exp(dxc)
        R_new = lie.so3_normalize(jnp.einsum("kij,kjl->kil", dR, R))
        t_new = jnp.einsum("kij,kj->ki", dR, t) + dt
        Xw_new = Xw + dxl

        ok = jnp.all(jnp.isfinite(dxc)) & jnp.all(jnp.isfinite(dxl))
        cost_old = build_cost(R, t, Xw, inlier)
        cost_new = build_cost(R_new, t_new, Xw_new, inlier)
        accept = ok & (cost_new < cost_old)
        lam = jnp.where(
            accept, jnp.maximum(lam * 0.5, 1e-7), jnp.minimum(lam * 4.0, 1e2)
        )
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        Xw = jnp.where(accept, Xw_new, Xw)
        return (R, t, Xw, inlier, lam), cost_old

    init = (p.R, p.t, p.Xw, p.obs_valid, jnp.float32(damping_init))
    (R, t, Xw, inlier, _), _ = jax.lax.scan(step, init, jnp.arange(iters))
    r, _, _, z = _residuals(p, R, t, Xw)
    inlier_final = p.obs_valid & (_chi2(p, r) <= _delta2(p)) & (z > 0)
    return BAResult(
        R=R, t=t, Xw=Xw, obs_inlier=inlier_final,
        cost=build_cost(R, t, Xw, inlier_final),
    )


# ----------------------------------------------------------------------------
# Visual-inertial whole-map BA
# ----------------------------------------------------------------------------


@partial(
    jax.jit, static_argnames=("iters", "gate_at", "cg_iters", "axis_name")
)
def sparse_vi_ba(
    p: VIBAProblem,
    iters: int = 12,
    gate_at: int = 6,
    cg_iters: int = 80,
    damping_init: float = 1e-4,
    axis_name: str | None = None,
) -> VIBAResult:
    """FullInertialBA at map scale: 15-dim body states, landmark Schur
    elimination matrix-free, inertial/bias-RW chain edges applied as
    block-tridiagonal scatter contributions inside the CG matvec.

    With `axis_name` set, the obs_* arrays are the LOCAL SHARD of an
    observation set sharded over that mesh axis (run under shard_map):
    every reprojection-derived reduction is psummed, while the inertial
    chain/prior terms — replicated state, identical on every device —
    are computed locally without collectives."""
    K = p.Rwb.shape[0]
    L = p.Xw.shape[0]
    E = p.edge_i.shape[0]
    D = 15

    kf_free = p.kf_valid & ~p.kf_fixed
    free_f = kf_free.astype(jnp.float32)[:, None]  # (K,1)
    lm_f = p.lm_valid.astype(jnp.float32)[:, None]
    ev_f = (p.edge_valid & p.kf_valid[p.edge_i] & p.kf_valid[p.edge_j]).astype(
        jnp.float32
    )
    L9s = jax.vmap(_edge_sqrt_info)(p.pre)
    ig, ia = jax.vmap(_walk_infos)(p.pre)
    d2 = jnp.where(p.obs_stereo, residuals.CHI2_STEREO, residuals.CHI2_MONO)
    z15 = jnp.zeros(D)

    def reproj(Rwb, twb, Xw):
        r3, Jp3, Jl3, z = residuals.stereo_reprojection_body(
            Rwb[p.obs_kf], twb[p.obs_kf], Xw[p.obs_lm], p.obs_uvr,
            p.Rcb, p.tcb, p.fx, p.fy, p.bf,
        )
        row_w = jnp.where(
            p.obs_stereo[:, None], 1.0, jnp.array([1.0, 1.0, 0.0], r3.dtype)
        )
        return r3 * row_w, Jp3 * row_w[..., None], Jl3 * row_w[..., None], z

    def chi2_of(r):
        return jnp.sum(r * r, axis=-1) / p.obs_sigma2

    def edge_res_retracted(d_i, d_j, states, e):
        Rwb, twb, vel, bg, ba = states
        i, j = p.edge_i[e], p.edge_j[e]
        si = _retract(Rwb[i], twb[i], vel[i], bg[i], ba[i], d_i)
        sj = _retract(Rwb[j], twb[j], vel[j], bg[j], ba[j], d_j)
        pre_e = jax.tree.map(lambda x: x[e], p.pre)
        r9 = _inertial_residual_gs(
            si[0], si[1], si[2], sj[0], sj[1], sj[2], si[3], si[4],
            pre_e, jnp.eye(3, dtype=jnp.float32), jnp.float32(1.0),
        )
        r_rwg = sj[3] - si[3]
        r_rwa = sj[4] - si[4]
        return _whiten(L9s[e], r9) * ev_f[e], r_rwg * ev_f[e], r_rwa * ev_f[e]

    def edge_blocks(states, e):
        f_i = lambda d: edge_res_retracted(d, z15, states, e)
        f_j = lambda d: edge_res_retracted(z15, d, states, e)
        r9, rg, ra = edge_res_retracted(z15, z15, states, e)
        J9i, Jgi, Jai = jax.jacfwd(f_i)(z15)
        J9j, Jgj, Jaj = jax.jacfwd(f_j)(z15)
        Wg, Wa = ig[e], ia[e]
        Hii = J9i.T @ J9i + Jgi.T @ Wg @ Jgi + Jai.T @ Wa @ Jai
        Hjj = J9j.T @ J9j + Jgj.T @ Wg @ Jgj + Jaj.T @ Wa @ Jaj
        Hij = J9i.T @ J9j + Jgi.T @ Wg @ Jgj + Jai.T @ Wa @ Jaj
        bi = -(J9i.T @ r9 + Jgi.T @ (Wg @ rg) + Jai.T @ (Wa @ ra))
        bj = -(J9j.T @ r9 + Jgj.T @ (Wg @ rg) + Jaj.T @ (Wa @ ra))
        return Hii, Hij, Hjj, bi, bj

    def inertial_cost(states):
        def one(e):
            r9, rg, ra = edge_res_retracted(z15, z15, states, e)
            return r9 @ r9 + rg @ (ig[e] @ rg) + ra @ (ia[e] @ ra)

        return jnp.sum(jax.vmap(one)(jnp.arange(E)))

    def prior_cost(states):
        return p.prior_g * jnp.sum(states[3][p.prior_kf] ** 2) + p.prior_a * jnp.sum(
            states[4][p.prior_kf] ** 2
        )

    def build_cost(states, Xw, inlier):
        r, _, _, z = reproj(states[0], states[1], Xw)
        chi2 = chi2_of(r)
        active = inlier & p.obs_valid & (z > 0)
        rho = jnp.where(
            chi2 <= d2, chi2, 2.0 * jnp.sqrt(d2 * jnp.maximum(chi2, 0.0)) - d2
        )
        return (
            _psum_if(jnp.sum(jnp.where(active, rho, 0.0)), axis_name)
            + inertial_cost(states)
            + prior_cost(states)
        )

    def step(carry, it):
        states, Xw, inlier, lam = carry
        Rwb, twb = states[0], states[1]

        r0, _, _, z0 = reproj(Rwb, twb, Xw)
        gate_now = it == gate_at
        new_inlier = p.obs_valid & (chi2_of(r0) <= d2) & (z0 > 0)
        inlier = jnp.where(gate_now, new_inlier, inlier)

        r, Jp, Jl, z = reproj(Rwb, twb, Xw)
        chi2 = chi2_of(r)
        active = inlier & p.obs_valid & (z > 0)
        w_h = residuals.huber_weight(chi2, d2)
        wgt = active.astype(r.dtype) * w_h / p.obs_sigma2

        JpW = Jp * wgt[:, None, None]
        JlW = Jl * wgt[:, None, None]
        Wo = jnp.einsum("ori,orj->oij", JpW, Jl)  # (O,6,3)
        Hcc6 = _psum_if(
            jnp.zeros((K, 6, 6)).at[p.obs_kf].add(
                jnp.einsum("ori,orj->oij", JpW, Jp)
            ),
            axis_name,
        )
        bc6 = _psum_if(
            jnp.zeros((K, 6)).at[p.obs_kf].add(
                -jnp.einsum("ori,or->oi", JpW, r)
            ),
            axis_name,
        )
        Hll = _psum_if(
            jnp.zeros((L, 3, 3)).at[p.obs_lm].add(
                jnp.einsum("ori,orj->oij", JlW, Jl)
            ),
            axis_name,
        )
        bl = _psum_if(
            jnp.zeros((L, 3)).at[p.obs_lm].add(
                -jnp.einsum("ori,or->oi", JlW, r)
            ),
            axis_name,
        )

        dHll = Hll + (lam * jnp.einsum("lii->l", Hll) / 3.0 + 1e-9)[
            :, None, None
        ] * jnp.eye(3)
        Hll_inv = jnp.linalg.inv(dHll) * lm_f[..., None]

        # Inertial edge blocks at the current linearization.
        Hii, Hij, Hjj, bi, bj = jax.vmap(lambda e: edge_blocks(states, e))(
            jnp.arange(E)
        )

        # Bias prior (Hp is diagonal on dims 9:15 of prior_kf).
        prior_diag = (
            jnp.zeros(D)
            .at[9:12]
            .set(p.prior_g)
            .at[12:15]
            .set(p.prior_a)
        )

        # RHS over full 15-dim states.
        hb = jnp.einsum("lpq,lq->lp", Hll_inv, bl)
        rhs6 = bc6 - _psum_if(
            jnp.zeros((K, 6)).at[p.obs_kf].add(
                jnp.einsum("oij,oj->oi", Wo, hb[p.obs_lm])
            ),
            axis_name,
        )
        rhs = jnp.zeros((K, D)).at[:, :6].set(rhs6)
        rhs = rhs.at[p.edge_i].add(bi).at[p.edge_j].add(bj)
        bp = jnp.concatenate(
            [jnp.zeros(9), -p.prior_g * states[3][p.prior_kf],
             -p.prior_a * states[4][p.prior_kf]]
        )
        rhs = rhs.at[p.prior_kf].add(bp)
        rhs = rhs * free_f

        # Block-diagonal assembly (for damping vector + preconditioner).
        Dblk = jnp.zeros((K, D, D)).at[:, :6, :6].set(Hcc6)
        Dblk = Dblk.at[p.edge_i].add(Hii).at[p.edge_j].add(Hjj)
        Dblk = Dblk.at[p.prior_kf].add(jnp.diag(prior_diag))
        dvec = jnp.einsum("kii->ki", Dblk)  # (K,D)

        def matvec(x):
            xm = x * free_f
            x6 = xm[:, :6]
            u = jnp.einsum("oij,oi->oj", Wo, x6[p.obs_kf])
            v = _psum_if(jnp.zeros((L, 3)).at[p.obs_lm].add(u), axis_name)
            w = jnp.einsum("lpq,lq->lp", Hll_inv, v)
            y = jnp.einsum("oij,oj->oi", Wo, w[p.obs_lm])
            zz6 = _psum_if(jnp.zeros((K, 6)).at[p.obs_kf].add(y), axis_name)
            Hx6 = jnp.einsum("kij,kj->ki", Hcc6, x6)
            out = jnp.zeros((K, D)).at[:, :6].set(Hx6 - zz6)
            # Inertial chain: y_i += Hii x_i + Hij x_j; y_j += Hij^T x_i + Hjj x_j.
            xi = xm[p.edge_i]
            xj = xm[p.edge_j]
            out = out.at[p.edge_i].add(
                jnp.einsum("eij,ej->ei", Hii, xi)
                + jnp.einsum("eij,ej->ei", Hij, xj)
            )
            out = out.at[p.edge_j].add(
                jnp.einsum("eji,ej->ei", Hij, xi)
                + jnp.einsum("eij,ej->ei", Hjj, xj)
            )
            out = out.at[p.prior_kf].add(prior_diag * xm[p.prior_kf])
            out = out + (lam * dvec + 1e-8) * xm
            return out * free_f + x * (1.0 - free_f)

        # Preconditioner: exact block diagonal of the reduced system.
        WH = jnp.einsum("oij,ojq->oiq", Wo, Hll_inv[p.obs_lm])
        Ssub = _psum_if(
            jnp.zeros((K, 6, 6)).at[p.obs_kf].add(
                jnp.einsum("oiq,ojq->oij", WH, Wo)
            ),
            axis_name,
        )
        P = Dblk.at[:, :6, :6].add(-Ssub)
        P = P + (lam * dvec + 1e-6)[:, :, None] * jnp.eye(D) + 1e-6 * jnp.eye(D)
        Pinv = jnp.linalg.inv(P)
        Pinv = jnp.where(kf_free[:, None, None], Pinv, jnp.eye(D))

        def precond(rv):
            return jnp.einsum("kij,kj->ki", Pinv, rv)

        dx = _pcg(matvec, rhs, precond, cg_iters) * free_f

        bl_corr = bl - _psum_if(
            jnp.zeros((L, 3)).at[p.obs_lm].add(
                jnp.einsum("oij,oi->oj", Wo, dx[p.obs_kf, :6])
            ),
            axis_name,
        )
        dxl = jnp.einsum("lpq,lq->lp", Hll_inv, bl_corr) * lm_f

        states_new = jax.vmap(_retract)(*states, dx)
        states_new = (lie.so3_normalize(states_new[0]), *states_new[1:])
        Xw_new = Xw + dxl

        ok = jnp.all(jnp.isfinite(dx)) & jnp.all(jnp.isfinite(dxl))
        c_old = build_cost(states, Xw, inlier)
        c_new = build_cost(states_new, Xw_new, inlier)
        accept = ok & (c_new < c_old)
        lam = jnp.where(
            accept, jnp.maximum(lam * 0.5, 1e-7), jnp.minimum(lam * 4.0, 1e2)
        )
        states = jax.tree.map(
            lambda n, o: jnp.where(accept, n, o), states_new, states
        )
        Xw = jnp.where(accept, Xw_new, Xw)
        return (states, Xw, inlier, lam), c_old

    init = (_vi_states(p), p.Xw, p.obs_valid, jnp.float32(damping_init))
    (states, Xw, inlier, _), _ = jax.lax.scan(step, init, jnp.arange(iters))
    r, _, _, z = reproj(states[0], states[1], Xw)
    inlier_final = p.obs_valid & (chi2_of(r) <= d2) & (z > 0)
    return VIBAResult(
        Rwb=states[0], twb=states[1], vel=states[2], bg=states[3],
        ba=states[4], Xw=Xw, obs_inlier=inlier_final,
        cost=build_cost(states, Xw, inlier_final),
    )
