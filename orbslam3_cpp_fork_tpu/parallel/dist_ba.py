"""Distributed bundle adjustment over a device mesh.

The reference has no distributed execution (SURVEY.md §2.9); this is the
TPU-native scale-out called for by BASELINE.json: the observation set of
a (local or global) BA problem is sharded across chips, each chip
reduces its shard's contributions to the camera/landmark normal-equation
blocks, and the blocks are summed with `psum` over the ICI mesh. The
Schur-complement solve of the small reduced camera system runs
replicated (it is tiny next to the Jacobian work, which dominates and
scales linearly with devices).

Layout:
- obs_* arrays: sharded along the observation axis, P('ba').
- KF/landmark state: replicated (P()).
- Collectives: one psum per block type per iteration — bandwidth
  O(K*36 + L*9 + K*L*18) floats, riding ICI.

This data-parallel decomposition is exact (bitwise-equal math to the
single-chip solver up to reduction order).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..optim.local_ba import BAProblem
from ..optim import residuals
from ..utils import lie


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


def make_dist_ba_step(mesh: Mesh, axis: str = "ba", damping: float = 1e-4):
    """Build a jitted distributed GN step: (BAProblem, R, t, Xw) ->
    (R', t', Xw'). Observation arrays of the problem must be sharded
    along `axis`; states replicated."""

    obs_spec = P(axis)
    rep = P()

    prob_specs = BAProblem(
        R=rep, t=rep, kf_valid=rep, kf_fixed=rep, Xw=rep, lm_valid=rep,
        obs_kf=obs_spec, obs_lm=obs_spec, obs_uvr=obs_spec,
        obs_sigma2=obs_spec, obs_stereo=obs_spec, obs_valid=obs_spec,
        fx=rep, fy=rep, bf=rep,
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(prob_specs, rep, rep, rep),
        out_specs=(rep, rep, rep),
    )
    def step(p: BAProblem, R, t, Xw):
        K = R.shape[0]
        L = Xw.shape[0]
        r, Jp, Jl, z = _residuals(p, R, t, Xw)
        chi2 = jnp.sum(r * r, axis=-1) / p.obs_sigma2
        d2 = jnp.where(p.obs_stereo, residuals.CHI2_STEREO, residuals.CHI2_MONO)
        w_huber = residuals.huber_weight(chi2, d2)
        active = p.obs_valid & (z > 0)
        wgt = active.astype(r.dtype) * w_huber / p.obs_sigma2

        JpW = Jp * wgt[:, None, None]
        JlW = Jl * wgt[:, None, None]
        # Local shard contributions.
        Hcc = jnp.zeros((K, 6, 6)).at[p.obs_kf].add(jnp.einsum("ori,orj->oij", JpW, Jp))
        bc = jnp.zeros((K, 6)).at[p.obs_kf].add(-jnp.einsum("ori,or->oi", JpW, r))
        Hll = jnp.zeros((L, 3, 3)).at[p.obs_lm].add(jnp.einsum("ori,orj->oij", JlW, Jl))
        bl = jnp.zeros((L, 3)).at[p.obs_lm].add(-jnp.einsum("ori,or->oi", JlW, r))
        Wd = jnp.zeros((K, L, 6, 3)).at[p.obs_kf, p.obs_lm].add(
            jnp.einsum("ori,orj->oij", JpW, Jl)
        )
        # ICI reduction: one psum per block type.
        Hcc = jax.lax.psum(Hcc, axis)
        bc = jax.lax.psum(bc, axis)
        Hll = jax.lax.psum(Hll, axis)
        bl = jax.lax.psum(bl, axis)
        Wd = jax.lax.psum(Wd, axis)

        # Replicated Schur solve (identical on all devices).
        lam = damping
        free = (p.kf_valid & ~p.kf_fixed).astype(jnp.float32)
        dHll = Hll + (lam * jnp.einsum("lii->l", Hll) / 3.0 + 1e-9)[:, None, None] * jnp.eye(3)
        Hll_inv = jnp.where(
            p.lm_valid[:, None, None], jnp.linalg.inv(dHll), 0.0
        )
        T = jnp.einsum("alip,lpq->aliq", Wd, Hll_inv)
        S = -jnp.einsum("aliq,bljq->aibj", T, Wd)
        S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(Hcc)
        rhs = bc - jnp.einsum("aliq,lq->ai", T, bl)
        dmask = (free[:, None] * free[None, :])[:, None, :, None] * jnp.ones((1, 6, 1, 6))
        Sm = (S * dmask).reshape(K * 6, K * 6)
        idx6 = jnp.arange(K * 6)
        free6 = jnp.repeat(free, 6)
        Sm = Sm.at[idx6, idx6].set(
            jnp.where(free6 > 0, Sm[idx6, idx6] * (1.0 + lam) + 1e-8, 1.0)
        )
        dxc = jnp.linalg.solve(Sm, (rhs * free[:, None]).reshape(K * 6)).reshape(K, 6)
        dxc = dxc * free[:, None]
        bl_corr = bl - jnp.einsum("alip,ai->lp", Wd, dxc)
        dxl = jnp.einsum("lpq,lq->lp", Hll_inv, bl_corr) * p.lm_valid[:, None]

        dR, dt = lie.se3_exp(dxc)
        R_new = lie.so3_normalize(jnp.einsum("kij,kjl->kil", dR, R))
        t_new = jnp.einsum("kij,kj->ki", dR, t) + dt
        return R_new, t_new, Xw + dxl

    return jax.jit(step)


def shard_problem(mesh: Mesh, p: BAProblem, axis: str = "ba") -> BAProblem:
    """Device_put the problem with obs arrays sharded along `axis`."""
    obs = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def put(x, s):
        return jax.device_put(x, s)

    return BAProblem(
        R=put(p.R, rep), t=put(p.t, rep), kf_valid=put(p.kf_valid, rep),
        kf_fixed=put(p.kf_fixed, rep), Xw=put(p.Xw, rep),
        lm_valid=put(p.lm_valid, rep),
        obs_kf=put(p.obs_kf, obs), obs_lm=put(p.obs_lm, obs),
        obs_uvr=put(p.obs_uvr, obs), obs_sigma2=put(p.obs_sigma2, obs),
        obs_stereo=put(p.obs_stereo, obs), obs_valid=put(p.obs_valid, obs),
        fx=put(p.fx, rep), fy=put(p.fy, rep), bf=put(p.bf, rep),
    )
