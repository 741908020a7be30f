"""Pose-graph (essential-graph) optimization over Sim3 / SE3 / 4DoF.

Replaces Optimizer::OptimizeEssentialGraph (src/Optimizer.cc:1489-2109,
loop + merge variants) and OptimizeEssentialGraph4DoF (:5238-5550):
vertices are per-keyframe world-to-camera Sim3 transforms, edges are
relative Sim3 measurements S_ji (loop/merge edges, spanning tree,
covisibility >= minFeat, previous loop edges), residual

    e(i,j) = log( S_ji_meas o S_i o S_j^-1 )  in sim(3)

Gauss-Newton with right-multiplicative tangent updates
S_i <- S_i o exp(delta_i), so freezing tangent dims gives the reference's
restricted variants exactly:
  - sim3  : all 7 dims free (monocular loop closing, gauge = fixed KF)
  - se3   : scale frozen (bFixScale stereo/RGB-D)
  - 4dof  : scale + roll/pitch frozen (inertial: gravity-aligned world
            z is observable, VertexPose4DoF/Edge4DoF)

Per-edge (7,14) Jacobians come from forward-mode autodiff vmapped over
all edges at once; the (7K,7K) normal system is dense (K <= a few
hundred keyframes) and solved with one Cholesky — the reference's 20
sparse LM iterations become a handful of dense MXU iterations.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import lie

FREE_DIMS = {
    "sim3": np.ones(7, np.float32),
    "se3": np.array([1, 1, 1, 1, 1, 1, 0], np.float32),
    "4dof": np.array([1, 1, 1, 0, 0, 1, 0], np.float32),
}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PoseGraphResult:
    s: jax.Array  # (K,)
    R: jax.Array  # (K,3,3)
    t: jax.Array  # (K,3)
    cost: jax.Array


def _edge_residual(si, Ri, ti, sj, Rj, tj, sm, Rm, tm):
    """log( S_m o S_i o S_j^-1 ) for one edge."""
    sji, Rji, tji = lie.sim3_inv(sj, Rj, tj)
    s1, R1, t1 = lie.sim3_mul(si, Ri, ti, sji, Rji, tji)
    s2, R2, t2 = lie.sim3_mul(sm, Rm, tm, s1, R1, t1)
    return lie.sim3_log(s2, R2, t2)


@partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph(
    s: jax.Array,  # (K,) initial scales (1 for SE3)
    R: jax.Array,  # (K,3,3) Tcw rotations
    t: jax.Array,  # (K,3)
    kf_valid: jax.Array,  # (K,)
    kf_fixed: jax.Array,  # (K,)
    edge_i: jax.Array,  # (E,) int32
    edge_j: jax.Array,  # (E,)
    edge_s: jax.Array,  # (E,) measured S_ji
    edge_R: jax.Array,  # (E,3,3)
    edge_t: jax.Array,  # (E,3)
    edge_w: jax.Array,  # (E,) weights (0 disables an edge slot)
    free_dims: jax.Array,  # (7,) 1=optimized tangent dim
    iters: int = 12,
    damping: float = 1e-5,
) -> PoseGraphResult:
    K = R.shape[0]
    free_v = (kf_valid & ~kf_fixed).astype(jnp.float32)  # (K,)

    def edge_res_d(delta_ij, si, Ri, ti, sj, Rj, tj, sm, Rm, tm):
        di = delta_ij[:7] * free_dims
        dj = delta_ij[7:] * free_dims
        dsi, dRi, dti = lie.sim3_exp(di)
        dsj, dRj, dtj = lie.sim3_exp(dj)
        si2, Ri2, ti2 = lie.sim3_mul(si, Ri, ti, dsi, dRi, dti)
        sj2, Rj2, tj2 = lie.sim3_mul(sj, Rj, tj, dsj, dRj, dtj)
        return _edge_residual(si2, Ri2, ti2, sj2, Rj2, tj2, sm, Rm, tm)

    def step(carry, _):
        s, R, t = carry
        si, Ri, ti = s[edge_i], R[edge_i], t[edge_i]
        sj, Rj, tj = s[edge_j], R[edge_j], t[edge_j]

        zero = jnp.zeros((edge_i.shape[0], 14))
        r = jax.vmap(edge_res_d)(
            zero, si, Ri, ti, sj, Rj, tj, edge_s, edge_R, edge_t
        )  # (E,7)
        J = jax.vmap(jax.jacfwd(edge_res_d))(
            zero, si, Ri, ti, sj, Rj, tj, edge_s, edge_R, edge_t
        )  # (E,7,14)
        Ji, Jj = J[:, :, :7], J[:, :, 7:]
        w = edge_w[:, None, None]

        # Assemble dense H (K,7,K,7) and b (K,7) by scatter-add.
        Hii = jnp.einsum("eri,erj->eij", Ji * w, Ji)
        Hjj = jnp.einsum("eri,erj->eij", Jj * w, Jj)
        Hij = jnp.einsum("eri,erj->eij", Ji * w, Jj)
        bi = -jnp.einsum("eri,er->ei", Ji * w, r)
        bj = -jnp.einsum("eri,er->ei", Jj * w, r)

        H = jnp.zeros((K, 7, K, 7))
        H = H.at[edge_i, :, edge_i, :].add(Hii)
        H = H.at[edge_j, :, edge_j, :].add(Hjj)
        H = H.at[edge_i, :, edge_j, :].add(Hij)
        H = H.at[edge_j, :, edge_i, :].add(jnp.swapaxes(Hij, 1, 2))
        b = jnp.zeros((K, 7)).at[edge_i].add(bi).at[edge_j].add(bj)

        # Freeze fixed vertices and disabled tangent dims.
        mask = free_v[:, None] * free_dims[None, :]  # (K,7)
        Hm = H * mask[:, :, None, None] * mask[None, None, :, :]
        n = K * 7
        Hf = Hm.reshape(n, n)
        idx = jnp.arange(n)
        diag = Hf[idx, idx]
        mflat = mask.reshape(n)
        Hf = Hf.at[idx, idx].set(
            jnp.where(mflat > 0, diag * (1.0 + damping) + 1e-8, 1.0)
        )
        bf = (b * mask).reshape(n)
        dx = jnp.linalg.solve(Hf, bf).reshape(K, 7) * mask
        ok = jnp.all(jnp.isfinite(dx))
        dx = jnp.where(ok, dx, 0.0)

        ds, dR, dt = lie.sim3_exp(dx)
        s2, R2, t2 = lie.sim3_mul(s, R, t, ds, dR, dt)
        R2 = lie.so3_normalize(R2)
        cost = jnp.sum(edge_w * jnp.sum(r * r, -1))
        return (s2, R2, t2), cost

    (s, R, t), costs = jax.lax.scan(step, (s, R, t), None, length=iters)
    return PoseGraphResult(s=s, R=R, t=t, cost=costs[-1])


PG_KF_BUCKET = 64
PG_EDGE_BUCKET = 1024


def optimize_pose_graph_padded(
    s0, R0, t0, fixed, ei, ej, es, eR, et, ew, free_dims,
    iters: int = 12, put=jnp.asarray,
):
    """Bucket-padded host wrapper around optimize_pose_graph.

    The jitted solver specializes on (K, E); a loop closure's exact
    vertex/edge counts are data (they differ between any two runs), so
    calling it raw compiles a fresh multi-second XLA program at LOOP
    TIME — on the loop thread, whose jit tracing holds the GIL and
    freezes the paced track thread (measured: 5-18 s bench stalls at
    the loop-closure frame, one optimize_pose_graph compile per pass).
    Padding K to multiples of 64 and E to multiples of 1024 collapses
    every realistic problem onto a handful of shapes that
    Tracker.warm_mapping_programs pre-compiles before pacing starts.
    Pad vertices are invalid (the solver freezes their tangent rows);
    pad edges carry weight 0 on vertex 0. Returns numpy
    (s, R, t, cost) sliced back to the real K.
    """
    K = len(s0)
    E = len(ei)
    Kp = -(-max(K, 1) // PG_KF_BUCKET) * PG_KF_BUCKET
    Ep = -(-max(E, 1) // PG_EDGE_BUCKET) * PG_EDGE_BUCKET
    sp = np.ones(Kp, np.float32)
    sp[:K] = s0
    Rp = np.tile(np.eye(3, dtype=np.float32), (Kp, 1, 1))
    Rp[:K] = R0
    tp = np.zeros((Kp, 3), np.float32)
    tp[:K] = t0
    validp = np.zeros(Kp, bool)
    validp[:K] = True
    fixedp = np.zeros(Kp, bool)
    fixedp[:K] = fixed
    eip = np.zeros(Ep, np.int32)
    eip[:E] = ei
    ejp = np.zeros(Ep, np.int32)
    ejp[:E] = ej
    esp = np.ones(Ep, np.float32)
    esp[:E] = es
    eRp = np.tile(np.eye(3, dtype=np.float32), (Ep, 1, 1))
    eRp[:E] = eR
    etp = np.zeros((Ep, 3), np.float32)
    etp[:E] = et
    ewp = np.zeros(Ep, np.float32)
    ewp[:E] = ew
    res = optimize_pose_graph(
        put(sp), put(Rp), put(tp), put(validp), put(fixedp),
        put(eip), put(ejp), put(esp), put(eRp), put(etp), put(ewp),
        put(np.asarray(free_dims, np.float32)), iters=iters,
    )
    return (
        np.asarray(res.s)[:K], np.asarray(res.R)[:K],
        np.asarray(res.t)[:K], float(res.cost),
    )


def relative_sim3(s, R, t, i, j):
    """Host helper: measured S_ji = S_j o S_i^-1 from absolute poses."""
    si, Ri, ti = lie.sim3_inv(
        jnp.asarray(s[i]), jnp.asarray(R[i]), jnp.asarray(t[i])
    )
    return lie.sim3_mul(jnp.asarray(s[j]), jnp.asarray(R[j]), jnp.asarray(t[j]), si, Ri, ti)
