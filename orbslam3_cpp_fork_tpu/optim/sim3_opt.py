"""Sim3 refinement between two keyframes from matched map points.

Replaces Optimizer::OptimizeSim3 (src/Optimizer.cc:2110-2370): one Sim3
vertex S12, bidirectional reprojection edges —

  e1 = obs1 - proj(K1, S12 * pc2)      (EdgeSim3ProjectXYZ)
  e2 = obs2 - proj(K2, S12^-1 * pc1)   (EdgeInverseSim3ProjectXYZ)

— Huber kernel at sqrt(10), two passes with chi2-10 inlier pruning
between them (the reference removes edges and re-optimizes; we carry a
mask). Gauss-Newton on the 7-dim tangent (or 6-dim with scale frozen
for stereo/RGB-D, `bFixScale` in the reference).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..utils import lie

CHI2_SIM3 = 10.0  # th2 = 10 (src/Optimizer.cc:2174)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Sim3Result:
    s: jax.Array
    R: jax.Array
    t: jax.Array
    inliers: jax.Array  # (N,)
    n_inliers: jax.Array


def _project(pc, fx, fy):
    z = jnp.where(jnp.abs(pc[..., 2]) < 1e-9, 1e-9, pc[..., 2])
    return jnp.stack([fx * pc[..., 0] / z, fy * pc[..., 1] / z], -1), pc[..., 2]


@partial(jax.jit, static_argnames=("fix_scale", "iters"))
def optimize_sim3(
    s0, R0, t0,
    pc1: jax.Array,  # (N,3) points in camera-1 frame
    pc2: jax.Array,  # (N,3) points in camera-2 frame
    uv1: jax.Array,  # (N,2) centered pixel obs in image 1
    uv2: jax.Array,  # (N,2) centered pixel obs in image 2
    sigma2_1: jax.Array,
    sigma2_2: jax.Array,
    valid: jax.Array,
    fx, fy,
    fix_scale: bool = False,
    iters: int = 10,
) -> Sim3Result:
    """Refine S12 = (s0, R0, t0) mapping camera-2 coords to camera-1."""
    inv_s1 = 1.0 / sigma2_1
    inv_s2 = 1.0 / sigma2_2

    def residuals(params, inlier):
        ds, dR, dt = lie.sim3_exp(params)
        s = s0 * ds
        R = dR @ R0
        t = ds * (dR @ t0) + dt
        # Forward: pc2 -> cam1.
        p1 = s * (pc2 @ R.T) + t
        pr1, z1 = _project(p1, fx, fy)
        e1 = uv1 - pr1
        # Inverse: pc1 -> cam2. S^-1 = (1/s, R^T, -R^T t / s)
        p2 = (pc1 - t) @ R / s
        pr2, z2 = _project(p2, fx, fy)
        e2 = uv2 - pr2
        chi1 = jnp.sum(e1 * e1, -1) * inv_s1
        chi2 = jnp.sum(e2 * e2, -1) * inv_s2
        w = (inlier & valid).astype(jnp.float32)
        w1 = w * (z1 > 0)
        w2 = w * (z2 > 0)
        return e1, e2, chi1, chi2, w1 * inv_s1, w2 * inv_s2

    def robust_cost(params, inlier):
        # Huber rho (delta^2 = 10): chi below the knee, 2*sqrt(chi*d2)-d2
        # above — the objective g2o's LM accept/reject compares.
        _, _, chi1, chi2, _, _ = residuals(params, inlier)
        d2 = CHI2_SIM3

        def rho(chi):
            return jnp.where(chi <= d2, chi, 2.0 * jnp.sqrt(chi * d2) - d2)

        w = (inlier & valid).astype(jnp.float32)
        return jnp.sum(w * (rho(chi1) + rho(chi2)))

    def lm_step(carry, _):
        # Levenberg-Marquardt with accept/reject. A merge/loop Sim3 can
        # have near-coincident cameras, making scale unobservable from
        # reprojection (uv = f*x/z is s-invariant at t~0); plain GN with
        # fixed tiny damping then steps arbitrarily far along that null
        # direction. LM keeps dx ~ g/lambda ~ 0 there, as g2o does.
        params, inlier, lam, cost = carry
        _, _, chi1, chi2, _, _ = residuals(params, inlier)
        h1 = jnp.minimum(1.0, jnp.sqrt(CHI2_SIM3 / jnp.maximum(chi1, 1e-12)))
        h2 = jnp.minimum(1.0, jnp.sqrt(CHI2_SIM3 / jnp.maximum(chi2, 1e-12)))

        def flat_res(p):
            e1, e2, _, _, w1, w2 = residuals(p, inlier)
            return jnp.concatenate(
                [e1 * jnp.sqrt(w1 * h1)[:, None], e2 * jnp.sqrt(w2 * h2)[:, None]]
            ).reshape(-1)

        r = flat_res(params)
        J = jax.jacfwd(flat_res)(params)  # (2N*2, 7)
        if fix_scale:
            J = J.at[:, 6].set(0.0)
        H = J.T @ J
        g = -J.T @ r
        if fix_scale:
            H = H.at[6, 6].set(1.0)
            g = g.at[6].set(0.0)
        dx = jnp.linalg.solve(H + lam * jnp.eye(7), g)
        cand = params + dx
        new_cost = robust_cost(cand, inlier)
        ok = jnp.all(jnp.isfinite(dx)) & (new_cost < cost)
        params = jnp.where(ok, cand, params)
        cost = jnp.where(ok, new_cost, cost)
        lam = jnp.where(ok, jnp.maximum(lam * 0.5, 1e-5), jnp.minimum(lam * 4.0, 1e6))
        return (params, inlier, lam, cost), None

    def run_pass(params, inlier, length):
        lam0 = jnp.float32(1e-3)
        cost0 = robust_cost(params, inlier)
        (params, _, _, _), _ = jax.lax.scan(
            lm_step, (params, inlier, lam0, cost0), None, length=length
        )
        return params

    params0 = jnp.zeros(7, jnp.float32)
    inlier0 = valid
    # Pass 1.
    params = run_pass(params0, inlier0, iters // 2)
    # Inlier pruning at chi2 10 in both images (src/Optimizer.cc:2266).
    _, _, chi1, chi2, _, _ = residuals(params, inlier0)
    inlier = valid & (chi1 < CHI2_SIM3) & (chi2 < CHI2_SIM3)
    # Pass 2.
    params = run_pass(params, inlier, iters - iters // 2)
    _, _, chi1, chi2, _, _ = residuals(params, inlier)
    inlier = valid & (chi1 < CHI2_SIM3) & (chi2 < CHI2_SIM3)

    ds, dR, dt = lie.sim3_exp(params)
    s = s0 * ds
    R = lie.so3_normalize(dR @ R0)
    t = ds * (dR @ t0) + dt
    return Sim3Result(
        s=s, R=R, t=t, inliers=inlier,
        n_inliers=jnp.sum(inlier.astype(jnp.int32)),
    )
