"""Motion-only pose optimization — the tracking hot path.

Replaces Optimizer::PoseOptimization (src/Optimizer.cc:785-1075): one SE3
vertex, unary (mono/stereo) reprojection edges, 4 rounds x 10 LM
iterations with chi2 inlier re-classification between rounds
(5.991 mono / 7.815 stereo), Huber kernel active for the first two rounds
only (the reference sets e->setRobustKernel(0) at round 3).

TPU design: the whole schedule is one jitted `lax.scan` over rounds with
an inner `fori_loop` of damped Gauss-Newton steps on the dense 6x6 normal
equations; inlier state is a mask carried between rounds (no edge
removal/recompile). All N observations are processed as one batch.
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
class PoseOptResult:
    R: jax.Array
    t: jax.Array
    inliers: jax.Array  # (N,) bool (valid & chi2-accepted)
    n_inliers: jax.Array


@partial(jax.jit, static_argnames=("rounds", "iters"))
def pose_optimization(
    R0: jax.Array,
    t0: jax.Array,
    Xw: jax.Array,
    uv: jax.Array,
    sigma2: jax.Array,
    valid: jax.Array,
    fx,
    fy,
    ur: jax.Array | None = None,
    bf=0.0,
    is_stereo: jax.Array | None = None,
    rounds: int = 4,
    iters: int = 10,
) -> PoseOptResult:
    """Optimize Tcw=(R0,t0) against fixed landmarks.

    Xw (N,3) world points; uv (N,2) *centered* undistorted pixels
    (u - cx, v - cy); sigma2 (N,) per-observation pyramid variance;
    valid (N,) observation mask. For stereo rows pass ur (N,) centered
    right-u, bf (baseline*fx), and is_stereo (N,) — stereo observations
    use the 3D residual and chi2 7.815.
    """
    n = Xw.shape[0]
    if ur is None:
        ur = jnp.zeros((n,), Xw.dtype)
    if is_stereo is None:
        is_stereo = jnp.zeros((n,), bool)
    uvr = jnp.concatenate([uv, ur[:, None]], axis=-1)
    inv_sigma2 = 1.0 / sigma2

    def build_system(R, t, inlier, robust):
        r3, Jp3, _, z = residuals.stereo_reprojection(R, t, Xw, uvr, fx, fy, bf)
        # Mono uses only the first two rows.
        w_row = jnp.where(is_stereo[:, None], 1.0, jnp.array([1.0, 1.0, 0.0]))
        r = r3 * w_row
        chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        delta2 = jnp.where(is_stereo, residuals.CHI2_STEREO, residuals.CHI2_MONO)
        w_huber = jnp.where(robust, residuals.huber_weight(chi2, delta2), 1.0)
        w = inlier & valid & (z > 0)
        wgt = w.astype(r.dtype) * inv_sigma2 * w_huber
        Jp = Jp3 * w_row[..., None]
        H = jnp.einsum("nri,n,nrj->ij", Jp, wgt, Jp)
        b = -jnp.einsum("nri,n,nr->i", Jp, wgt, r)
        cost = jnp.sum(jnp.where(w, w_huber * chi2, 0.0))
        return H, b, cost, chi2, z

    def gn_iter(_, carry):
        R, t, inlier, robust = carry
        H, b, cost, _, _ = build_system(R, t, inlier, robust)
        # Small fixed Levenberg damping keeps steps stable without a
        # host-synced accept/reject loop.
        damp = 1e-3 * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(6)
        dx = jnp.linalg.solve(H + damp, b)
        dR, dt = lie.se3_exp(dx)
        R_new, t_new = lie.se3_mul(dR, dt, R, t)
        # Guard: reject non-finite updates.
        ok = jnp.all(jnp.isfinite(dx))
        R_new = jnp.where(ok, R_new, R)
        t_new = jnp.where(ok, t_new, t)
        return (lie.so3_normalize(R_new), t_new, inlier, robust)

    def round_body(carry, ri):
        R, t, inlier = carry
        robust = ri < 2  # kernel dropped for rounds 3,4 (reference :957)
        R, t, inlier, _ = jax.lax.fori_loop(
            0, iters, gn_iter, (R, t, inlier, robust)
        )
        # Re-classify inliers at the updated pose.
        _, _, _, chi2, z = build_system(R, t, jnp.ones_like(inlier), False)
        delta2 = jnp.where(is_stereo, residuals.CHI2_STEREO, residuals.CHI2_MONO)
        inlier = valid & (chi2 <= delta2) & (z > 0)
        return (R, t, inlier), None

    init = (R0, t0, valid)
    (R, t, inlier), _ = jax.lax.scan(init=init, f=round_body, xs=jnp.arange(rounds))
    return PoseOptResult(
        R=R, t=t, inliers=inlier, n_inliers=jnp.sum(inlier.astype(jnp.int32))
    )
