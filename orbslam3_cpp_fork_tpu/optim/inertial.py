"""Visual-inertial optimization: IMU initialization, VI pose tracking,
and visual-inertial bundle adjustment.

TPU re-design of the reference's inertial g2o machinery:

- `inertial_init`       <- Optimizer::InertialOptimization (gravity dir +
  scale + biases + velocities with poses fixed, src/Optimizer.cc:3032-3483)
  and its scale-only overload (`ScaleRefinement`, :3379).
- `pose_inertial_optimization` <- PoseInertialOptimizationLastKeyFrame /
  ...LastFrame (src/Optimizer.cc:4457-5237): tracking-time state
  estimation with reprojection + one preintegration edge + bias random
  walk + optional 15-dim marginal prior; returns the next frame's prior
  via Schur marginalization (Optimizer::Marginalize, :2950-3031).
- `visual_inertial_ba`  <- LocalInertialBA (src/Optimizer.cc:2371-2949)
  and FullInertialBA (:378-784): temporal-window BA over 15-dim body
  states [dphi, dp, dv, dbg, dba] with landmark Schur elimination.

Everything is fixed-capacity with validity masks and runs as one jitted
program per problem shape: residuals are batched, normal-equation blocks
are scatter-added, the reduced camera system is dense (windows are small)
and the landmark block is eliminated on the MXU exactly like
optim/local_ba.py. Inertial-edge Jacobians use forward-mode autodiff of
the 9-dim residual at the retraction origin — exact, and only O(window)
edges deep. The state retraction matches the reference's
ImuCamPose::Update (include/G2oTypes.h:88): Rwb <- Rwb Exp(dphi),
twb <- twb + Rwb dp.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..ops import imu as imu_ops
from ..utils import lie
from . import residuals

G_I = jnp.array([0.0, 0.0, -imu_ops.GRAVITY], jnp.float32)


# ----------------------------------------------------------------------------
# Body-state helpers (camera Tcw <-> body Twb through the Tbc extrinsic)
# ----------------------------------------------------------------------------


def cam_to_body(Rcw, tcw, Tbc_R, Tbc_t):
    """Twb from Tcw. Tbc maps camera->body coords (x_b = Tbc_R x_c + Tbc_t),
    the reference's mImuCalib.mTbc (include/ImuTypes.h:94-134)."""
    Rwc = jnp.swapaxes(Rcw, -1, -2)
    twc = -jnp.einsum("...ij,...j->...i", Rwc, tcw)
    Rwb = jnp.einsum("...ij,kj->...ik", Rwc, Tbc_R)
    twb = twc - jnp.einsum("...ij,j->...i", Rwb, Tbc_t)
    return Rwb, twb


def body_to_cam(Rwb, twb, Tbc_R, Tbc_t):
    """Tcw from Twb (inverse of cam_to_body)."""
    Rwc = jnp.einsum("...ij,jk->...ik", Rwb, Tbc_R)
    twc = twb + jnp.einsum("...ij,j->...i", Rwb, Tbc_t)
    Rcw = jnp.swapaxes(Rwc, -1, -2)
    tcw = -jnp.einsum("...ij,...j->...i", Rcw, twc)
    return Rcw, tcw


def body_to_cam_frame(Tbc_R, Tbc_t):
    """(Rcb, tcb) such that pc = Rcb x_b + tcb."""
    Rcb = Tbc_R.T
    tcb = -Tbc_R.T @ Tbc_t
    return Rcb, tcb


def _retract(Rwb, p, v, bg, ba, d):
    """15-dim retraction (ImuCamPose::Update + additive v/bias)."""
    R2 = Rwb @ lie.so3_exp(d[0:3])
    p2 = p + Rwb @ d[3:6]
    return R2, p2, v + d[6:9], bg + d[9:12], ba + d[12:15]


def _inertial_residual_gs(Rwb1, p1, v1, Rwb2, p2, v2, bg, ba, pre, Rwg, s):
    """EdgeInertialGS::computeError (include/G2oTypes.h:587): 9-dim
    preintegration residual with free gravity direction Rwg and scale s.
    With Rwg=I, s=1 this is EdgeInertial (:531)."""
    dT = pre.dT
    g = Rwg @ G_I
    dR = imu_ops.delta_rotation(pre, bg)
    dV = imu_ops.delta_velocity(pre, bg, ba)
    dP = imu_ops.delta_position(pre, bg, ba)
    er = lie.so3_log(dR.T @ Rwb1.T @ Rwb2)
    ev = Rwb1.T @ (s * (v2 - v1) - g * dT) - dV
    ep = Rwb1.T @ (s * (p2 - p1 - v1 * dT) - 0.5 * g * dT * dT) - dP
    return jnp.concatenate([er, ev, ep])


def _edge_sqrt_info(pre):
    """Upper-triangular W with W^T W = inv(C9): whitening by Cholesky of
    the 9x9 preintegration covariance."""
    C = pre.C[:9, :9] + jnp.eye(9, dtype=pre.C.dtype) * 1e-8
    L = jnp.linalg.cholesky(C)
    # r_white = L^-1 r  =>  ||r_white||^2 = r^T C^-1 r.
    return L


def _whiten(L, r):
    return jax.scipy.linalg.solve_triangular(L, r, lower=True)


def _edge_info9(pre):
    C = pre.C[:9, :9] + jnp.eye(9, dtype=pre.C.dtype) * 1e-8
    info = jnp.linalg.inv(C)
    return 0.5 * (info + info.T)


def _walk_infos(pre):
    """Bias random-walk information from the preintegration covariance
    (EdgeGyroRW/EdgeAccRW take inv(C[9:12,9:12]) / inv(C[12:15,12:15]))."""
    Cg = pre.C[9:12, 9:12] + jnp.eye(3) * 1e-10
    Ca = pre.C[12:15, 12:15] + jnp.eye(3) * 1e-10
    ig = jnp.linalg.inv(Cg)
    ia = jnp.linalg.inv(Ca)
    return 0.5 * (ig + ig.T), 0.5 * (ia + ia.T)


# ----------------------------------------------------------------------------
# IMU initialization: gravity direction + scale + biases + velocities
# ----------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class InertialInitResult:
    Rwg: jax.Array  # (3,3) gravity-frame-from-world rotation estimate
    scale: jax.Array  # scalar
    bg: jax.Array  # (3,)
    ba: jax.Array  # (3,)
    vel: jax.Array  # (K,3) world-frame body velocities
    cost: jax.Array


def linear_inertial_init(Rwb, twb, edge_i, edge_j, pre, eps=1e-9):
    """Closed-form scale/gravity/velocity seed (VINS-Mono-style linear
    alignment): given fixed rotations and preintegrated dV/dP, the
    equations

        v_j - v_i - g dT           = Rwb_i dV
        s (p_j - p_i) - v_i dT - 0.5 g dT^2 = Rwb_i dP

    are LINEAR in theta = [s, g(3), v_0..v_{K-1}] (v metric). Unweighted
    least squares is immune to the noise-induced scale collapse of the
    covariance-whitened GN, so this seeds `inertial_init`. Host-side
    numpy (problems are tiny). Returns (s, g_w (3,), v (K,3) metric)."""
    import numpy as np

    Rwb = np.asarray(Rwb)
    twb = np.asarray(twb)
    edge_i = np.asarray(edge_i)
    edge_j = np.asarray(edge_j)
    dV = np.asarray(pre.dV)
    dP = np.asarray(pre.dP)
    dT = np.asarray(pre.dT)
    K = Rwb.shape[0]
    E = len(edge_i)
    n = 1 + 3 + 3 * K
    A = np.zeros((6 * E, n))
    b = np.zeros(6 * E)
    for e in range(E):
        i, j = int(edge_i[e]), int(edge_j[e])
        t = float(dT[e])
        r0 = 6 * e
        # ev rows.
        A[r0 : r0 + 3, 4 + 3 * j : 7 + 3 * j] = np.eye(3)
        A[r0 : r0 + 3, 4 + 3 * i : 7 + 3 * i] = -np.eye(3)
        A[r0 : r0 + 3, 1:4] = -t * np.eye(3)
        b[r0 : r0 + 3] = Rwb[i] @ dV[e]
        # ep rows.
        A[r0 + 3 : r0 + 6, 0] = twb[j] - twb[i]
        A[r0 + 3 : r0 + 6, 4 + 3 * i : 7 + 3 * i] = -t * np.eye(3)
        A[r0 + 3 : r0 + 6, 1:4] = -0.5 * t * t * np.eye(3)
        b[r0 + 3 : r0 + 6] = Rwb[i] @ dP[e]
    theta, *_ = np.linalg.lstsq(A, b, rcond=None)
    s = float(theta[0])
    g = theta[1:4]
    v = theta[4:].reshape(K, 3)
    return s, g, v


@partial(
    jax.jit,
    static_argnames=("iters", "fix_scale", "fix_gravity", "fix_bias", "fix_vel"),
)
def inertial_init(
    Rwb: jax.Array,  # (K,3,3) fixed body poses
    twb: jax.Array,  # (K,3)
    vel0: jax.Array,  # (K,3) initial velocity guess (map units)
    edge_i: jax.Array,  # (E,) int32 indices of consecutive-KF edges
    edge_j: jax.Array,  # (E,)
    edge_valid: jax.Array,  # (E,)
    pre: imu_ops.Preintegrated,  # stacked (E,...) preintegrations i->j
    prior_g: jax.Array,  # gyro-bias prior information (scalar)
    prior_a: jax.Array,  # acc-bias prior information (scalar)
    bg0: jax.Array = None,
    ba0: jax.Array = None,
    iters: int = 60,
    fix_scale: bool = False,
    fix_gravity: bool = False,
    fix_bias: bool = False,
    fix_vel: bool = False,
    log_s0: jax.Array = None,
    sigma_p: jax.Array = None,
) -> InertialInitResult:
    """Estimate gravity direction, metric scale, one shared bias pair and
    per-KF velocities while holding all poses fixed
    (Optimizer::InertialOptimization src/Optimizer.cc:3032; with
    fix_scale+fix_gravity it is the bias/velocity-only overload :3222;
    called with everything free it also serves ScaleRefinement :3379).

    `sigma_p` is a per-KF position-noise floor in MAP units: the ep-row
    covariance is inflated by 2 (s sigma_p)^2 so the keyframe-pose noise
    (absent from the preintegration covariance) cannot drive the scale to
    zero. Seed log_s0 from `linear_inertial_init`.

    With fix_bias + fix_vel only gravity direction and scale are free —
    the ScaleRefinement overload (src/Optimizer.cc:3379: all pose/
    velocity/bias vertices fixed, only VertexGDir + VertexScale)."""
    K = Rwb.shape[0]
    if bg0 is None:
        bg0 = jnp.zeros(3, jnp.float32)
    if ba0 is None:
        ba0 = jnp.zeros(3, jnp.float32)
    if log_s0 is None:
        log_s0 = jnp.float32(0.0)
    if sigma_p is None:
        sigma_p = jnp.float32(0.0)

    ev_f = edge_valid.astype(jnp.float32)

    def unpack(x):
        thg = jnp.where(fix_gravity, jnp.zeros(2), x[0:2])
        Rwg = lie.so3_exp(jnp.concatenate([thg, jnp.zeros(1)]))
        s = jnp.where(fix_scale, 1.0, jnp.exp(x[2]))
        bg = bg0 if fix_bias else x[3:6]
        ba = ba0 if fix_bias else x[6:9]
        v = vel0 if fix_vel else x[9:].reshape(K, 3)
        return Rwg, s, bg, ba, v

    def res_fn(x):
        Rwg, s, bg, ba, v = unpack(x)
        # Noise floor: rotation 1e-4 rad, position 2(s sigma_p)^2.
        floor = jnp.concatenate(
            [
                jnp.full(3, 1e-8),
                jnp.full(3, 1e-8),
                jnp.full(3, 2.0 * (s * sigma_p) ** 2 + 1e-8),
            ]
        )

        def one(i, j, p, w):
            r = _inertial_residual_gs(
                Rwb[i], twb[i], v[i], Rwb[j], twb[j], v[j], bg, ba, p, Rwg, s
            )
            C = p.C[:9, :9] + jnp.diag(floor)
            L = jnp.linalg.cholesky(C)
            return _whiten(L, r) * w

        r9 = jax.vmap(one, in_axes=(0, 0, 0, 0))(edge_i, edge_j, pre, ev_f)
        r_bg = jnp.sqrt(prior_g) * (bg - 0.0)
        r_ba = jnp.sqrt(prior_a) * (ba - 0.0)
        return jnp.concatenate([r9.reshape(-1), r_bg, r_ba])

    x0 = jnp.concatenate(
        [jnp.zeros(2), jnp.asarray(log_s0, jnp.float32).reshape(1),
         bg0, ba0, vel0.reshape(-1)]
    ).astype(jnp.float32)

    def step(carry, _):
        x, lam = carry
        r = res_fn(x)
        J = jax.jacfwd(res_fn)(x)
        H = J.T @ J
        g = J.T @ r
        n = H.shape[0]
        Hd = H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-6)) + 1e-8 * jnp.eye(n)
        dx = -jnp.linalg.solve(Hd, g)
        x_new = x + dx
        c_old = jnp.sum(r * r)
        r_new = res_fn(x_new)
        c_new = jnp.sum(r_new * r_new)
        ok = jnp.all(jnp.isfinite(x_new)) & (c_new < c_old)
        lam = jnp.where(ok, jnp.maximum(lam * 0.3, 1e-9), jnp.minimum(lam * 5.0, 1e6))
        x = jnp.where(ok, x_new, x)
        return (x, lam), c_old

    (x, _), _ = jax.lax.scan(step, (x0, jnp.float32(1e-2)), None, length=iters)
    Rwg, s, bg, ba, v = unpack(x)
    r = res_fn(x)
    return InertialInitResult(
        Rwg=Rwg, scale=s, bg=bg, ba=ba, vel=v, cost=jnp.sum(r * r)
    )


def gravity_seed(Rwb, edge_i, edge_valid, pre):
    """Initial Rwg from accumulated preintegrated velocity deltas
    (LocalMapping::InitializeIMU dirG estimate, src/LocalMapping.cc:1251)."""
    dirG = jnp.sum(
        jnp.einsum("eij,ej->ei", Rwb[edge_i], pre.dV)
        * edge_valid[:, None].astype(jnp.float32),
        axis=0,
    )
    dirG = -dirG / jnp.maximum(jnp.linalg.norm(dirG), 1e-9)
    gI = jnp.array([0.0, 0.0, -1.0], jnp.float32)
    # Rotation taking gI to dirG: world gravity dir = dirG => Rwg gI = dirG.
    v = jnp.cross(gI, dirG)
    cosg = jnp.dot(gI, dirG)
    nv = jnp.linalg.norm(v)
    ang = jnp.arctan2(nv, cosg)
    axis = v / jnp.maximum(nv, 1e-9)
    return lie.so3_exp(axis * ang)


# ----------------------------------------------------------------------------
# Tracking-time VI pose optimization (motion-only, one inertial edge)
# ----------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VIPoseResult:
    Rwb: jax.Array
    p: jax.Array
    v: jax.Array
    bg: jax.Array
    ba: jax.Array
    inliers: jax.Array  # (N,)
    n_inliers: jax.Array
    H_marg: jax.Array  # (15,15) marginal information of the frame state


@partial(jax.jit, static_argnames=("rounds", "iters", "anchor_fixed"))
def pose_inertial_optimization(
    # Anchor (last KF or last frame) body state:
    Rwb1, p1, v1, bg1, ba1,
    # Current frame initial body state:
    Rwb2, p2, v2, bg2, ba2,
    pre: imu_ops.Preintegrated,  # anchor -> frame preintegration
    # Unary reprojection observations on the current frame:
    Xw, uvr, sigma2, valid, is_stereo,
    Rcb, tcb, fx, fy, bf,
    # 15-dim prior on the anchor (last-frame variant). Ignored when
    # anchor_fixed.
    H_prior: jax.Array = None,
    rounds: int = 4,
    iters: int = 10,
    anchor_fixed: bool = True,
) -> VIPoseResult:
    """PoseInertialOptimizationLastKeyFrame (anchor_fixed=True,
    src/Optimizer.cc:4457) / ...LastFrame (anchor_fixed=False with the
    marginal prior H_prior, :4830): 4 rounds x 10 iterations with chi2
    inlier re-classification, then Schur marginalization of the anchor to
    produce the next frame's prior (Optimizer::Marginalize :2950)."""
    N = Xw.shape[0]
    if H_prior is None:
        H_prior = jnp.zeros((15, 15), jnp.float32)
    inv_sigma2 = 1.0 / sigma2
    L9 = _edge_sqrt_info(pre)
    info_g, info_a = _walk_infos(pre)
    anchor0 = (Rwb1, p1, v1, bg1, ba1)

    def edge_res(d1, d2, s1, s2):
        a = _retract(*s1, d1)
        b = _retract(*s2, d2)
        r = _inertial_residual_gs(
            a[0], a[1], a[2], b[0], b[1], b[2], a[3], a[4], pre,
            jnp.eye(3, dtype=jnp.float32), jnp.float32(1.0),
        )
        return _whiten(L9, r)

    def rw_res(d1, d2, s1, s2):
        a = _retract(*s1, d1)
        b = _retract(*s2, d2)
        return jnp.concatenate([b[3] - a[3], b[4] - a[4]])

    def prior_res(d1, s1):
        """Log-difference of the anchor from its prior mean (anchor0)."""
        a = _retract(*s1, d1)
        er = lie.so3_log(anchor0[0].T @ a[0])
        ep = anchor0[0].T @ (a[1] - anchor0[1])
        return jnp.concatenate(
            [er, ep, a[2] - anchor0[2], a[3] - anchor0[3], a[4] - anchor0[4]]
        )

    def reproj_system(s2, inlier, robust):
        r3, Jp3, _, z = residuals.stereo_reprojection_body(
            s2[0], s2[1], Xw, uvr, Rcb, tcb, fx, fy, bf
        )
        w_row = jnp.where(is_stereo[:, None], 1.0, jnp.array([1.0, 1.0, 0.0]))
        r = r3 * w_row
        chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        d2 = jnp.where(is_stereo, residuals.CHI2_STEREO, residuals.CHI2_MONO)
        w_h = jnp.where(robust, residuals.huber_weight(chi2, d2), 1.0)
        act = inlier & valid & (z > 0)
        wgt = act.astype(r.dtype) * inv_sigma2 * w_h
        Jp = Jp3 * w_row[..., None]  # (N,3,6) wrt [dphi, dp]
        H6 = jnp.einsum("nri,n,nrj->ij", Jp, wgt, Jp)
        b6 = -jnp.einsum("nri,n,nr->i", Jp, wgt, r)
        H15 = jnp.zeros((15, 15)).at[:6, :6].set(H6)
        b15 = jnp.zeros(15).at[:6].set(b6)
        cost = jnp.sum(jnp.where(act, chi2, 0.0))
        return H15, b15, chi2, z, cost

    def gn_iteration(state, inlier, robust, lam):
        s1, s2 = state
        z15 = jnp.zeros(15)
        # Inertial + RW + prior Jacobians at the retraction origin.
        J1_in = jax.jacfwd(lambda d: edge_res(d, z15, s1, s2))(z15)  # (9,15)
        J2_in = jax.jacfwd(lambda d: edge_res(z15, d, s1, s2))(z15)
        r_in = edge_res(z15, z15, s1, s2)
        J1_rw = jax.jacfwd(lambda d: rw_res(d, z15, s1, s2))(z15)  # (6,15)
        J2_rw = jax.jacfwd(lambda d: rw_res(z15, d, s1, s2))(z15)
        r_rw = rw_res(z15, z15, s1, s2)
        W_rw = jax.scipy.linalg.block_diag(info_g, info_a)  # (6,6)
        Jp_pr = jax.jacfwd(lambda d: prior_res(d, s1))(z15)  # (15,15)
        r_pr = prior_res(z15, s1)

        H11 = (
            J1_in.T @ J1_in
            + J1_rw.T @ W_rw @ J1_rw
            + Jp_pr.T @ H_prior @ Jp_pr
        )
        H22r, b22r, chi2, z, _ = reproj_system(s2, inlier, robust)
        H22 = J2_in.T @ J2_in + J2_rw.T @ W_rw @ J2_rw + H22r
        H12 = J1_in.T @ J2_in + J1_rw.T @ W_rw @ J2_rw
        b1 = -(J1_in.T @ r_in + J1_rw.T @ W_rw @ r_rw + Jp_pr.T @ (H_prior @ r_pr))
        b2 = b22r - J2_in.T @ r_in - J2_rw.T @ W_rw @ r_rw

        if anchor_fixed:
            Hd = H22 + lam * jnp.diag(jnp.maximum(jnp.diag(H22), 1e-6))
            d2 = jnp.linalg.solve(Hd + 1e-8 * jnp.eye(15), b2)
            d1 = jnp.zeros(15)
        else:
            H = jnp.block([[H11, H12], [H12.T, H22]])
            b = jnp.concatenate([b1, b2])
            Hd = H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-6))
            d = jnp.linalg.solve(Hd + 1e-8 * jnp.eye(30), b)
            d1, d2 = d[:15], d[15:]
        s1n = _retract(*s1, d1)
        s2n = _retract(*s2, d2)
        return (s1n, s2n), (d1, d2)

    def total_cost(state, inlier, robust):
        s1, s2 = state
        z15 = jnp.zeros(15)
        r_in = edge_res(z15, z15, s1, s2)
        r_rw = rw_res(z15, z15, s1, s2)
        W_rw = jax.scipy.linalg.block_diag(info_g, info_a)
        r_pr = prior_res(z15, s1)
        _, _, chi2, z, c_rep = reproj_system(s2, inlier, robust)
        c = c_rep + jnp.sum(r_in * r_in) + r_rw @ W_rw @ r_rw
        if not anchor_fixed:
            c = c + r_pr @ H_prior @ r_pr
        return c

    def round_body(carry, ri):
        state, inlier = carry
        robust = ri < 2  # Huber dropped at round 3 (reference :970-982)

        def inner(c, _):
            st, lam = c
            st_new, _ = gn_iteration(st, inlier, robust, lam)
            c_old = total_cost(st, inlier, robust)
            c_new = total_cost(st_new, inlier, robust)
            finite = jax.tree_util.tree_reduce(
                lambda a, x: a & jnp.all(jnp.isfinite(x)), st_new, jnp.array(True)
            )
            ok = finite & (c_new < c_old)
            lam = jnp.where(ok, jnp.maximum(lam * 0.5, 1e-8), jnp.minimum(lam * 4.0, 1e4))
            st = jax.tree.map(lambda n, o: jnp.where(ok, n, o), st_new, st)
            return (st, lam), None

        (state, _), _ = jax.lax.scan(
            inner, (state, jnp.float32(1e-3)), None, length=iters
        )
        # Re-classify inliers.
        s1, s2 = state
        r3, _, _, z = residuals.stereo_reprojection_body(
            s2[0], s2[1], Xw, uvr, Rcb, tcb, fx, fy, bf
        )
        w_row = jnp.where(is_stereo[:, None], 1.0, jnp.array([1.0, 1.0, 0.0]))
        chi2 = jnp.sum((r3 * w_row) ** 2, axis=-1) * inv_sigma2
        d2 = jnp.where(is_stereo, residuals.CHI2_STEREO, residuals.CHI2_MONO)
        inlier = valid & (chi2 <= d2) & (z > 0)
        return (state, inlier), None

    state0 = ((Rwb1, p1, v1, bg1, ba1), (Rwb2, p2, v2, bg2, ba2))
    (state, inlier), _ = jax.lax.scan(
        round_body, (state0, valid), jnp.arange(rounds)
    )
    s1, s2 = state

    # Marginal information of the frame state: H22 - H12^T H11^-1 H12
    # over the FULL system at the solution (reference Marginalize :2950).
    z15 = jnp.zeros(15)
    J1_in = jax.jacfwd(lambda d: edge_res(d, z15, s1, s2))(z15)
    J2_in = jax.jacfwd(lambda d: edge_res(z15, d, s1, s2))(z15)
    J1_rw = jax.jacfwd(lambda d: rw_res(d, z15, s1, s2))(z15)
    J2_rw = jax.jacfwd(lambda d: rw_res(z15, d, s1, s2))(z15)
    W_rw = jax.scipy.linalg.block_diag(info_g, info_a)
    Jp_pr = jax.jacfwd(lambda d: prior_res(d, s1))(z15)
    H22r, _, _, _, _ = reproj_system(s2, inlier, jnp.array(False))
    H11 = J1_in.T @ J1_in + J1_rw.T @ W_rw @ J1_rw + Jp_pr.T @ H_prior @ Jp_pr
    H22 = J2_in.T @ J2_in + J2_rw.T @ W_rw @ J2_rw + H22r
    H12 = J1_in.T @ J2_in + J1_rw.T @ W_rw @ J2_rw
    if anchor_fixed:
        H_marg = H22
    else:
        H11_inv = jnp.linalg.inv(H11 + 1e-6 * jnp.eye(15))
        H_marg = H22 - H12.T @ H11_inv @ H12
    H_marg = 0.5 * (H_marg + H_marg.T)

    return VIPoseResult(
        Rwb=s2[0], p=s2[1], v=s2[2], bg=s2[3], ba=s2[4],
        inliers=inlier, n_inliers=jnp.sum(inlier), H_marg=H_marg,
    )


# ----------------------------------------------------------------------------
# Visual-inertial bundle adjustment (local temporal window / full map)
# ----------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VIBAProblem:
    """Fixed-capacity VI BA problem over body states."""

    Rwb: jax.Array  # (K,3,3)
    twb: jax.Array  # (K,3)
    vel: jax.Array  # (K,3)
    bg: jax.Array  # (K,3)
    ba: jax.Array  # (K,3)
    kf_valid: jax.Array  # (K,)
    kf_fixed: jax.Array  # (K,)
    Xw: jax.Array  # (L,3)
    lm_valid: jax.Array  # (L,)
    obs_kf: jax.Array  # (O,)
    obs_lm: jax.Array  # (O,)
    obs_uvr: jax.Array  # (O,3) centered
    obs_sigma2: jax.Array  # (O,)
    obs_stereo: jax.Array  # (O,)
    obs_valid: jax.Array  # (O,)
    edge_i: jax.Array  # (E,) inertial edges (temporal chain)
    edge_j: jax.Array  # (E,)
    edge_valid: jax.Array  # (E,)
    pre: imu_ops.Preintegrated  # stacked (E,...)
    Rcb: jax.Array  # (3,3)
    tcb: jax.Array  # (3,)
    fx: jax.Array
    fy: jax.Array
    bf: jax.Array
    # Bias prior on one keyframe (EdgePriorGyro/EdgePriorAcc attached to
    # the first KF by FullInertialBA when run at IMU init, :438-476).
    prior_kf: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.int32(0)
    )
    prior_g: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.float32(0.0)
    )
    prior_a: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.float32(0.0)
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VIBAResult:
    Rwb: jax.Array
    twb: jax.Array
    vel: jax.Array
    bg: jax.Array
    ba: jax.Array
    Xw: jax.Array
    obs_inlier: jax.Array
    cost: jax.Array


def _vi_states(p: VIBAProblem):
    return (p.Rwb, p.twb, p.vel, p.bg, p.ba)


@partial(jax.jit, static_argnames=("iters", "gate_at"))
def visual_inertial_ba(
    p: VIBAProblem,
    iters: int = 10,
    gate_at: int = 5,
    damping_init: float = 1e-4,
) -> VIBAResult:
    """LocalInertialBA / FullInertialBA: 15-dim body states + landmarks,
    reprojection + inertial + bias-RW edges, landmark Schur elimination."""
    K = p.Rwb.shape[0]
    L = p.Xw.shape[0]
    E = p.edge_i.shape[0]
    D = 15

    kf_free = p.kf_valid & ~p.kf_fixed
    free_f = kf_free.astype(jnp.float32)
    ev_f = (p.edge_valid & p.kf_valid[p.edge_i] & p.kf_valid[p.edge_j]).astype(
        jnp.float32
    )
    L9s = jax.vmap(_edge_sqrt_info)(p.pre)  # (E,9,9)
    ig, ia = jax.vmap(_walk_infos)(p.pre)  # (E,3,3) each

    def reproj(Rwb, twb, Xw):
        Ro = Rwb[p.obs_kf]
        to = twb[p.obs_kf]
        Xo = Xw[p.obs_lm]
        r3, Jp3, Jl3, z = residuals.stereo_reprojection_body(
            Ro, to, Xo, p.obs_uvr, p.Rcb, p.tcb, p.fx, p.fy, p.bf
        )
        row_w = jnp.where(
            p.obs_stereo[:, None], 1.0, jnp.array([1.0, 1.0, 0.0], r3.dtype)
        )
        return r3 * row_w, Jp3 * row_w[..., None], Jl3 * row_w[..., None], z

    def chi2_of(r):
        return jnp.sum(r * r, axis=-1) / p.obs_sigma2

    d2 = jnp.where(p.obs_stereo, residuals.CHI2_STEREO, residuals.CHI2_MONO)

    def edge_res_white(states, e):
        Rwb, twb, vel, bg, ba = states
        i, j = p.edge_i[e], p.edge_j[e]
        pre_e = jax.tree.map(lambda x: x[e], p.pre)
        r = _inertial_residual_gs(
            Rwb[i], twb[i], vel[i], Rwb[j], twb[j], vel[j], bg[i], ba[i],
            pre_e, jnp.eye(3, dtype=jnp.float32), jnp.float32(1.0),
        )
        return _whiten(L9s[e], r) * ev_f[e]

    def edge_res_retracted(d_i, d_j, states, e):
        """Residual after retracting endpoints i/j of edge e by d_i/d_j."""
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

    z15 = jnp.zeros(D)

    def edge_blocks(states, e):
        """Per-edge H contributions: returns (Hii, Hij, Hjj, bi, bj)."""
        f_i = lambda d: edge_res_retracted(d, z15, states, e)
        f_j = lambda d: edge_res_retracted(z15, d, states, e)
        (r9, rg, ra) = edge_res_retracted(z15, z15, states, e)
        J9i, Jgi, Jai = jax.jacfwd(f_i)(z15)  # (9,15),(3,15),(3,15)
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
        bg, ba = states[3], states[4]
        return p.prior_g * jnp.sum(bg[p.prior_kf] ** 2) + p.prior_a * jnp.sum(
            ba[p.prior_kf] ** 2
        )

    def build_cost(states, Xw, inlier):
        r, _, _, z = reproj(states[0], states[1], Xw)
        chi2 = chi2_of(r)
        active = inlier & p.obs_valid & (z > 0)
        rho = jnp.where(
            chi2 <= d2, chi2, 2.0 * jnp.sqrt(d2 * jnp.maximum(chi2, 0.0)) - d2
        )
        return (
            jnp.sum(jnp.where(active, rho, 0.0))
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

        JpW = Jp * wgt[:, None, None]  # (O,3,6)
        Hcc6 = jnp.zeros((K, 6, 6)).at[p.obs_kf].add(
            jnp.einsum("ori,orj->oij", JpW, Jp)
        )
        bc6 = jnp.zeros((K, 6)).at[p.obs_kf].add(-jnp.einsum("ori,or->oi", JpW, r))
        Hll = jnp.zeros((L, 3, 3)).at[p.obs_lm].add(
            jnp.einsum("ori,orj->oij", Jl * wgt[:, None, None], Jl)
        )
        bl = jnp.zeros((L, 3)).at[p.obs_lm].add(
            -jnp.einsum("ori,or->oi", Jl * wgt[:, None, None], r)
        )
        Wd6 = jnp.zeros((K, L, 6, 3)).at[p.obs_kf, p.obs_lm].add(
            jnp.einsum("ori,orj->oij", JpW, Jl)
        )

        # Landmark elimination (same MXU contraction as local_ba).
        dHll = Hll + (lam * jnp.einsum("lii->l", Hll) / 3.0 + 1e-9)[
            :, None, None
        ] * jnp.eye(3)
        Hll_inv = jnp.linalg.inv(dHll)
        Hll_inv = jnp.where(p.lm_valid[:, None, None], Hll_inv, 0.0)
        T = jnp.einsum("alip,lpq->aliq", Wd6, Hll_inv)  # (K,L,6,3)
        S6 = -jnp.einsum("aliq,bljq->aibj", T, Wd6)  # (K,6,K,6)
        S6 = S6.at[jnp.arange(K), :, jnp.arange(K), :].add(Hcc6)
        rhs6 = bc6 - jnp.einsum("aliq,lq->ai", T, bl)  # (K,6)

        # Lift the 6-dim visual system into the 15-dim body system.
        S = jnp.zeros((K, D, K, D))
        S = S.at[:, :6, :, :6].set(S6)
        rhs = jnp.zeros((K, D)).at[:, :6].set(rhs6)

        # Inertial + bias-RW edge contributions.
        Hii, Hij, Hjj, bi, bj = jax.vmap(lambda e: edge_blocks(states, e))(
            jnp.arange(E)
        )
        S = S.at[p.edge_i, :, p.edge_i, :].add(Hii)
        S = S.at[p.edge_j, :, p.edge_j, :].add(Hjj)
        S = S.at[p.edge_i, :, p.edge_j, :].add(Hij)
        S = S.at[p.edge_j, :, p.edge_i, :].add(jnp.swapaxes(Hij, -1, -2))
        rhs = rhs.at[p.edge_i].add(bi)
        rhs = rhs.at[p.edge_j].add(bj)

        # Bias prior on prior_kf (r = bias, J = I on the bias sub-block).
        Hp = (
            jnp.zeros((D, D))
            .at[9:12, 9:12]
            .set(p.prior_g * jnp.eye(3))
            .at[12:15, 12:15]
            .set(p.prior_a * jnp.eye(3))
        )
        S = S.at[p.prior_kf, :, p.prior_kf, :].add(Hp)
        bp = (
            jnp.zeros(D)
            .at[9:12]
            .set(-p.prior_g * states[3][p.prior_kf])
            .at[12:15]
            .set(-p.prior_a * states[4][p.prior_kf])
        )
        rhs = rhs.at[p.prior_kf].add(bp)

        # Freeze fixed/invalid KFs; damp; solve.
        dmask = (free_f[:, None] * free_f[None, :])[:, None, :, None]
        Sm = (S * dmask).reshape(K * D, K * D)
        idx = jnp.arange(K * D)
        diag = Sm[idx, idx]
        freeD = jnp.repeat(free_f, D)
        Sm = Sm.at[idx, idx].set(
            jnp.where(freeD > 0, diag * (1.0 + lam) + 1e-8, 1.0)
        )
        rhs_v = (rhs * free_f[:, None]).reshape(K * D)
        dx = jnp.linalg.solve(Sm, rhs_v).reshape(K, D)
        dx = dx * free_f[:, None]

        # Back-substitute landmarks (visual part only touches [:6]).
        bl_corr = bl - jnp.einsum("alip,ai->lp", Wd6, dx[:, :6])
        dxl = jnp.einsum("lpq,lq->lp", Hll_inv, bl_corr)
        dxl = dxl * p.lm_valid[:, None].astype(dxl.dtype)

        states_new = jax.vmap(_retract)(*states, dx)
        states_new = (
            lie.so3_normalize(states_new[0]),
            *states_new[1:],
        )
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
    (states, Xw, inlier, _), _ = jax.lax.scan(
        step, init, jnp.arange(iters)
    )
    r, _, _, z = reproj(states[0], states[1], Xw)
    inlier_final = p.obs_valid & (chi2_of(r) <= d2) & (z > 0)
    return VIBAResult(
        Rwb=states[0], twb=states[1], vel=states[2], bg=states[3], ba=states[4],
        Xw=Xw, obs_inlier=inlier_final,
        cost=build_cost(states, Xw, inlier_final),
    )
