"""Sparse (matrix-free PCG Schur) BA vs the dense-blocked solver and at
map scale (parity targets: Optimizer::GlobalBundleAdjustemnt
src/Optimizer.cc:46-377 and FullInertialBA :378-784)."""

import numpy as np
import jax
import jax.numpy as jnp

from orbslam3_cpp_fork_tpu.utils import lie
from orbslam3_cpp_fork_tpu.optim.local_ba import BAProblem, local_ba
from orbslam3_cpp_fork_tpu.optim.sparse_ba import sparse_ba, sparse_vi_ba
from orbslam3_cpp_fork_tpu.optim import inertial

from test_optim import _make_ba_problem, FX, FY


def test_sparse_ba_matches_dense():
    """Same problem, both solvers: results agree and both hit GT."""
    prob, R_gt, t_gt, X_gt = _make_ba_problem()
    res_d = local_ba(prob, iters=12, gate_at=6)
    res_s = sparse_ba(prob, iters=12, gate_at=6, cg_iters=60)
    for k in range(R_gt.shape[0]):
        R_err = np.linalg.norm(
            np.asarray(lie.so3_log(jnp.asarray(R_gt[k].T) @ res_s.R[k]))
        )
        assert R_err < 5e-3, (k, R_err)
        np.testing.assert_allclose(np.asarray(res_s.t[k]), t_gt[k], atol=2e-2)
        # Cross-solver agreement.
        dR = np.linalg.norm(
            np.asarray(lie.so3_log(jnp.swapaxes(res_d.R, -1, -2)[k] @ res_s.R[k]))
        )
        assert dR < 5e-3, (k, dR)
        np.testing.assert_allclose(
            np.asarray(res_s.t[k]), np.asarray(res_d.t[k]), atol=2e-2
        )
    err_before = np.linalg.norm(np.asarray(prob.Xw) - X_gt, axis=1).mean()
    err_after = np.linalg.norm(np.asarray(res_s.Xw) - X_gt, axis=1).mean()
    assert err_after < 0.5 * err_before, (err_before, err_after)
    assert np.asarray(res_s.obs_inlier).mean() > 0.95


def test_sparse_ba_respects_fixed_and_invalid():
    prob, R_gt, t_gt, X_gt = _make_ba_problem(K_n=4)
    kf_valid = np.array([True, True, True, False])
    obs_valid = np.asarray(prob.obs_valid) & (np.asarray(prob.obs_kf) != 3)
    prob2 = BAProblem(
        **{
            **{f.name: getattr(prob, f.name) for f in prob.__dataclass_fields__.values()},
            "kf_valid": jnp.asarray(kf_valid),
            "obs_valid": jnp.asarray(obs_valid),
        }
    )
    res = sparse_ba(prob2, iters=8, gate_at=4)
    np.testing.assert_allclose(np.asarray(res.R[0]), np.asarray(prob.R[0]), atol=1e-7)
    np.testing.assert_allclose(np.asarray(res.R[3]), np.asarray(prob.R[3]), atol=1e-7)
    np.testing.assert_allclose(np.asarray(res.t[3]), np.asarray(prob.t[3]), atol=1e-7)


def _make_map_scale_problem(K_n=128, L_n=4096, obs_per_kf=320, seed=5):
    """A long corridor trajectory with local landmark visibility and
    accumulated drift — the shape of a whole map at loop-closure time.
    The dense solver would need a (K,L,6,3) cross term (~113 MB here,
    19 GB at reference map scale); the sparse solver is O(obs)."""
    rng = np.random.default_rng(seed)
    # Landmarks strung along a corridor in x.
    lm_x = np.linspace(0, K_n * 0.3, L_n)
    X_gt = np.stack(
        [lm_x, rng.uniform(-2, 2, L_n), rng.uniform(4, 8, L_n)], 1
    ).astype(np.float32)
    R_gt = np.tile(np.eye(3, dtype=np.float32), (K_n, 1, 1))
    t_gt = np.zeros((K_n, 3), np.float32)
    obs_kf, obs_lm, obs_uv = [], [], []
    for k in range(K_n):
        cam_x = k * 0.3
        t_gt[k] = np.array([-cam_x, 0, 0], np.float32)  # Tcw translation
        # Observe landmarks within a forward window.
        near = np.nonzero(np.abs(lm_x - cam_x) < 6.0)[0]
        take = near[rng.permutation(len(near))[:obs_per_kf]]
        pc = X_gt[take] @ R_gt[k].T + t_gt[k]
        uv = np.stack(
            [FX * pc[:, 0] / pc[:, 2], FY * pc[:, 1] / pc[:, 2]], 1
        ) + rng.normal(0, 0.3, (len(take), 2))
        obs_kf.append(np.full(len(take), k))
        obs_lm.append(take)
        obs_uv.append(uv)
    obs_kf = np.concatenate(obs_kf).astype(np.int32)
    obs_lm = np.concatenate(obs_lm).astype(np.int32)
    obs_uv = np.concatenate(obs_uv).astype(np.float32)
    O_n = len(obs_kf)

    # Drift-style perturbation growing along the trajectory (what global
    # BA sees after an essential-graph correction).
    R_init = R_gt.copy()
    t_init = t_gt.copy()
    X_init = X_gt.copy()
    for k in range(2, K_n):
        mag = 0.02 * k / K_n
        dR = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(0, mag, 3).astype(np.float32))))
        R_init[k] = dR @ R_gt[k]
        t_init[k] = t_gt[k] + rng.normal(0, 5 * mag, 3).astype(np.float32)
    X_init += rng.normal(0, 0.05, X_gt.shape).astype(np.float32)

    fixed = np.zeros(K_n, bool)
    fixed[:2] = True
    prob = BAProblem(
        R=jnp.asarray(R_init),
        t=jnp.asarray(t_init),
        kf_valid=jnp.ones(K_n, bool),
        kf_fixed=jnp.asarray(fixed),
        Xw=jnp.asarray(X_init),
        lm_valid=jnp.ones(L_n, bool),
        obs_kf=jnp.asarray(obs_kf),
        obs_lm=jnp.asarray(obs_lm),
        obs_uvr=jnp.asarray(
            np.concatenate([obs_uv, np.zeros((O_n, 1), np.float32)], 1)
        ),
        obs_sigma2=jnp.ones(O_n, jnp.float32),
        obs_stereo=jnp.zeros(O_n, bool),
        obs_valid=jnp.ones(O_n, bool),
        fx=jnp.float32(FX),
        fy=jnp.float32(FY),
        bf=jnp.float32(0.0),
    )
    return prob, R_gt, t_gt, X_gt


def test_sparse_ba_map_scale():
    prob, R_gt, t_gt, X_gt = _make_map_scale_problem()
    res = sparse_ba(prob, iters=10, gate_at=5, cg_iters=80)
    t_err_before = np.linalg.norm(np.asarray(prob.t) - t_gt, axis=1).mean()
    t_err_after = np.linalg.norm(np.asarray(res.t) - t_gt, axis=1).mean()
    assert t_err_after < 0.15 * t_err_before, (t_err_before, t_err_after)
    x_err_before = np.linalg.norm(np.asarray(prob.Xw) - X_gt, axis=1).mean()
    x_err_after = np.linalg.norm(np.asarray(res.Xw) - X_gt, axis=1).mean()
    assert x_err_after < 0.4 * x_err_before, (x_err_before, x_err_after)
    assert np.asarray(res.obs_inlier).mean() > 0.95


def _make_vi_problem(pad_obs_to: int | None = None):
    """Small FullInertialBA problem (chain + reprojection); also used by
    the distributed-BA equality test. Returns (prob, p_gt, p_perturbed).
    `pad_obs_to` pads the observation set with invalid rows so it
    divides a device-mesh size. Returns (prob, p_gt, p_perturbed, v_gt, v_perturbed)."""
    from test_inertial import make_kf_chain, _landmark_obs

    n_kf, kf_dt = 6, 0.4
    Rwb, p, v, pre = make_kf_chain(n_kf=n_kf, kf_dt=kf_dt)
    rng = np.random.default_rng(3)
    n_lm = 96
    Xw, _, fx, fy = _landmark_obs(Rwb[0], p[0], n_lm=n_lm, seed=7, noise=0.3)
    obs_kf, obs_lm, obs_uvr, obs_sig = [], [], [], []
    for k in range(n_kf):
        Rcw = Rwb[k].T
        tcw = -Rcw @ p[k]
        pc = Xw @ Rcw.T + tcw
        vis = pc[:, 2] > 0.5
        uv = np.stack(
            [fx * pc[:, 0] / np.maximum(pc[:, 2], 1e-6),
             fy * pc[:, 1] / np.maximum(pc[:, 2], 1e-6)], 1
        ) + rng.normal(0, 0.3, (n_lm, 2))
        for j in np.nonzero(vis & (np.abs(uv) < 400).all(1))[0]:
            obs_kf.append(k)
            obs_lm.append(j)
            obs_uvr.append([uv[j, 0], uv[j, 1], 0.0])
            obs_sig.append(1.0)
    O = len(obs_kf)
    Rp, pp, vp = Rwb.copy(), p.copy(), v.copy()
    for k in range(1, n_kf):
        Rp[k] = Rp[k] @ np.asarray(lie.so3_exp(jnp.asarray(rng.normal(0, 0.01, 3))))
        pp[k] = pp[k] + rng.normal(0, 0.03, 3)
        vp[k] = vp[k] + rng.normal(0, 0.1, 3)
    Xp = Xw + rng.normal(0, 0.03, Xw.shape)

    prob = inertial.VIBAProblem(
        Rwb=jnp.asarray(Rp.astype(np.float32)),
        twb=jnp.asarray(pp.astype(np.float32)),
        vel=jnp.asarray(vp.astype(np.float32)),
        bg=jnp.zeros((n_kf, 3)),
        ba=jnp.zeros((n_kf, 3)),
        kf_valid=jnp.ones(n_kf, bool),
        kf_fixed=jnp.zeros(n_kf, bool).at[0].set(True),
        Xw=jnp.asarray(Xp.astype(np.float32)),
        lm_valid=jnp.ones(n_lm, bool),
        obs_kf=jnp.asarray(np.asarray(obs_kf, np.int32)),
        obs_lm=jnp.asarray(np.asarray(obs_lm, np.int32)),
        obs_uvr=jnp.asarray(np.asarray(obs_uvr, np.float32)),
        obs_sigma2=jnp.asarray(np.asarray(obs_sig, np.float32)),
        obs_stereo=jnp.zeros(O, bool),
        obs_valid=jnp.ones(O, bool),
        edge_i=jnp.arange(n_kf - 1, dtype=jnp.int32),
        edge_j=jnp.arange(1, n_kf, dtype=jnp.int32),
        edge_valid=jnp.ones(n_kf - 1, bool),
        pre=pre,
        Rcb=jnp.eye(3),
        tcb=jnp.zeros(3),
        fx=jnp.float32(fx),
        fy=jnp.float32(fy),
        bf=jnp.float32(0.0),
    )
    if pad_obs_to is not None and pad_obs_to > O:
        pad = pad_obs_to - O
        import dataclasses as _dc
        prob = _dc.replace(
            prob,
            obs_kf=jnp.concatenate([prob.obs_kf, jnp.zeros(pad, jnp.int32)]),
            obs_lm=jnp.concatenate([prob.obs_lm, jnp.zeros(pad, jnp.int32)]),
            obs_uvr=jnp.concatenate(
                [prob.obs_uvr, jnp.zeros((pad, 3), jnp.float32)]
            ),
            obs_sigma2=jnp.concatenate(
                [prob.obs_sigma2, jnp.ones(pad, jnp.float32)]
            ),
            obs_stereo=jnp.concatenate([prob.obs_stereo, jnp.zeros(pad, bool)]),
            obs_valid=jnp.concatenate([prob.obs_valid, jnp.zeros(pad, bool)]),
        )
    return prob, p, pp, v, vp


def test_sparse_vi_ba_matches_dense():
    """The sparse VI solver agrees with visual_inertial_ba on the same
    temporal-window problem (FullInertialBA equivalence)."""
    prob, p, pp, v, vp = _make_vi_problem()
    res_d = inertial.visual_inertial_ba(prob, iters=12, gate_at=6)
    res_s = sparse_vi_ba(prob, iters=12, gate_at=6, cg_iters=80)

    # Both close to GT and to each other.
    err_d = np.linalg.norm(np.asarray(res_d.twb) - p, axis=-1).mean()
    err_s = np.linalg.norm(np.asarray(res_s.twb) - p, axis=-1).mean()
    err_0 = np.linalg.norm(pp - p, axis=-1).mean()
    assert err_s < 0.4 * err_0, (err_0, err_s)
    assert abs(err_s - err_d) < 0.5 * err_0 + 5e-3, (err_d, err_s)
    cross = np.linalg.norm(
        np.asarray(res_s.twb) - np.asarray(res_d.twb), axis=-1
    ).mean()
    assert cross < 2e-2, cross
    v_err_s = np.linalg.norm(np.asarray(res_s.vel) - v, axis=-1).mean()
    v_err_0 = np.linalg.norm(vp - v, axis=-1).mean()
    assert v_err_s < 0.6 * v_err_0, (v_err_0, v_err_s)


def test_informed_obs_drop_keeps_landmark_cores():
    """VERDICT r3 item 8: at the observation cap, no landmark loses its
    whole observation set — every landmark keeps min(4, count) obs."""
    import numpy as np

    from orbslam3_cpp_fork_tpu.runtime.tracker import informed_obs_drop

    rng = np.random.default_rng(3)
    # 400 landmarks with wildly uneven observation counts (1..60).
    counts = rng.integers(1, 60, 400)
    o_lm = np.repeat(np.arange(400), counts)
    cap = len(o_lm) // 3
    keep = informed_obs_drop(o_lm, cap, rng)
    assert len(keep) == cap
    assert len(np.unique(keep)) == cap  # no duplicates
    kept_counts = np.bincount(o_lm[keep], minlength=400)
    need = np.minimum(counts, 4)
    # Core guarantee holds as long as the cap can accommodate the cores.
    assert need.sum() <= cap
    assert (kept_counts >= need).all(), (
        kept_counts[kept_counts < need], need[kept_counts < need]
    )
    # Under-cap input passes through identity.
    keep2 = informed_obs_drop(o_lm, len(o_lm) + 10, rng)
    assert len(keep2) == len(o_lm)
