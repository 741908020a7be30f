"""Distributed BA over a virtual 8-device mesh: the sharded GN step must
agree with single-device math and reduce error (SURVEY.md §7 M8)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from orbslam3_cpp_fork_tpu.parallel.dist_ba import make_dist_ba_step, shard_problem
from orbslam3_cpp_fork_tpu.utils import lie

from test_optim import _make_ba_problem


def test_dist_ba_step_runs_and_converges():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 virtual devices"
    mesh = Mesh(np.array(devs[:8]), ("ba",))
    prob, R_gt, t_gt, X_gt = _make_ba_problem(K_n=6, L_n=120)
    # Pad observations to a multiple of 8 for even sharding.
    O = prob.obs_kf.shape[0]
    O_pad = ((O + 7) // 8) * 8
    pad = O_pad - O

    def padded(x, fill=0):
        return jnp.concatenate([x, jnp.full((pad, *x.shape[1:]), fill, x.dtype)])

    import dataclasses
    prob = dataclasses.replace(
        prob,
        obs_kf=padded(prob.obs_kf),
        obs_lm=padded(prob.obs_lm),
        obs_uvr=padded(prob.obs_uvr),
        obs_sigma2=padded(prob.obs_sigma2, 1),
        obs_stereo=padded(prob.obs_stereo, False),
        obs_valid=padded(prob.obs_valid, False),
    )
    prob_sharded = shard_problem(mesh, prob)
    step = make_dist_ba_step(mesh)
    R, t, Xw = prob_sharded.R, prob_sharded.t, prob_sharded.Xw
    for _ in range(8):
        R, t, Xw = step(prob_sharded, R, t, Xw)
    R = np.asarray(R)
    t = np.asarray(t)
    Xw = np.asarray(Xw)
    for k in range(2, 6):
        R_err = np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(R_gt[k].T @ R[k]))))
        assert R_err < 1e-2, (k, R_err)
        np.testing.assert_allclose(t[k], t_gt[k], atol=3e-2)
    err_before = np.linalg.norm(np.asarray(prob.Xw) - X_gt, axis=1).mean()
    err_after = np.linalg.norm(Xw[:120] - X_gt, axis=1).mean()
    assert err_after < 0.5 * err_before
