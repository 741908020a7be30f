"""Distributed bundle adjustment over a device mesh.

The reference has no distributed execution (SURVEY.md §2.9); this is the
TPU-native scale-out called for by BASELINE.json: the observation set of
a (local or global) BA problem is sharded across chips, each chip
computes its shard's per-observation Jacobian blocks, and every
normal-equation reduction (the segment-sums inside the matrix-free
PCG-Schur solver, optim/sparse_ba.py) becomes a `psum` over the ICI
mesh. The small replicated state (keyframe blocks, landmark blocks,
CG vectors) is identical on every device.

Layout:
- obs_* arrays: sharded along the observation axis, P('obs').
- KF/landmark state: replicated (P()).
- Collectives per CG iteration: one psum of (L,3) and one of (K,6);
  per LM iteration additionally the block reductions
  (K,6,6)+(L,3,3)+(K,6)+(L,3) and the preconditioner (K,6,6).

This data-parallel decomposition is exact (identical math to the
single-chip solver up to floating-point reduction order) — asserted by
tests/test_dist_ba.py — and the Jacobian work, which dominates at map
scale, splits linearly across devices. The runtime's whole-map BA
(Tracker._global_ba) takes this path automatically whenever more than
one device is visible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..optim.local_ba import BAProblem, BAResult
from ..optim.sparse_ba import sparse_ba

AXIS = "obs"


def _prob_specs(axis: str = AXIS) -> BAProblem:
    obs = P(axis)
    rep = P()
    return BAProblem(
        R=rep, t=rep, kf_valid=rep, kf_fixed=rep, Xw=rep, lm_valid=rep,
        obs_kf=obs, obs_lm=obs, obs_uvr=obs,
        obs_sigma2=obs, obs_stereo=obs, obs_valid=obs,
        fx=rep, fy=rep, bf=rep,
    )


def shard_problem(mesh: Mesh, p: BAProblem, axis: str = AXIS) -> BAProblem:
    """Device_put the problem with obs arrays sharded along `axis`.
    The observation count must be divisible by the mesh size."""
    specs = _prob_specs(axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), p, specs
    )


def sparse_ba_sharded(
    mesh: Mesh,
    p: BAProblem,
    iters: int = 12,
    gate_at: int = 6,
    cg_iters: int = 60,
    axis: str = AXIS,
) -> BAResult:
    """Run the full sparse PCG-Schur LM solve with observations sharded
    over `mesh`. Results are replicated and equal (up to reduction
    order) to `sparse_ba(p, ...)` on one device."""
    if int(p.obs_kf.shape[0]) % mesh.devices.size != 0:
        raise ValueError(
            f"obs count {p.obs_kf.shape[0]} not divisible by mesh size "
            f"{mesh.devices.size}; pad the problem"
        )

    def run(ps: BAProblem) -> BAResult:
        return sparse_ba(
            ps, iters=iters, gate_at=gate_at, cg_iters=cg_iters,
            axis_name=axis,
        )

    fn = shard_map(
        run,
        mesh=mesh,
        in_specs=(_prob_specs(axis),),
        out_specs=BAResult(
            R=P(), t=P(), Xw=P(), obs_inlier=P(axis), cost=P()
        ),
    )
    return fn(shard_problem(mesh, p, axis))


_VI_OBS_FIELDS = (
    "obs_kf", "obs_lm", "obs_uvr", "obs_sigma2", "obs_stereo", "obs_valid",
)


def _vi_prob_specs(p, axis: str = AXIS):
    """PartitionSpecs matching VIBAProblem `p`'s structure: observation
    arrays sharded along `axis`, body states / landmarks / inertial
    chain (small, O(K)) replicated."""
    import jax.tree_util as jtu

    def spec(path, _leaf):
        name = next(
            (k.name for k in path if hasattr(k, "name")), None
        )
        return P(axis) if name in _VI_OBS_FIELDS else P()

    return jtu.tree_map_with_path(spec, p)


def sparse_vi_ba_sharded(
    mesh: Mesh,
    p,
    iters: int = 12,
    gate_at: int = 6,
    cg_iters: int = 80,
    axis: str = AXIS,
):
    """FullInertialBA with the reprojection observation set sharded over
    `mesh` (visual-inertial analog of sparse_ba_sharded): each device
    reduces its shard's reprojection normal-equation blocks with psums
    over ICI; the inertial chain (O(K) edges, replicated) is computed
    locally on every device without collectives."""
    from ..optim.inertial import VIBAResult
    from ..optim.sparse_ba import sparse_vi_ba

    if int(p.obs_kf.shape[0]) % mesh.devices.size != 0:
        raise ValueError(
            f"obs count {p.obs_kf.shape[0]} not divisible by mesh size "
            f"{mesh.devices.size}; pad the problem"
        )
    specs = _vi_prob_specs(p, axis)

    def run(ps):
        return sparse_vi_ba(
            ps, iters=iters, gate_at=gate_at, cg_iters=cg_iters,
            axis_name=axis,
        )

    fn = shard_map(
        run,
        mesh=mesh,
        in_specs=(specs,),
        out_specs=VIBAResult(
            Rwb=P(), twb=P(), vel=P(), bg=P(), ba=P(), Xw=P(),
            obs_inlier=P(axis), cost=P(),
        ),
    )
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), p, specs
    )
    return fn(sharded)


def default_mesh(axis: str = AXIS) -> Mesh | None:
    """One-axis mesh over all visible devices; None when single-device."""
    devs = jax.devices()
    if len(devs) < 2:
        return None
    return Mesh(np.array(devs), (axis,))
