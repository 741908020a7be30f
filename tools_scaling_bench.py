"""Distributed-BA scaling measurement (BASELINE.md: >=70% scaling
efficiency target for the distributed configs).

Runs the map-scale sparse PCG-Schur BA (the runtime's global-BA path)
with the observation set sharded over 1, 2, 4, ... devices and reports
wall-clock per solve + parallel efficiency. On real multi-chip TPU the
reductions ride ICI; on a virtual CPU mesh (default here, 8 virtual
devices) the numbers are only a relative sanity check since all
"devices" share one host — run on a real slice for true efficiency.

Usage: python tools_scaling_bench.py [--kfs 256] [--lms 8192] [--obs-per-kf 320]
"""

import argparse
import json
import os
import time

if "JAX_PLATFORMS" not in os.environ or os.environ.get("JAX_PLATFORMS") == "axon":
    # Default to the virtual CPU mesh when no real multi-chip slice.
    os.environ.setdefault(
        "XLA_FLAGS",
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
    )

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kfs", type=int, default=256)
    ap.add_argument("--lms", type=int, default=8192)
    ap.add_argument("--obs-per-kf", type=int, default=320)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--cg-iters", type=int, default=40)
    args = ap.parse_args()

    import jax

    # The platform must be chosen BEFORE the first jax.devices() call
    # initializes the backend (the sandbox sitecustomize pins the TPU
    # platform via jax.config; querying devices first makes a later
    # switch a no-op). Default: the virtual CPU mesh (single-chip
    # sessions measure a RELATIVE curve there); set
    # ORBSLAM3_SCALING_BACKEND=tpu on a real multi-chip slice.
    if os.environ.get("ORBSLAM3_SCALING_BACKEND", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from jax.sharding import Mesh

    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from test_sparse_ba import _make_map_scale_problem  # noqa: E402
    from orbslam3_cpp_fork_tpu.parallel.dist_ba import sparse_ba_sharded  # noqa: E402

    devs = jax.devices()
    prob, *_ = _make_map_scale_problem(
        K_n=args.kfs, L_n=args.lms, obs_per_kf=args.obs_per_kf
    )
    O = int(prob.obs_kf.shape[0])

    results = {}
    n = 1
    sizes = []
    while n <= len(devs):
        sizes.append(n)
        n *= 2
    for n in sizes:
        if O % n != 0:
            continue
        mesh = Mesh(np.array(devs[:n]), ("obs",))
        run = lambda: sparse_ba_sharded(
            mesh, prob, iters=args.iters, gate_at=3, cg_iters=args.cg_iters
        ).cost.block_until_ready()
        run()  # compile
        t0 = time.perf_counter()
        run()
        results[n] = time.perf_counter() - t0

    base = results.get(1)
    out = {
        "metric": "dist_ba_scaling",
        "backend": jax.default_backend(),
        "obs": O,
        "kfs": args.kfs,
        "lms": args.lms,
        "wall_s": {str(k): round(v, 4) for k, v in results.items()},
    }
    if base:
        out["efficiency"] = {
            str(k): round(base / (v * k), 3) for k, v in results.items()
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
