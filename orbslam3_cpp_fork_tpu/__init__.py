"""orbslam3_cpp_fork_tpu — a TPU-native visual(-inertial) SLAM framework.

A from-scratch re-design of the capabilities of the ORB-SLAM3 C++20 fork
(reference: elkuno213/orbslam3_cpp_fork) for TPU hardware:

- Front-end (ORB pyramid/FAST/BRIEF extraction, Hamming matching) as
  batched JAX/XLA + Pallas kernels instead of per-pixel C++ loops
  (reference: src/ORBextractor.cc, src/ORBmatcher.cc).
- Estimation (motion-only pose optimization, local/global bundle
  adjustment, pose-graph, Sim3, IMU preintegration + visual-inertial BA)
  as batched Gauss-Newton/Levenberg-Marquardt with Schur complement,
  replacing g2o (reference: src/Optimizer.cc, Thirdparty/g2o).
- Map data model as fixed-capacity structure-of-arrays device state with
  validity masks, replacing the mutex-guarded pointer graph
  (reference: src/{Frame,KeyFrame,MapPoint,Map,Atlas}.cc).
- The four-thread runtime (Tracking / LocalMapping / LoopClosing / Viewer)
  becomes a host-orchestrated pipeline of jitted device programs
  (reference: src/{Tracking,LocalMapping,LoopClosing}.cc).

Subpackages
-----------
utils     Lie groups (SO3/SE3/Sim3), config, trajectory IO, ATE evaluation.
ops       Numeric kernels: pyramid, FAST, BRIEF, matching, cameras,
          triangulation, RANSAC solvers, IMU preintegration.
models    Map state: frames, keyframe/landmark SoA stores, covisibility,
          Atlas, keyframe (place-recognition) database.
optim     Batched GN/LM: residual library, pose optimization, local/global
          BA with Schur complement, pose-graph (Sim3 / 4-DoF).
runtime   Tracking state machine, local mapping, loop closing, System facade.
parallel  Device meshes and distributed (sharded) bundle adjustment.
datasets  EuRoC / TUM / KITTI loaders and the synthetic test-sequence
          generator used for regression tests.
"""

__version__ = "0.1.0"

import jax as _jax

# SLAM estimation is chains of small f32 matmuls (rotation products, 6x6
# normal equations, SVDs); on TPU the default matmul precision lowers f32
# to bf16 passes, which measurably corrupts long rotation chains
# (0.16 max-abs error over a 200-step product in testing). Default to
# full f32 precision; throughput-critical image kernels opt back into
# lower precision explicitly at their call sites.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache — OPT-IN via ORBSLAM3_TPU_JAX_CACHE.
# The runtime dispatches ~30 distinct jitted programs whose first
# compile costs 10-40 s each, and the cache makes later processes load
# them in milliseconds. It is NOT enabled by default: on this machine
# XLA:CPU's AOT loader intermittently disagrees with its own compiler
# about host CPU features ("Machine type used for XLA:CPU compilation
# doesn't match the machine type for execution ... could lead to
# SIGILL") and a cached CPU executable loaded under the mismatch
# aborted the process mid-test-suite. In-process warm passes
# (Tracker.warm_mapping_programs + the bench's warm sweep) cover the
# compile-stall problem without the cross-process cache.
import os as _os

_cache_dir = _os.environ.get("ORBSLAM3_TPU_JAX_CACHE")
if _cache_dir:
    try:  # pragma: no cover - environment-dependent
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.5
        )
    except Exception:  # cache is an optimization, never a requirement
        pass
