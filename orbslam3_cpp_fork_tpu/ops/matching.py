"""Descriptor matching as dense masked Hamming-distance kernels.

TPU-native replacement for ORBmatcher (src/ORBmatcher.cc): instead of
per-keypoint candidate loops over grid cells / BoW nodes, every variant
is expressed as a dense N x M distance matrix plus additive masks:

- Hamming distance via the MXU: with bits in {0,1} as int8,
  H(a,b) = |a| + |b| - 2 a.b, so the N x M matrix is one int8 matmul
  (replaces DescriptorDistance's popcount loop, src/ORBmatcher.cc:2075).
- Search windows (grid queries `GetFeaturesInArea`, scale gates, epipolar
  bands) become +INF penalties added to the distance matrix.
- Lowe ratio test, mutual-best cross-check, and the rotation-consistency
  histogram (ComputeThreeMaxima, src/ORBmatcher.cc:2038) are batched
  reductions.

Thresholds follow the reference: TH_HIGH=100, TH_LOW=50, HISTO_LENGTH=30
(src/ORBmatcher.cc:30-32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TH_HIGH = 100
TH_LOW = 50
HISTO_LENGTH = 30
INF = jnp.float32(1e9)


def hamming_matrix(bits_a: jax.Array, bits_b: jax.Array) -> jax.Array:
    """(N,256) x (M,256) int8 bit arrays -> (N,M) int32 Hamming distances.

    Runs as an int8 matmul on the MXU: H = |a| + |b| - 2 a.b.
    """
    a = bits_a.astype(jnp.int32 if bits_a.dtype != jnp.int8 else jnp.int8)
    b = bits_b.astype(jnp.int32 if bits_b.dtype != jnp.int8 else jnp.int8)
    dot = jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    wa = jnp.sum(bits_a.astype(jnp.int32), axis=1)
    wb = jnp.sum(bits_b.astype(jnp.int32), axis=1)
    return wa[:, None] + wb[None, :] - 2 * dot


def popcount_hamming(desc_a: jax.Array, desc_b: jax.Array) -> jax.Array:
    """Packed uint32 (N,8) x (M,8) -> (N,M) via population_count (VPU path).

    Reference for correctness tests of `hamming_matrix`; also the better
    choice for tiny M where the matmul would be padding-dominated.
    """
    x = jax.lax.population_count(desc_a[:, None, :] ^ desc_b[None, :, :])
    return jnp.sum(x.astype(jnp.int32), axis=-1)


def match_nn(
    dist: jax.Array,
    valid_a: jax.Array,
    valid_b: jax.Array,
    max_dist: float = TH_LOW,
    ratio: float = 1.0,
    cross_check: bool = True,
    extra_penalty: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Nearest-neighbor matching on a (possibly masked) distance matrix.

    Returns (idx_b (N,), ok (N,)): for each row a, the matched column and
    whether the match passed threshold / ratio / mutual-best checks.
    """
    d = dist.astype(jnp.float32)
    d = jnp.where(valid_a[:, None] & valid_b[None, :], d, INF)
    if extra_penalty is not None:
        d = d + extra_penalty
    best = jnp.argmin(d, axis=1)
    best_d = jnp.take_along_axis(d, best[:, None], axis=1)[:, 0]
    # Second best for the ratio test. An iota-compare mask instead of a
    # row scatter: .at[rows, best].set(INF) lowers to a serialized
    # scatter on TPU and dominated this kernel's runtime.
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    second_d = jnp.min(jnp.where(cols == best[:, None], INF, d), axis=1)
    ok = (best_d <= max_dist) & (best_d < ratio * second_d)
    if cross_check:
        col_best = jnp.argmin(d, axis=0)  # (M,)
        ok = ok & (col_best[best] == jnp.arange(d.shape[0]))
    return best, ok


def rotation_consistency(
    angle_a: jax.Array,
    angle_b: jax.Array,
    idx_b: jax.Array,
    ok: jax.Array,
    n_bins: int = HISTO_LENGTH,
    keep_top: int = 3,
) -> jax.Array:
    """Keep only matches whose angle difference falls in the top-k histogram
    bins (reference CheckOrientation / ComputeThreeMaxima).

    The reference keeps bin 2/3 only if its count > count(max)/10; we keep
    the same rule.
    """
    rot = angle_a - angle_b[idx_b]
    rot = jnp.mod(rot, 2 * jnp.pi)
    bins = jnp.clip((rot * (n_bins / (2 * jnp.pi))).astype(jnp.int32), 0, n_bins - 1)
    counts = jnp.zeros((n_bins,), jnp.int32).at[bins].add(ok.astype(jnp.int32))
    top_c, top_i = jax.lax.top_k(counts, keep_top)
    keep_bin = jnp.zeros((n_bins,), bool)
    for k in range(keep_top):
        cond = (top_c[k] > 0) & ((k == 0) | (top_c[k] * 10 > top_c[0]))
        keep_bin = keep_bin.at[top_i[k]].set(cond | keep_bin[top_i[k]])
    return ok & keep_bin[bins]


def window_penalty(
    uv_pred: jax.Array,
    xy_b: jax.Array,
    radius: jax.Array,
    level_b: jax.Array | None = None,
    level_min: jax.Array | None = None,
    level_max: jax.Array | None = None,
) -> jax.Array:
    """(N,M) additive penalty: 0 inside the square search window (and level
    band), +INF outside — the dense analog of Frame::GetFeaturesInArea
    (src/Frame.cc:788-860)."""
    dx = jnp.abs(uv_pred[:, None, 0] - xy_b[None, :, 0])
    dy = jnp.abs(uv_pred[:, None, 1] - xy_b[None, :, 1])
    r = radius if radius.ndim else radius[None]
    pen = jnp.where((dx <= r[:, None]) & (dy <= r[:, None]), 0.0, INF)
    if level_b is not None:
        lvl_ok = jnp.ones_like(pen, dtype=bool)
        if level_min is not None:
            lvl_ok &= level_b[None, :] >= level_min[:, None]
        if level_max is not None:
            lvl_ok &= level_b[None, :] <= level_max[:, None]
        pen = jnp.where(lvl_ok, pen, INF)
    return pen


def search_by_projection(
    bits_map: jax.Array,
    valid_map: jax.Array,
    uv_pred: jax.Array,
    pred_level: jax.Array,
    bits_frame: jax.Array,
    xy_frame: jax.Array,
    level_frame: jax.Array,
    valid_frame: jax.Array,
    radius: jax.Array,
    max_dist: int = TH_HIGH,
    ratio: float = 0.9,
    level_band: int = 1,
) -> tuple[jax.Array, jax.Array]:
    """Project-and-match (reference SearchByProjection src/ORBmatcher.cc:38,
    :423): map descriptors vs frame features inside per-point windows at
    compatible scales."""
    dist = hamming_matrix(bits_map, bits_frame)
    pen = window_penalty(
        uv_pred,
        xy_frame,
        radius,
        level_frame,
        pred_level - level_band,
        pred_level + level_band,
    )
    return match_nn(
        dist, valid_map, valid_frame, max_dist, ratio, cross_check=True, extra_penalty=pen
    )


def epipolar_penalty(
    F12: jax.Array,
    xy1: jax.Array,
    xy2: jax.Array,
    sigma2_2: jax.Array,
    chi2_th: float = 3.84,
) -> jax.Array:
    """(N,M) penalty: +INF where x2 is farther than chi2_th * sigma from
    the epipolar line of x1 (ORBmatcher::SearchForTriangulation's
    CheckDistEpipolarLine, src/ORBmatcher.cc:916-1148)."""
    x1h = jnp.concatenate([xy1, jnp.ones_like(xy1[..., :1])], axis=-1)  # (N,3)
    lines = x1h @ F12.T  # (N,3) lines in image 2 (a,b,c)
    a, b, c = lines[:, 0:1], lines[:, 1:2], lines[:, 2:3]
    d = a * xy2[None, :, 0] + b * xy2[None, :, 1] + c  # (N,M)
    dsq = d * d / jnp.maximum(a * a + b * b, 1e-12)
    ok = dsq < chi2_th * sigma2_2[None, :]
    return jnp.where(ok, 0.0, INF)


hamming_matrix = jax.jit(hamming_matrix)
popcount_hamming = jax.jit(popcount_hamming)
match_nn = jax.jit(
    match_nn, static_argnames=("max_dist", "ratio", "cross_check")
)
rotation_consistency = jax.jit(
    rotation_consistency, static_argnames=("n_bins", "keep_top")
)
search_by_projection = jax.jit(
    search_by_projection, static_argnames=("max_dist", "ratio", "level_band")
)
