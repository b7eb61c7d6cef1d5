"""Dense MXU engine for GRank: the half-sweep as one systolic-array matmul.

For graphs that fit an ``[N, N]`` score matrix in HBM, the fastest TPU
formulation of GRank's hot loop (reference include/grank.h:96-126) is not a
gather/sort pipeline at all — it is a dense matrix product.  Writing the
basket set as a dense row-sparse matrix ``S`` (``S[v, k]`` = score of ``k``
in ``v``'s basket, 0 if absent), one half-sweep over partition ``p`` is

    S[p, :]  <-  trunc_L( (1 - d) * I[p, :]  +  W[p, :] @ S )

where ``W[v, s] = damping / outdeg(v) * multiplicity(v -> s)`` is the scaled
adjacency (a zero row for dangling nodes reproduces the reference's
mass-loss semantics, include/grank.h:100-101) and ``trunc_L`` zeroes every
row entry below the row's L-th largest score (``keepTop``,
include/internal/pprInternal.h:110-137).  The matmul runs on the MXU in
bfloat16 with float32 accumulation at >100 TFLOP/s; truncation uses
``lax.approx_max_k`` (the TPU-optimized partial reduce) to find the per-row
threshold and keeps everything at or above it — a *superset* of the exact
top-L whenever the approximate reduce misses an element, so recall never
drops below exact ``keepTop``, the boundary is merely slightly softer.

Nodes are renumbered so each 2-coloring partition is a contiguous row range:
partition updates become ``dynamic_update_slice`` instead of scatters, and
the per-partition adjacency halves ``W0 [n0, N]`` / ``W1 [n1, N]`` feed the
matmul directly.  The whole main loop — per-partition maxDiff bookkeeping,
tolerance stop, final ``keepTop(K)`` (include/grank.h:87-147) — runs as one
device program; ``iterations`` is a traced scalar so warm-up runs compile
the same executable.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .basket import SENTINEL, Baskets

__all__ = ["DensePlan", "build_dense_plan", "dense_grank_run", "use_dense_engine"]

# Auto-engine cutoff: the measured dense/sparse crossover on v5e (Eat-class
# density, canonical K=50/L=100/30 half-sweeps, round 4):
#   N      2048   4096   8192   16384   23132(Eat)
#   dense  0.05s  0.08s  0.27s  1.21s   3.05s
#   sparse 0.17s  0.43s  0.67s  1.33s   1.67s
# The dense sweep's O(N^2) matmul overtakes the sparse pipeline's O(E)
# gather/merge between 16k and 23k nodes; HBM would only become the binding
# constraint far later (~60k nodes for the [N, N] f32 score matrix).
DENSE_MAX_NODES = int(os.environ.get("PPR_DENSE_MAX_NODES", "16384"))
# MC's auto cutoff for the dense combine (see use_dense_engine): 2 combine
# passes amortize far better than GRank's 30 sweeps; bounded by the [N, N]
# f32 count matrix (~6.4 GB at 40k nodes on a 16 GB chip).
MC_DENSE_MAX_NODES = int(os.environ.get("PPR_MC_DENSE_MAX_NODES", "32768"))
# Per-row threshold recall for approx_max_k (see module docstring: misses
# only soften the truncation boundary, they never lose true top-L entries).
DENSE_TRUNC_RECALL = float(os.environ.get("PPR_DENSE_RECALL", "0.95"))

_LANE = 128


def use_dense_engine(
    num_nodes: int, engine: str, mesh, max_nodes: int | None = None
) -> bool:
    """Resolve the ``engine`` parameter ("auto" | "sparse" | "dense").

    ``max_nodes`` overrides the auto cutoff — MCCompletePathV2 passes
    ``MC_DENSE_MAX_NODES``: its dense combine runs only ``combine_passes``
    (2) matmuls instead of GRank's 30 half-sweeps, so the dense engine
    stays ahead of the sparse merge well past GRank's crossover (measured
    on Eat 23k: dense MC combine ~0.1 s vs ~1.2 s sparse).
    """
    if engine == "dense":
        return True
    if engine == "sparse" or mesh is not None:
        return False
    if engine != "auto":
        raise ValueError(f"unknown engine {engine!r}")
    return 0 < num_nodes <= (DENSE_MAX_NODES if max_nodes is None else max_nodes)


def default_matmul_dtype() -> jnp.dtype:
    """bfloat16 on TPU (MXU-native, f32 accumulation), float32 elsewhere."""
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


class DensePlan(NamedTuple):
    """Host-side prep: partition-contiguous renumbering + per-partition edges.

    ``perm`` maps new (partition-ordered) ids to original internal ids;
    edge arrays are in the renumbered space with rows local to the partition
    (row, col, weight) where weight already includes damping/outdeg and
    parallel-edge multiplicity is preserved (scatter-add accumulates,
    matching include/grank.h:79-80).
    """

    n: int
    n0: int
    n1: int
    n_pad: int
    perm: np.ndarray  # int32[n]   new id -> old id
    edges0: Tuple[np.ndarray, np.ndarray, np.ndarray]  # rows, cols, weights
    edges1: Tuple[np.ndarray, np.ndarray, np.ndarray]


def build_dense_plan(graph, damping: float) -> DensePlan:
    n = graph.num_nodes
    part = graph.partition
    perm = np.argsort(part, kind="stable").astype(np.int32)  # new -> old
    inv = np.empty(n, dtype=np.int32)
    inv[perm] = np.arange(n, dtype=np.int32)  # old -> new
    n0 = int((part == 0).sum())
    n_pad = max(_LANE, -(-n // _LANE) * _LANE)

    deg = graph.out_degree.astype(np.int64)
    src_old = np.repeat(np.arange(n, dtype=np.int64), deg)
    dst_old = graph.indices.astype(np.int64)
    src_new = inv[src_old]
    dst_new = inv[dst_old]
    w = (damping / np.maximum(deg, 1).astype(np.float64))[src_old].astype(
        np.float32
    )
    in0 = src_new < n0
    edges0 = (
        src_new[in0].astype(np.int32),
        dst_new[in0].astype(np.int32),
        w[in0],
    )
    edges1 = (
        (src_new[~in0] - n0).astype(np.int32),
        dst_new[~in0].astype(np.int32),
        w[~in0],
    )
    return DensePlan(
        n=n, n0=n0, n1=n - n0, n_pad=n_pad, perm=perm, edges0=edges0, edges1=edges1
    )


def _trunc_rows(C: jax.Array, L: int, recall: float, exact: bool) -> jax.Array:
    """Zero row entries below the row's L-th largest score (``keepTop``,
    include/internal/pprInternal.h:110-137).

    ``exact=False`` (the fast TPU path): threshold from ``approx_max_k`` and
    keep everything at or above it — a *superset* of the exact top-L (misses
    only lower the threshold) that also keeps all boundary ties.  ``exact=
    True``: exact ``top_k`` with lowest-id tie-breaking (the same order the
    sparse pipeline's keep_top produces) and a scatter rebuild — slower, used
    for engine-equivalence testing.
    """
    if L >= C.shape[-1]:
        return C
    if exact:
        vals, idx = jax.lax.top_k(C, L)
        rows = jnp.arange(C.shape[0], dtype=jnp.int32)[:, None]
        return jnp.zeros_like(C).at[rows, idx].set(jnp.maximum(vals, 0.0))
    vals, _ = jax.lax.approx_max_k(C, L, recall_target=recall)
    thr = vals[:, L - 1 : L]
    return jnp.where(C >= thr, C, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n", "n0", "n1", "n_pad", "L", "mm_dtype", "recall", "exact_trunc"
    ),
)
def _dense_init(
    e0_rows,
    e0_cols,
    e0_w,
    e1_rows,
    e1_cols,
    e1_w,
    damping,
    n: int,
    n0: int,
    n1: int,
    n_pad: int,
    L: int,
    mm_dtype,
    recall: float,
    exact_trunc: bool,
):
    """Build the adjacency halves and the truncated initial score matrix.

    Init semantics (include/grank.h:64-83): ``scores[v] = keepTop_L(
    {v: 1-damping} + {succ: += damping/outdeg})`` — exactly row ``v`` of the
    scaled adjacency plus the self entry.
    """

    def build_w(rows, cols, w, n_rows):
        A = jnp.zeros((n_rows, n_pad), jnp.float32)
        if rows.shape[0]:
            A = A.at[rows, cols].add(w)
        return A

    A0 = build_w(e0_rows, e0_cols, e0_w, n0)
    A1 = build_w(e1_rows, e1_cols, e1_w, n1)
    S = jnp.zeros((n_pad, n_pad), jnp.float32)
    if n0:
        S = jax.lax.dynamic_update_slice_in_dim(S, A0, 0, axis=0)
    if n1:
        S = jax.lax.dynamic_update_slice_in_dim(S, A1, n0, axis=0)
    diag = jnp.arange(n_pad, dtype=jnp.int32)
    live = diag < n
    S = S.at[diag, diag].add(jnp.where(live, 1.0 - damping, 0.0))
    S = _trunc_rows(S, L, recall, exact_trunc)
    # S is stored in the matmul dtype between sweeps (bf16 on TPU): the MXU
    # reads it directly — no per-sweep f32->bf16 cast, half the HBM read
    # traffic.  Accumulation stays f32 (preferred_element_type); the ~2^-9
    # storage quantization only raises the convergence-diff floor to ~1e-3
    # (see _dense_run docstring).
    return A0.astype(mm_dtype), A1.astype(mm_dtype), S.astype(mm_dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n",
        "n0",
        "n1",
        "L",
        "K",
        "compute_diff",
        "recall",
        "exact_trunc",
    ),
)
def _dense_run(
    A0,
    A1,
    S,
    perm,
    damping,
    tolerance,
    iterations,
    n: int,
    n0: int,
    n1: int,
    L: int,
    K: int,
    compute_diff: bool,
    recall: float,
    exact_trunc: bool,
) -> Baskets:
    """GRank's full main loop + final keepTop(K) as one device program.

    Mirrors the reference exactly (include/grank.h:87-147): ``iterations``
    counts half-sweeps, partition 0 first; per-partition maxDiff slots are
    initialised to the tolerance so each partition runs at least once; a
    negative tolerance (compute_diff=False upstream) never stops early.

    ``S`` is stored in the matmul dtype (bf16 on TPU).  This feeds the MXU
    directly and skips the per-sweep cast; the bf16 storage quantization
    (~2^-9 relative) puts a ~1e-3 floor under the L1 convergence diff, so
    sub-1e-3 tolerances simply run to the iteration cap on TPU — results
    are unchanged (the sweep itself is the same computation), only the
    early-stop becomes conservative.  Pass ``matmul_dtype=jnp.float32``
    upstream for tight-tolerance convergence studies.
    """
    mm_dtype = A0.dtype

    def half(state, Ap, off, n_rows):
        h, md0, md1, S = state
        run = (h < iterations) & (jnp.maximum(md0, md1) >= tolerance)
        if n_rows == 0:
            d = jnp.float32(0.0)
        else:

            def do(S):
                C = jnp.dot(Ap, S, preferred_element_type=jnp.float32)
                r = jnp.arange(n_rows, dtype=jnp.int32)
                C = C.at[r, off + r].add(1.0 - damping)
                new = _trunc_rows(C, L, recall, exact_trunc)
                if compute_diff:
                    old = jax.lax.dynamic_slice_in_dim(S, off, n_rows, axis=0)
                    d = jnp.max(
                        jnp.sum(jnp.abs(new - old.astype(jnp.float32)), axis=-1)
                    )
                else:
                    d = jnp.float32(0.0)
                S = jax.lax.dynamic_update_slice_in_dim(
                    S, new.astype(mm_dtype), off, axis=0
                )
                return S, d

            S, d = jax.lax.cond(
                run, do, lambda S: (S, jnp.float32(0.0)), S
            )
        # maxDiff[0] = d, then swap(maxDiff[0], maxDiff[1])
        # (include/grank.h:94,123,140)
        md0n = jnp.where(run, md1, md0)
        md1n = jnp.where(run, d, md1)
        return jnp.where(run, h + 1, h), md0n, md1n, S

    def body(state):
        state = half(state, A0, 0, n0)
        state = half(state, A1, n0, n1)
        return state

    def cond(state):
        h, md0, md1, _ = state
        return (h < iterations) & (jnp.maximum(md0, md1) >= tolerance)

    init = (jnp.int32(0), tolerance, tolerance, S)
    h, _, _, S = jax.lax.while_loop(cond, body, init)

    # Final keepTop(K) (include/grank.h:143-147) + translation back from the
    # partition-ordered space to original internal ids.  ``h`` = half-sweeps
    # actually executed, for honest throughput/MFU reporting.
    return _topk_baskets(S, n, K, perm=perm), h


def _topk_baskets(S, n: int, K: int, perm=None) -> Baskets:
    """Exact row-wise top-K of a dense score matrix as ``[n, K]`` Baskets.

    Entries with score <= 0 are absent (every genuine basket score is a
    positive sum).  ``perm`` (new id -> original id) translates both row
    order and column ids back from a renumbered space.
    """
    kk = min(K, S.shape[-1])
    vals, idx = jax.lax.top_k(S[:n, :].astype(jnp.float32), kk)
    live = vals > 0
    if perm is not None:
        ids = perm[jnp.minimum(idx, n - 1)]
    else:
        ids = idx.astype(jnp.int32)
    row_ids = jnp.where(live, ids, SENTINEL)
    row_scores = jnp.where(live, vals, 0.0)
    if kk < K:
        pad = ((0, 0), (0, K - kk))
        row_ids = jnp.pad(row_ids, pad, constant_values=SENTINEL)
        row_scores = jnp.pad(row_scores, pad)
    if perm is not None:
        out_ids = jnp.zeros((n, K), jnp.int32).at[perm].set(row_ids)
        out_scores = jnp.zeros((n, K), jnp.float32).at[perm].set(row_scores)
        return Baskets(out_ids, out_scores)
    return Baskets(row_ids, row_scores)


def dense_grank_run(
    graph,
    K: int,
    L: int,
    iterations: int,
    damping: float,
    tolerance: float,
    matmul_dtype=None,
    recall: float = DENSE_TRUNC_RECALL,
    exact_trunc: bool = False,
    return_info: bool = False,
) -> Baskets:
    """Run GRank end-to-end with the dense MXU engine (see module docstring).

    ``return_info=True`` additionally returns ``{"iterations_ran": h,
    "flops": f}`` — half-sweeps actually executed and the matmul FLOPs they
    cost — so callers report measured (not nominal) throughput.
    """
    plan = build_dense_plan(graph, damping)
    mm_dtype = matmul_dtype or default_matmul_dtype()
    A0, A1, S = _dense_init(
        jnp.asarray(plan.edges0[0]),
        jnp.asarray(plan.edges0[1]),
        jnp.asarray(plan.edges0[2]),
        jnp.asarray(plan.edges1[0]),
        jnp.asarray(plan.edges1[1]),
        jnp.asarray(plan.edges1[2]),
        jnp.float32(damping),
        n=plan.n,
        n0=plan.n0,
        n1=plan.n1,
        n_pad=plan.n_pad,
        L=L,
        mm_dtype=jnp.dtype(mm_dtype),
        recall=recall,
        exact_trunc=exact_trunc,
    )
    compute_diff = tolerance >= 0
    baskets, h = _dense_run(
        A0,
        A1,
        S,
        jnp.asarray(plan.perm),
        jnp.float32(damping),
        jnp.float32(tolerance),
        jnp.int32(iterations),
        n=plan.n,
        n0=plan.n0,
        n1=plan.n1,
        L=L,
        K=K,
        compute_diff=compute_diff,
        recall=recall,
        exact_trunc=exact_trunc,
    )
    if return_info:
        h = int(h)
        # partition 0 sweeps first; h half-sweeps alternate 0,1,0,1,...
        sweeps0 = (h + 1) // 2
        sweeps1 = h // 2
        flops = 2 * plan.n_pad * plan.n_pad * (
            sweeps0 * plan.n0 + sweeps1 * plan.n1
        )
        return baskets, {"iterations_ran": h, "flops": flops}
    return baskets


# --------------------------------------------------------------------------
# Dense MCCompletePathV2: walk counts in an [N, N] matrix, combine as one
# MXU matmul (reference combine: include/mccompletepathv2.h:211-250).
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n_pad",))
def _scatter_baskets(ids, scores, n_pad: int):
    """Dense [n_pad, n_pad] count matrix from [N, L] basket rows; sentinel
    slots add 0.0 at column 0 — a no-op on the zero-initialised matrix."""
    rows = jnp.arange(ids.shape[0], dtype=jnp.int32)
    valid = ids >= 0
    return jnp.zeros((n_pad, n_pad), jnp.float32).at[
        rows[:, None], jnp.where(valid, ids, 0)
    ].add(jnp.where(valid, scores, 0.0))


@functools.partial(
    jax.jit,
    static_argnames=("n", "n_pad", "L", "K", "passes", "recall",
                     "exact_trunc", "mm_dtype"),
)
def _dense_mc_combine(
    e_rows,
    e_cols,
    e_w,
    factor,
    counts,
    n: int,
    n_pad: int,
    L: int,
    K: int,
    passes: int,
    recall: float,
    exact_trunc: bool,
    mm_dtype,
) -> Baskets:
    """MC combine as matmuls: ``map_v = {v: 1/factor_v} + sum of successors'
    baskets; keepTop(L); *factor_v`` (mccompletepathv2.h:211-250).

    ``factor_v = damping/outdeg(v)`` (1.0 for dangling nodes, whose rows
    thereby reduce to ``{v: 1.0}`` exactly like mccompletepathv2.h:213-226:
    the self entry is 1/1 and a zero adjacency row adds nothing).
    """
    A = jnp.zeros((n, n_pad), jnp.float32)
    if e_rows.shape[0]:
        A = A.at[e_rows, e_cols].add(e_w)
    A = A.astype(mm_dtype)
    diag = jnp.arange(n, dtype=jnp.int32)
    # S stored in the matmul dtype between passes (see _dense_run): the MXU
    # reads it directly, no per-pass cast.
    S = counts.astype(mm_dtype)
    for _ in range(passes):
        C = jnp.dot(A, S, preferred_element_type=jnp.float32)
        C = C.at[diag, diag].add(1.0 / factor)
        C = _trunc_rows(C, L, recall, exact_trunc)
        C = C * factor[:, None]
        S = jnp.zeros((n_pad, n_pad), mm_dtype)
        S = jax.lax.dynamic_update_slice_in_dim(
            S, C.astype(mm_dtype), 0, axis=0
        )
    return _topk_baskets(S, n, K)


def dense_mc_run(
    graph,
    K: int,
    L: int,
    iterations: int,
    damping: float,
    seed: int | None = None,
    combine_passes: int = 1,
    matmul_dtype=None,
    recall: float = DENSE_TRUNC_RECALL,
    exact_trunc: bool = False,
    return_info: bool = False,
    stratified: bool = False,
) -> Baskets:
    """MCCompletePathV2 end-to-end with the dense engine: quota-slot walks
    (the trace engine — measured ~2x the dense-counts scatter path at every
    graph size, see ops/walk.walk_baskets) produce exact top-L normalized
    count rows that are scattered into an [N, N] matrix, then the combine
    runs as ``combine_passes`` MXU matmuls.

    ``return_info=True`` additionally returns ``{"walk_steps": v}`` — the
    number of walker hops that actually deposited a visit, the honest
    numerator for walk-steps/s.
    """
    from .walk import walk_trace_basket_chunks

    n = graph.num_nodes
    n_pad = max(_LANE, -(-n // _LANE) * _LANE)
    # Counters accumulate on device — one stack+transfer at the end.  A
    # float()/int() per chunk is a blocking host round-trip each that also
    # stalls dispatch of the next chunk (see ops/walk.walk_baskets).
    visit_parts, abandoned_parts = [], []
    ids_parts, score_parts = [], []
    for s, top, v, a in walk_trace_basket_chunks(
        graph, min(L, n), iterations, damping, seed=seed,
        stratified=stratified,
    ):
        if return_info:
            visit_parts.append(jnp.asarray(v, jnp.float32))
            abandoned_parts.append(a)
        ids_parts.append(top.ids)
        score_parts.append(top.scores)
    # ONE jitted scatter builds the [N, N] matrix: a per-chunk eager
    # .at[].add would copy the whole n_pad^2 buffer per chunk (2.1 GB x
    # 46 chunks on Eat — measured +1.4 s)
    counts = _scatter_baskets(
        jnp.concatenate(ids_parts, axis=0),
        jnp.concatenate(score_parts, axis=0),
        n_pad,
    )
    deg = graph.out_degree.astype(np.int64)
    factor = np.where(
        deg > 0, damping / np.maximum(deg, 1).astype(np.float64), 1.0
    ).astype(np.float32)
    src = np.repeat(np.arange(n, dtype=np.int64), deg).astype(np.int32)
    dst = graph.indices.astype(np.int32)
    mm_dtype = jnp.dtype(matmul_dtype or default_matmul_dtype())
    out = _dense_mc_combine(
        jnp.asarray(src),
        jnp.asarray(dst),
        jnp.ones(src.shape, jnp.float32),
        jnp.asarray(factor),
        counts,
        n=n,
        n_pad=n_pad,
        L=min(L, n),
        K=K,
        passes=combine_passes,
        recall=recall,
        exact_trunc=exact_trunc,
        mm_dtype=mm_dtype,
    )
    if return_info:
        visits = float(np.sum(np.asarray(jnp.stack(visit_parts), np.float64)))
        abandoned = int(np.asarray(jnp.stack(abandoned_parts)).sum())
        total = int(iterations * damping) * int((deg > 0).sum())
        return out, {
            "walk_steps": int(round(visits)),
            "abandoned_walks": abandoned,
            "total_walks": total,
        }
    return out
