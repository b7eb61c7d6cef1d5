"""Recall/quality harness comparing approximate baskets to exact PPR.

Reference: ``ppr::benchmarkAlgorithm`` (include/benchmarkAlgorithm.h:51-153).
Semantics preserved:

* sample ``test_nodes`` random sources from the result's keys (``strict``
  skips out-degree-0 sources, benchmarkAlgorithm.h:71-77);
* exact oracle fixed at 100 iterations, damping 0.85, tolerance 1e-4
  (benchmarkAlgorithm.h:32,91);
* the exact basket is truncated **to the approximate basket's size** (not K!)
  before the Jaccard comparison (benchmarkAlgorithm.h:95);
* Kendall tau-b compares the approximate scores against the *untruncated*
  exact scores at the approximate basket's ids (benchmarkAlgorithm.h:116-126);
* all stats are -1 when nothing was sampled (benchmarkAlgorithm.h:144-151).

TPU formulation: sources are evaluated in batches — exact PPR vectors come
from the batched power-iteration oracle, Jaccard/Kendall are row-wise
vectorized ops.  An extra ``recall average`` stat (top-K hit rate vs the
exact top-K) is reported beyond the reference's five, for the BASELINE.json
metric.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Hashable, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import Graph
from ..ops.basket import Baskets, jaccard_rows
from ..ops.kendall import kendall_tau_b
from ..utils.validation import check_test_nodes
from .ppr_single_source import ppr_single_source_batch

STAT_KEYS = (
    "jaccard average",
    "jaccard min",
    "kendall average",
    "kendall min",
    "average map size",
)


@dataclasses.dataclass
class SampledResult:
    """The ``test_nodes`` sampled rows of one algorithm's result, gathered
    to the host (~KBs) so the full ``[N, L]`` arrays can be freed.

    Two results sampled with the same (graph, test_nodes, strict, seed)
    select the same sources, so :func:`benchmark_sampled` can evaluate
    both against ONE exact-oracle pass — at north-star scale each oracle
    pass is minutes of chip time, and the reference driver's layout
    (grank then mccompletepathv2 on the same sampled nodes,
    src/main.cc:40,68) hits exactly this sharing.
    """

    sources: np.ndarray  # int64[M] internal source ids
    ids: np.ndarray  # int32[M, W] basket ids, -1 padded
    scores: np.ndarray  # float32[M, W]


def _result_to_rows(result, graph: Graph):
    """Normalize a map-of-maps result to (source ids [M], ids [M, W],
    scores [M, W]).  ``Baskets`` results never pass through here — their
    sampled rows are gathered on device (see benchmark_algorithm), because
    materializing all ``[N, L]`` rows on the host costs a multi-GB
    device-to-host transfer at graph scale when only ``test_nodes`` rows
    are ever evaluated."""
    if isinstance(result, Mapping):
        sources = []
        for k in result:
            if k not in graph:
                raise ValueError(
                    f"node {k} in the provided map is not part of the provided graph"
                )
            sources.append(graph.key_to_id(k))
        width = max((len(b) for b in result.values()), default=1)
        width = max(width, 1)
        ids = np.full((len(sources), width), -1, dtype=np.int32)
        scores = np.zeros((len(sources), width), dtype=np.float32)
        for r, (k, basket) in enumerate(result.items()):
            for c, (node, score) in enumerate(basket.items()):
                ids[r, c] = graph.key_to_id(node)
                scores[r, c] = score
        return np.asarray(sources, dtype=np.int64), ids, scores
    raise TypeError(f"unsupported result type {type(result)!r}")


def sample_result(
    result,
    graph: Graph,
    test_nodes: int,
    strict: bool,
    *,
    seed: int | None = None,
) -> SampledResult:
    """Sample ``test_nodes`` sources from a result and gather their rows.

    Sampling mirrors the reference (shuffle candidates, ``strict`` skips
    out-degree-0 sources, benchmarkAlgorithm.h:60-79) and is a pure
    function of (result keys, graph, test_nodes, strict, seed) — so two
    full-coverage results sampled with equal arguments share sources.
    For ``Baskets`` results only the sampled rows cross the host link
    (~80 KB vs 3.8 GB of full arrays at the 4.8M-node north star).
    """
    check_test_nodes(test_nodes)
    if isinstance(result, Baskets):
        n = graph.num_nodes
        if result.ids.shape[0] != n:
            raise ValueError("basket result must cover every graph node")
        sources = np.arange(n, dtype=np.int64)
        ids_all = scores_all = None  # sampled rows gathered on device below
    else:
        sources, ids_all, scores_all = _result_to_rows(result, graph)

    if strict:
        mask = graph.out_degree[sources] > 0
        keep = np.nonzero(mask)[0]
    else:
        keep = np.arange(sources.size)
    rng = np.random.default_rng(seed)
    rng.shuffle(keep)
    keep = keep[: min(test_nodes, keep.size)]

    if keep.size == 0:
        return SampledResult(
            sources=np.empty(0, np.int64),
            ids=np.empty((0, 1), np.int32),
            scores=np.empty((0, 1), np.float32),
        )
    sel_sources = sources[keep]
    if ids_all is None:
        keep_d = jnp.asarray(keep, dtype=jnp.int32)
        sel_ids = np.asarray(jnp.asarray(result.ids)[keep_d])
        sel_scores = np.asarray(jnp.asarray(result.scores)[keep_d])
    else:
        sel_ids = ids_all[keep]
        sel_scores = scores_all[keep]
    return SampledResult(sources=sel_sources, ids=sel_ids, scores=sel_scores)


def benchmark_sampled(
    samples: Sequence[SampledResult],
    graph: Graph,
    *,
    oracle_iterations: int = 100,
    oracle_damping: float = 0.85,
    oracle_tolerance: float = 1e-4,
    batch_size: int | None = None,
    mesh=None,
) -> list:
    """Stats for several sampled results sharing ONE exact-oracle pass.

    All samples must hold the same source list (same sampling arguments).
    Returns one stats dict per sample.
    """
    if batch_size is None:
        # [B, N] f32 state x ~4 live buffers in the oracle loop; cap the
        # per-buffer footprint at ~128 MB so N=4.8M eval fits on one chip.
        # The batch cap is 32, not 64: the v5e backend miscompiles the
        # oracle's gather/reduce at [64, 300k]-class shapes (PPR rows
        # summing to 6.08 — caught by the oracle's mass-conservation
        # self-check) while every shape up to B=32 validates clean.
        batch_size = int(max(4, min(32, (32 << 20) // max(graph.num_nodes, 1))))
        if mesh is not None:
            batch_size *= int(mesh.devices.size)
    if not samples:
        return []
    sel_sources = samples[0].sources
    for s in samples[1:]:
        if not np.array_equal(s.sources, sel_sources):
            raise ValueError(
                "benchmark_sampled requires identical source samples "
                "(same graph/test_nodes/strict/seed)"
            )
    if sel_sources.size == 0:
        out = {k: -1.0 for k in STAT_KEYS}
        out["recall average"] = -1.0
        return [dict(out) for _ in samples]

    parts = [
        {"jacc": [], "kend": [], "recall": [], "sizes": []} for _ in samples
    ]
    for s in range(0, sel_sources.size, batch_size):
        b_src = sel_sources[s : s + batch_size]
        nb = b_src.shape[0]
        if nb < batch_size:  # pad the ragged final batch: one compile total
            b_src = np.pad(b_src, (0, batch_size - nb), mode="edge")
        dense = ppr_single_source_batch(
            graph, b_src, oracle_iterations, oracle_damping, oracle_tolerance,
            mesh=mesh,
        )[:nb]  # [b, N]
        b_src = b_src[:nb]
        bsz = dense.shape[0]
        # A node is "present" in the exact sparse map iff its score is > 0
        # or it is the source (pprSingleSource always inserts the source).
        present = dense > 0
        present = present.at[jnp.arange(bsz), jnp.asarray(b_src)].set(True)

        for sample, acc in zip(samples, parts):
            b_ids = jnp.asarray(sample.ids[s : s + nb])
            b_scores = jnp.asarray(sample.scores[s : s + nb])
            width = sample.ids.shape[1]
            sizes = np.asarray(jnp.sum(b_ids >= 0, axis=1))
            # Exact basket truncated to the approx basket's size: take the
            # top `width` entries, then keep the first `sizes[r]` of each.
            top_scores, top_ids = jax.lax.top_k(
                dense, min(width, dense.shape[1])
            )
            pos = jnp.arange(top_ids.shape[1])[None, :]
            top_present = jnp.take_along_axis(present, top_ids, axis=1)
            live = (pos < jnp.asarray(sizes)[:, None]) & top_present
            exact_ids = jnp.where(live, top_ids, -1).astype(jnp.int32)
            if exact_ids.shape[1] < width:
                exact_ids = jnp.pad(
                    exact_ids,
                    ((0, 0), (0, width - exact_ids.shape[1])),
                    constant_values=-1,
                )

            acc["jacc"].append(np.asarray(jaccard_rows(b_ids, exact_ids)))

            # Kendall: approx scores vs untruncated exact values at the
            # approx ids.
            safe = jnp.clip(b_ids, 0)
            exact_at_ids = jnp.take_along_axis(dense, safe, axis=1)
            valid = b_ids >= 0
            acc["kend"].append(
                np.asarray(
                    kendall_tau_b(
                        b_scores, jnp.where(valid, exact_at_ids, 0.0), valid
                    )
                )
            )
            # recall@K extension: fraction of the approx basket's ids in
            # the exact top-(same size) — == intersection / size.
            inter = np.asarray(
                jnp.sum(
                    (b_ids[:, :, None] == exact_ids[:, None, :])
                    & (b_ids[:, :, None] >= 0),
                    axis=(1, 2),
                )
            )
            acc["recall"].append(
                np.where(sizes > 0, inter / np.maximum(sizes, 1), 1.0)
            )
            acc["sizes"].append(sizes)

    out = []
    for acc in parts:
        jacc = np.concatenate(acc["jacc"])
        kend = np.concatenate(acc["kend"])
        recall = np.concatenate(acc["recall"])
        sizes = np.concatenate(acc["sizes"])
        out.append(
            {
                "jaccard average": float(jacc.mean()),
                "jaccard min": float(jacc.min()),
                "kendall average": float(kend.mean()),
                "kendall min": float(kend.min()),
                "average map size": float(sizes.mean()),
                "recall average": float(recall.mean()),
            }
        )
    return out


def benchmark_algorithm(
    result,
    graph: Graph,
    test_nodes: int,
    strict: bool,
    *,
    seed: int | None = None,
    oracle_iterations: int = 100,
    oracle_damping: float = 0.85,
    oracle_tolerance: float = 1e-4,
    batch_size: int | None = None,
    mesh=None,
) -> Dict[str, float]:
    """Quality stats of an approximate all-sources PPR result.

    ``result`` is either the ``Baskets`` from ``*_baskets`` functions or the
    reference-shaped dict-of-dicts.  ``seed`` makes sampling reproducible
    (the reference uses an entropy-seeded shuffle, benchmarkAlgorithm.h:60-61).

    ``batch_size=None`` auto-sizes the oracle batch so the dense ``[B, N]``
    power-iteration state stays bounded at graph scale (~128 MB per buffer);
    ``mesh`` row-shards each oracle batch across the mesh (CSR replicated),
    the scale-out path for north-star-size eval.  To evaluate several
    results against one shared oracle pass, see :func:`sample_result` +
    :func:`benchmark_sampled`.
    """
    sample = sample_result(result, graph, test_nodes, strict, seed=seed)
    return benchmark_sampled(
        [sample],
        graph,
        oracle_iterations=oracle_iterations,
        oracle_damping=oracle_damping,
        oracle_tolerance=oracle_tolerance,
        batch_size=batch_size,
        mesh=mesh,
    )[0]
