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

from typing import Dict, Hashable, Mapping

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
    the scale-out path for north-star-size eval.
    """
    check_test_nodes(test_nodes)
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
        out = {k: -1.0 for k in STAT_KEYS}
        out["recall average"] = -1.0
        return out

    sel_sources = sources[keep]
    if ids_all is None:
        # Gather ONLY the sampled rows on device, then move ~test_nodes
        # rows: the full [N, L] arrays never cross the host link (3.8 GB
        # at the 4.8M-node north star, vs ~80 KB for 100 sampled rows).
        keep_d = jnp.asarray(keep, dtype=jnp.int32)
        sel_ids = np.asarray(jnp.asarray(result.ids)[keep_d])
        sel_scores = np.asarray(jnp.asarray(result.scores)[keep_d])
    else:
        sel_ids = ids_all[keep]
        sel_scores = scores_all[keep]
    width = sel_ids.shape[1]

    jacc_parts, kend_parts, recall_parts, size_parts = [], [], [], []
    for s in range(0, keep.size, batch_size):
        b_src = sel_sources[s : s + batch_size]
        nb = b_src.shape[0]
        if nb < batch_size:  # pad the ragged final batch: one compile total
            b_src = np.pad(b_src, (0, batch_size - nb), mode="edge")
        b_ids = jnp.asarray(sel_ids[s : s + nb])
        b_scores = jnp.asarray(sel_scores[s : s + nb])
        dense = ppr_single_source_batch(
            graph, b_src, oracle_iterations, oracle_damping, oracle_tolerance,
            mesh=mesh,
        )[:nb]  # [b, N]
        b_src = b_src[:nb]

        sizes = np.asarray(jnp.sum(b_ids >= 0, axis=1))
        # Exact basket truncated to the approx basket's size: take the top
        # `width` entries, then keep the first `sizes[r]` of each row.  A
        # node is "present" in the exact sparse map iff its score is > 0 or
        # it is the source (pprSingleSource always inserts the source).
        bsz = dense.shape[0]
        present = dense > 0
        present = present.at[jnp.arange(bsz), jnp.asarray(b_src)].set(True)
        top_scores, top_ids = jax.lax.top_k(dense, min(width, dense.shape[1]))
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

        jacc_parts.append(np.asarray(jaccard_rows(b_ids, exact_ids)))

        # Kendall: approx scores vs untruncated exact values at approx ids.
        safe = jnp.clip(b_ids, 0)
        exact_at_ids = jnp.take_along_axis(dense, safe, axis=1)
        valid = b_ids >= 0
        kend_parts.append(
            np.asarray(
                kendall_tau_b(
                    b_scores, jnp.where(valid, exact_at_ids, 0.0), valid
                )
            )
        )
        # recall@K extension: fraction of the approx basket's ids that are in
        # the exact top-(same size) — == intersection / size.
        inter = np.asarray(
            jnp.sum(
                (b_ids[:, :, None] == exact_ids[:, None, :])
                & (b_ids[:, :, None] >= 0),
                axis=(1, 2),
            )
        )
        recall_parts.append(
            np.where(sizes > 0, inter / np.maximum(sizes, 1), 1.0)
        )
        size_parts.append(sizes)

    jacc = np.concatenate(jacc_parts)
    kend = np.concatenate(kend_parts)
    recall = np.concatenate(recall_parts)
    sizes = np.concatenate(size_parts)
    return {
        "jaccard average": float(jacc.mean()),
        "jaccard min": float(jacc.min()),
        "kendall average": float(kend.mean()),
        "kendall min": float(kend.min()),
        "average map size": float(sizes.mean()),
        "recall average": float(recall.mean()),
    }
