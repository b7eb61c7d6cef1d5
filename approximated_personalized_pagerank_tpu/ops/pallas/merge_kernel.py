"""Fused Pallas TPU kernel for the basket merge hot path.

One kernel invocation per row tile does the whole per-node pipeline of
GRank's inner loop (include/grank.h:96-126) on VMEM-resident data:

    bitonic sort by id  ->  segmented duplicate-id sum  ->  top-L by score

i.e. everything after the XLA-side candidate gather, with zero HBM traffic
between the O(log^2 W) network stages.  The same jnp network code
(ops/bitonic.py) runs inside the kernel; Mosaic maps the compare-exchange
selects onto the VPU.

Candidates come in as ``[C, W]`` (ids padded with PAD_ID, scores 0); output
is ``[C, L_pad]`` baskets (ids padded with -1).  W and L_pad must be powers
of two.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..bitonic import (
    PAD_ID,
    bitonic_prune_topk,
    bitonic_sort_pairs,
    segmented_sum_sorted,
)

DEFAULT_ROW_TILE = 8


def _merge_kernel(ids_ref, scores_ref, out_ids_ref, out_scores_ref, *, l_pad):
    ids = ids_ref[:]
    scores = scores_ref[:]
    ids, scores = bitonic_sort_pairs(ids, scores)
    ids, scores = segmented_sum_sorted(ids, scores)
    # prune-topk: O(W log L) instead of a second full O(W log^2 W) sort
    out_ids, out_scores = bitonic_prune_topk(ids, scores, l_pad)
    out_ids_ref[:] = out_ids
    out_scores_ref[:] = out_scores


@functools.partial(
    jax.jit, static_argnames=("l_pad", "row_tile", "interpret")
)
def fused_merge_topl(
    ids: jax.Array,
    scores: jax.Array,
    l_pad: int,
    row_tile: int = DEFAULT_ROW_TILE,
    interpret: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Row-wise merge+top-L of candidate lists via the fused kernel.

    ``ids``/``scores``: [C, W] with W a power of two, PAD_ID padding.
    Returns ([C, l_pad] ids with -1 padding, [C, l_pad] scores).
    C is padded to a multiple of ``row_tile`` internally.
    """
    if interpret is None:
        # No compiled Pallas on CPU: interpret there (tests), compile on TPU.
        interpret = jax.default_backend() == "cpu"
    c, w = ids.shape
    assert w & (w - 1) == 0, f"W must be a power of two, got {w}"
    assert l_pad & (l_pad - 1) == 0 and l_pad <= w
    # Fixed row tile regardless of C: Mosaic pads sublanes to 8 anyway, and
    # shrinking the tile for small buckets would mint a DISTINCT kernel per
    # (tc, w) — on heavy-tailed graphs the high-degree buckets hold 1-7
    # nodes each, and the resulting per-tc Mosaic recompiles (~70s apiece at
    # W=8192) dominated whole-program compile time.  One kernel per width.
    tc = row_tile
    pad = (-c) % tc
    if pad:
        ids = jnp.pad(ids, ((0, pad), (0, 0)), constant_values=PAD_ID)
        scores = jnp.pad(scores, ((0, pad), (0, 0)))
    cp = c + pad

    grid = (cp // tc,)
    # Wide rows need more scoped VMEM than Mosaic's conservative 16MB
    # default for the network's live temporaries (measured: ~21MB at
    # tc*w = 64k elements, i.e. ~340B per element); v5e has 128MB headroom.
    # Mosaic pads the sublane dim to 8 (int32/f32 native tiles are 8x128),
    # so a tile of fewer rows still allocates like 8 — a 1-row W=8192 chunk
    # needs 18.8MB, not 2.9MB (measured: scoped-vmem OOM at the default).
    vmem_limit = min(110 << 20, max(16 << 20, 352 * max(tc, 8) * w))
    out_ids, out_scores = pl.pallas_call(
        functools.partial(_merge_kernel, l_pad=l_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tc, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tc, l_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, l_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cp, l_pad), jnp.int32),
            jax.ShapeDtypeStruct((cp, l_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(ids, scores)
    if pad:
        out_ids = out_ids[:c]
        out_scores = out_scores[:c]
    return out_ids, out_scores
