"""Device-mesh helpers: node-dimension sharding for all-sources PPR.

The reference's only parallelism is ``grankMulti``'s pthread data parallelism
over node ranges with shared-memory communication
(header-only/grankMulti.h:289-436).  The TPU-native successor:

* a 1-D ``jax.sharding.Mesh`` over the ``"nodes"`` axis;
* basket arrays ``[N, L]`` row-sharded (each device owns a node range — the
  moral equivalent of grankMulti's static chunking, grankMulti.h:379-391);
* cross-shard basket reads (a node merging a successor basket owned by
  another device) become XLA-inserted collectives over ICI, replacing the
  shared-memory reads that grankMulti makes safe via its rehash-freeze
  protocol (grankMulti.h:313-322);
* the convergence max-reduce replaces the serial per-thread ``maxDiffs``
  reduction (grankMulti.h:406-407).
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NODE_AXIS = "nodes"


def make_mesh(n_shards: int | None = None, devices: Sequence | None = None) -> Mesh:
    """A 1-D mesh over the node axis using the first ``n_shards`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_shards is not None:
        if n_shards > len(devices):
            raise ValueError(
                f"n_shards={n_shards} exceeds available devices ({len(devices)})"
            )
        devices = devices[:n_shards]
    return Mesh(np.asarray(devices), (NODE_AXIS,))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Rows (nodes) split across the mesh; trailing dims replicated."""
    return NamedSharding(mesh, P(NODE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
