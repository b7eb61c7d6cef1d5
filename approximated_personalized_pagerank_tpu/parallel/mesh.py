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


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join a multi-host run: after this, ``jax.devices()`` is the GLOBAL
    device list and ``make_mesh()`` builds a multi-host mesh.

    The TPU analogue of launching one process per host on a pod slice (the
    v5e-16 north star is 4 hosts); collectives ride ICI within a host's
    chips and DCN across hosts — XLA handles the routing, the ring program
    is unchanged.  With no arguments the cluster configuration is taken
    from the environment (TPU metadata / Slurm / Open MPI), matching
    ``jax.distributed.initialize`` semantics.
    """
    import jax.distributed

    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def put_sharded(arr, sharding: NamedSharding):
    """Stage a host array onto a (possibly multi-host) mesh.

    Single-process: plain ``jax.device_put``.  Multi-process: every process
    holds the same global host array (graph prep is deterministic and
    replicated — the moral equivalent of grankMulti's shared maps,
    header-only/grankMulti.h:310-322) and contributes exactly the shards its
    addressable devices own via ``make_array_from_callback``;
    ``jax.device_put`` of a global array cannot build a multi-host
    ``jax.Array``.
    """
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )
