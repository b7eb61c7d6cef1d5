"""Basket save/load.

The reference keeps everything in memory and returns results by value; its
thesis sketches (but does not implement) persisting walk/score maps to
secondary storage (thesis §6.1 p.23).  Capability parity here: basket arrays
round-trip to ``.npz`` together with the graph's key vocabulary, so an
all-sources run can be computed once and served/resumed later.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..graph import Graph
from ..ops.basket import Baskets

__all__ = ["save_baskets", "load_baskets"]


def save_baskets(path: str, baskets: Baskets, graph: Optional[Graph] = None) -> None:
    arrays = {
        "ids": np.asarray(baskets.ids),
        "scores": np.asarray(baskets.scores),
    }
    if graph is not None:
        keys = np.asarray(graph.keys)
        if keys.dtype.kind in "iuf":
            arrays["keys"] = keys
        else:
            arrays["keys"] = keys.astype("U")
    np.savez_compressed(path, **arrays)


def load_baskets(path: str):
    """Returns (Baskets, keys-or-None)."""
    import jax.numpy as jnp

    with np.load(path, allow_pickle=False) as data:
        baskets = Baskets(
            jnp.asarray(data["ids"]), jnp.asarray(data["scores"])
        )
        keys = data["keys"] if "keys" in data.files else None
    return baskets, keys
