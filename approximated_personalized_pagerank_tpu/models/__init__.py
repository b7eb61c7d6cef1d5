from .grank import grank, grank_baskets
from .ppr_single_source import ppr_single_source, ppr_single_source_batch

__all__ = [
    "grank",
    "grank_baskets",
    "ppr_single_source",
    "ppr_single_source_batch",
]
