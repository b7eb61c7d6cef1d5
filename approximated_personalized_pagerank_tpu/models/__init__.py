from .benchmark import benchmark_algorithm
from .grank import grank, grank_baskets, grank_multi, grank_multi_baskets
from .mccompletepathv2 import mccompletepathv2, mccompletepathv2_baskets
from .ppr_single_source import ppr_single_source, ppr_single_source_batch

__all__ = [
    "benchmark_algorithm",
    "grank",
    "grank_baskets",
    "grank_multi",
    "grank_multi_baskets",
    "mccompletepathv2",
    "mccompletepathv2_baskets",
    "ppr_single_source",
    "ppr_single_source_batch",
]
