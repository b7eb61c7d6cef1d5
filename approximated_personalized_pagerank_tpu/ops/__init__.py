from .basket import (
    Baskets,
    combine_sorted_runs,
    empty_baskets,
    jaccard_rows,
    keep_top,
    norm1_rows,
    sort_rows_by_id,
)
from .merge import DeviceBucket, device_plan, merge_bucket, merge_sweep

__all__ = [
    "Baskets",
    "combine_sorted_runs",
    "empty_baskets",
    "jaccard_rows",
    "keep_top",
    "norm1_rows",
    "sort_rows_by_id",
    "DeviceBucket",
    "device_plan",
    "merge_bucket",
    "merge_sweep",
]
