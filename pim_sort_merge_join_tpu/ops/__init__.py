from pim_sort_merge_join_tpu.ops import filter, sort, join, merge, oracle

__all__ = ["filter", "sort", "join", "merge", "oracle"]
