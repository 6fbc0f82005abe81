from pim_sort_merge_join_tpu.utils import validate

__all__ = ["validate"]
