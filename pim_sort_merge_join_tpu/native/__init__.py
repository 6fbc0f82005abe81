from pim_sort_merge_join_tpu.native import csv_native

__all__ = ["csv_native"]
