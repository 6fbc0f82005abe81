from pim_sort_merge_join_tpu.columnar.table import Table
from pim_sort_merge_join_tpu.columnar import csv_io

__all__ = ["Table", "csv_io"]
