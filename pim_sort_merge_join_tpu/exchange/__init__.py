from pim_sort_merge_join_tpu.exchange.partition import (
    choose_splitters,
    destination_of,
    sample_keys,
)
from pim_sort_merge_join_tpu.exchange.shuffle import all_to_all_exchange

__all__ = [
    "choose_splitters",
    "destination_of",
    "sample_keys",
    "all_to_all_exchange",
]
