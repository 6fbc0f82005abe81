from pim_sort_merge_join_tpu.engine.pipeline import QueryPipeline

__all__ = ["QueryPipeline"]
