"""Fused filter+sort+join path vs the staged path: byte-identical.

The fused operator (ops/join.py::filter_join_one_to_one) replaces
filter -> sort -> merge_join in the pipeline; these tests pin the
equivalence on the cases where it could silently diverge: duplicate keys
(tie order), rows filtered from only one side, empty results, and narrow
dtypes.
"""

import functools

import jax
import numpy as np

from pim_sort_merge_join_tpu.columnar.table import Table
from pim_sort_merge_join_tpu.config import EngineConfig, Predicate
from pim_sort_merge_join_tpu.engine.pipeline import pipeline_core
from pim_sort_merge_join_tpu.ops import filter as filter_ops
from pim_sort_merge_join_tpu.ops import join as join_ops
from pim_sort_merge_join_tpu.ops import sort as sort_ops


def _staged(t1, t2, cfg):
    f1 = filter_ops.apply_filter(t1, cfg.predicate1)
    f2 = filter_ops.apply_filter(t2, cfg.predicate2)
    s1 = sort_ops.sort_by_key(f1, cfg.join_key1)
    s2 = sort_ops.sort_by_key(f2, cfg.join_key2)
    return join_ops.merge_join_one_to_one(s1, s2, cfg.join_key1, cfg.join_key2)


def _both(r1, r2, cfg, cap1=None, cap2=None, dtype=np.int64):
    t1 = Table.from_numpy(r1.astype(dtype), capacity=cap1, dtype=dtype)
    t2 = Table.from_numpy(r2.astype(dtype), capacity=cap2, dtype=dtype)
    fused = jax.jit(functools.partial(pipeline_core, config=cfg))(t1, t2)
    staged = jax.jit(functools.partial(_staged, cfg=cfg))(t1, t2)
    return fused, staged


def test_fused_equals_staged_duplicates(dup_tables):
    r1, r2 = dup_tables
    cfg = EngineConfig(
        predicate1=Predicate(1, ">", 300), predicate2=Predicate(1, ">", 250)
    )
    fused, staged = _both(r1, r2, cfg, cap1=384, cap2=512)
    assert int(fused.num_rows) == int(staged.num_rows) > 0
    np.testing.assert_array_equal(fused.to_numpy(), staged.to_numpy())


def test_fused_equals_staged_empty_result(small_tables):
    r1, r2 = small_tables
    cfg = EngineConfig(
        predicate1=Predicate(0, ">", 10**9), predicate2=Predicate(0, ">", 0)
    )
    fused, staged = _both(r1, r2, cfg)
    assert int(fused.num_rows) == int(staged.num_rows) == 0


def test_fused_equals_staged_one_sided_filter(dup_tables):
    r1, r2 = dup_tables
    cfg = EngineConfig(
        predicate1=Predicate(2, "<=", 500), predicate2=Predicate(0, ">=", 0)
    )
    fused, staged = _both(r1, r2, cfg)
    np.testing.assert_array_equal(fused.to_numpy(), staged.to_numpy())


def test_fused_equals_staged_int32(dup_tables):
    r1, r2 = dup_tables
    cfg = EngineConfig(
        predicate1=Predicate(1, ">", 100),
        predicate2=Predicate(1, ">", 100),
        dtype="int32",
    )
    fused, staged = _both(r1, r2, cfg, dtype=np.int32)
    np.testing.assert_array_equal(fused.to_numpy(), staged.to_numpy())
    assert fused.to_numpy().dtype == np.int32
