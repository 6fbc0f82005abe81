"""Unit tests for the single-device relational operators vs numpy oracles."""

import numpy as np
import pytest

from pim_sort_merge_join_tpu.columnar.table import Table
from pim_sort_merge_join_tpu.config import Predicate
from pim_sort_merge_join_tpu.ops import filter as filter_ops
from pim_sort_merge_join_tpu.ops import join as join_ops
from pim_sort_merge_join_tpu.ops import oracle
from pim_sort_merge_join_tpu.ops import sort as sort_ops


def to_table(rows, capacity=None):
    return Table.from_numpy(rows, capacity=capacity)


@pytest.mark.parametrize("op", [">", ">=", "<", "<=", "==", "!="])
def test_filter_matches_oracle(small_tables, op):
    rows = small_tables[0]
    pred = Predicate(col=1, op=op, value=int(np.median(rows[:, 1])))
    got = filter_ops.apply_filter(to_table(rows, capacity=256), pred).to_numpy()
    want = oracle.filter_oracle(rows, pred.col, op, pred.value)
    np.testing.assert_array_equal(got, want)


def test_filter_preserves_row_order(small_tables):
    rows = small_tables[0]
    pred = Predicate(col=0, op=">", value=100)
    got = filter_ops.apply_filter(to_table(rows), pred).to_numpy()
    want = oracle.filter_oracle(rows, 0, ">", 100)
    np.testing.assert_array_equal(got, want)


def test_filter_empty_result(small_tables):
    rows = small_tables[0]
    pred = Predicate(col=0, op=">", value=int(rows[:, 0].max()))
    got = filter_ops.apply_filter(to_table(rows), pred)
    assert int(got.num_rows) == 0
    assert got.to_numpy().shape == (0, rows.shape[1])


def test_sort_matches_oracle(small_tables):
    rows = small_tables[0]
    got = sort_ops.sort_by_key(to_table(rows, capacity=300), 0).to_numpy()
    want = oracle.sort_oracle(rows, 0)
    np.testing.assert_array_equal(got, want)


def test_sort_with_duplicates_stable(dup_tables):
    rows = dup_tables[0]
    got = sort_ops.sort_by_key(to_table(rows), 0).to_numpy()
    want = oracle.sort_oracle(rows, 0)
    np.testing.assert_array_equal(got, want)


def test_sort_other_key_column(small_tables):
    rows = small_tables[0]
    got = sort_ops.sort_by_key(to_table(rows), 2).to_numpy()
    want = oracle.sort_oracle(rows, 2)
    np.testing.assert_array_equal(got, want)


def _sorted_tables(rows1, rows2, key1=0, key2=0, cap=None):
    s1 = oracle.sort_oracle(rows1, key1)
    s2 = oracle.sort_oracle(rows2, key2)
    return to_table(s1, capacity=cap), to_table(s2, capacity=cap), s1, s2


def test_merge_join_one_to_one_unique_keys(small_tables):
    t1, t2, s1, s2 = _sorted_tables(*small_tables, cap=256)
    got = join_ops.merge_join_one_to_one(t1, t2, 0, 0).to_numpy()
    want = oracle.join_one_to_one_oracle(s1, s2, 0, 0)
    np.testing.assert_array_equal(got, want)


def test_merge_join_one_to_one_duplicates(dup_tables):
    t1, t2, s1, s2 = _sorted_tables(*dup_tables, cap=512)
    got = join_ops.merge_join_one_to_one(t1, t2, 0, 0).to_numpy()
    want = oracle.join_one_to_one_oracle(s1, s2, 0, 0)
    np.testing.assert_array_equal(got, want)


def test_merge_join_inner_duplicates(dup_tables):
    t1, t2, s1, s2 = _sorted_tables(*dup_tables, cap=512)
    want = oracle.join_inner_oracle(s1, s2, 0, 0)
    got_t = join_ops.merge_join_inner(t1, t2, 0, 0, out_capacity=want.shape[0] + 64)
    got = got_t.to_numpy()
    np.testing.assert_array_equal(got, want)


def test_merge_join_inner_overflow_reports_true_count(dup_tables):
    t1, t2, s1, s2 = _sorted_tables(*dup_tables, cap=512)
    want = oracle.join_inner_oracle(s1, s2, 0, 0)
    got_t = join_ops.merge_join_inner(t1, t2, 0, 0, out_capacity=16)
    assert int(got_t.num_rows) == want.shape[0]
    np.testing.assert_array_equal(np.asarray(got_t.data)[:16, :], want[:16])


def test_merge_join_different_key_columns(rng):
    rows1 = rng.integers(0, 50, size=(100, 3)).astype(np.int64)
    rows2 = rng.integers(0, 50, size=(120, 5)).astype(np.int64)
    k1, k2 = 2, 1
    s1 = oracle.sort_oracle(rows1, k1)
    s2 = oracle.sort_oracle(rows2, k2)
    got = join_ops.merge_join_one_to_one(
        to_table(s1, capacity=128), to_table(s2, capacity=128), k1, k2
    ).to_numpy()
    want = oracle.join_one_to_one_oracle(s1, s2, k1, k2)
    np.testing.assert_array_equal(got, want)


def test_merge_join_empty_sides(small_tables):
    rows = oracle.sort_oracle(small_tables[0], 0)
    empty = Table.empty(4, 64)
    t = to_table(rows)
    assert int(join_ops.merge_join_one_to_one(t, empty, 0, 0).num_rows) == 0
    assert int(join_ops.merge_join_one_to_one(empty, t, 0, 0).num_rows) == 0
