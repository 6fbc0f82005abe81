"""Pairwise sorted-run merge + merge-tree reduction (ops/merge.py).

Parity target: merge_dpu.c (pairwise merge of two sorted MRAM runs) and the
host reduction driver app.c:408-547. Oracle: numpy mergesort-stable
concatenate-and-sort.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pim_sort_merge_join_tpu.columnar.table import Table
from pim_sort_merge_join_tpu.ops.merge import merge_sorted, merge_tree


def _sorted_table(rng, n, cap=None, ncol=4, key_hi=1000):
    rows = np.column_stack(
        [
            np.sort(rng.integers(0, key_hi, size=n)),
            rng.integers(0, 100, size=(n, ncol - 1)),
        ]
    ).astype(np.int64)
    return Table.from_numpy(rows, capacity=cap), rows


def _oracle_merge(parts):
    allrows = np.concatenate(parts, axis=0)
    order = np.argsort(allrows[:, 0], kind="stable")
    return allrows[order]


def test_merge_sorted_matches_oracle():
    rng = np.random.default_rng(0)
    t1, r1 = _sorted_table(rng, 100, cap=128)
    t2, r2 = _sorted_table(rng, 77, cap=96)
    out = jax.jit(lambda a, b: merge_sorted(a, b, 0))(t1, t2)
    assert out.capacity == 128 + 96
    got = out.to_numpy()
    np.testing.assert_array_equal(got, _oracle_merge([r1, r2]))


def test_merge_sorted_stability_run1_first_on_ties():
    # Identical keys, distinct payloads: run-1 rows must precede run-2 rows.
    r1 = np.array([[5, 1, 1, 1], [5, 2, 2, 2]], dtype=np.int64)
    r2 = np.array([[5, 3, 3, 3]], dtype=np.int64)
    out = merge_sorted(Table.from_numpy(r1), Table.from_numpy(r2), 0)
    np.testing.assert_array_equal(out.to_numpy(), np.vstack([r1, r2]))


def test_merge_sorted_empty_run():
    rng = np.random.default_rng(1)
    t1, r1 = _sorted_table(rng, 50, cap=64)
    t2 = Table.empty(4, 32)
    out = merge_sorted(t1, t2, 0)
    np.testing.assert_array_equal(out.to_numpy(), r1[np.argsort(r1[:, 0], kind="stable")])


def test_merge_tree_many_runs():
    rng = np.random.default_rng(2)
    parts = []
    tables = []
    for i in range(7):  # odd count exercises the leftover carry
        t, r = _sorted_table(rng, 20 + 3 * i, cap=64)
        tables.append(t)
        parts.append(r)
    out = jax.jit(lambda *ts: merge_tree(ts, 0))(*tables)
    np.testing.assert_array_equal(out.to_numpy(), _oracle_merge(parts))


def test_merge_schema_mismatch_raises():
    t1 = Table.empty(4, 8)
    t2 = Table.empty(3, 8)
    with pytest.raises(ValueError):
        merge_sorted(t1, t2, 0)
