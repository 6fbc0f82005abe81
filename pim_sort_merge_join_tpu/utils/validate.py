"""Invariant validation (the engine's sanitizer layer).

The analog of the reference's sanitizer/analysis tooling (SURVEY.md S12:
`dpugrind` memory checking, `dpu_stack_analyzer`, runtime `check_stack()`,
compile-time alignment diagnostics on `mram_read/write`): host-side
invariant checks over tables and pipeline state, cheap enough to run in
tests and debug sessions, plus a determinism harness.

These are debugging tools -- the hot path never calls them implicitly.
"""

from __future__ import annotations

import jax
import numpy as np

from pim_sort_merge_join_tpu.columnar.table import Table


class ValidationError(AssertionError):
    pass


def check_dtype_range(rows: np.ndarray, dtype, name: str = "input") -> None:
    """Raise MalformedInputError when values exceed a narrow dtype's range.

    Shared by the single-chip CSV path and the distributed array path so a
    narrowing cast (e.g. int64 data into an int32-configured engine) fails
    loudly instead of wrapping.
    """
    dtype = np.dtype(dtype)
    if dtype.itemsize >= 8 or not np.issubdtype(dtype, np.integer):
        return
    info = np.iinfo(dtype)
    if rows.size and (rows.max() > info.max or rows.min() < info.min):
        from pim_sort_merge_join_tpu.engine.errors import MalformedInputError

        raise MalformedInputError(
            f"{name}: values exceed configured dtype {dtype} range "
            f"[{info.min}, {info.max}]"
        )


def check_narrow_keys(
    rows: np.ndarray, key: int, name: str = "input"
) -> None:
    """Raise MalformedInputError when join-key values do not fit int32.

    Guards ``config.narrow_keys`` (the 1:1 join's packed-key merge sort,
    ops/join.py:_narrow32): the narrowing is order-preserving only for
    values in [INT32_MIN, INT32_MAX) -- INT32_MAX itself is the narrow
    sentinel.
    """
    if not rows.size:
        return
    info = np.iinfo(np.int32)
    col = rows[:, key]
    if col.max() >= info.max or col.min() < info.min:
        from pim_sort_merge_join_tpu.engine.errors import MalformedInputError

        raise MalformedInputError(
            f"{name}: join-key values outside [{info.min}, {info.max}) -- "
            "narrow_keys=True requires every key to fit int32; disable it "
            "for this data"
        )


def check_narrow_data(rows: np.ndarray, name: str = "input") -> None:
    """Raise MalformedInputError when ANY table value does not fit int32.

    Guards ``config.narrow_data`` (the 1:1 join's int32 emit-sort payload
    planes, ops/join.py:_one_to_one_merged step 3): the int64->int32->int64
    roundtrip is exact only for values in [INT32_MIN, INT32_MAX).
    """
    if not rows.size:
        return
    info = np.iinfo(np.int32)
    if rows.max() >= info.max or rows.min() < info.min:
        from pim_sort_merge_join_tpu.engine.errors import MalformedInputError

        raise MalformedInputError(
            f"{name}: table values outside [{info.min}, {info.max}) -- "
            "narrow_data=True requires every value to fit int32; disable it "
            "for this data"
        )


def check_table(table: Table, *, sorted_by: int | None = None) -> None:
    """Validate structural invariants of a Table (host-side, forces sync)."""
    n = int(jax.device_get(table.num_rows))
    if not (0 <= n <= table.capacity):
        raise ValidationError(
            f"num_rows {n} outside [0, capacity {table.capacity}]"
        )
    if table.names and len(table.names) != table.ncol:
        raise ValidationError(
            f"{len(table.names)} names for {table.ncol} columns"
        )
    if sorted_by is not None and n > 1:
        col = np.asarray(jax.device_get(table.data))[:n, sorted_by]
        if not (np.diff(col) >= 0).all():
            bad = int(np.argmin(np.diff(col) >= 0))
            raise ValidationError(
                f"column {sorted_by} not sorted ascending at row {bad}: "
                f"{col[bad]} > {col[bad + 1]}"
            )


def check_sharded_table(st) -> None:
    """Validate a ShardedTable's per-shard counts against capacities."""
    counts = np.asarray(jax.device_get(st.counts))
    p = counts.shape[0]
    shard_cap = st.data.shape[0] // p
    bad = np.nonzero((counts < 0) | (counts > shard_cap))[0]
    if bad.size:
        raise ValidationError(
            f"shards {bad.tolist()} have counts outside [0, {shard_cap}]: "
            f"{counts[bad].tolist()}"
        )


def check_deterministic(fn, *args, reps: int = 2) -> None:
    """Run a pipeline twice; identical bytes out or raise.

    The engine's data-race detector analog: all parallelism is inside XLA,
    so any nondeterminism (unordered scatter collisions, exchange ordering)
    surfaces as byte differences between identical runs.
    """
    first = jax.device_get(jax.block_until_ready(fn(*args)))
    for _ in range(reps - 1):
        again = jax.device_get(jax.block_until_ready(fn(*args)))
        flat1 = jax.tree_util.tree_leaves(first)
        flat2 = jax.tree_util.tree_leaves(again)
        for a, b in zip(flat1, flat2):
            if not np.array_equal(np.asarray(a), np.asarray(b)):
                raise ValidationError("nondeterministic pipeline output")
