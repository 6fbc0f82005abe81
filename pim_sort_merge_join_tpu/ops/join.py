"""Sorted merge-join operators.

TPU-native re-design of the reference JOIN kernel (join.c): the DPU kernel
slices run 1 across tasklets, binary-searches run 2 for co-partition
boundaries (join.c:99-118), then does two passes -- count matches
(join.c:151-179), prefix offsets (:184-191), emit concatenated rows
(:205-248). This module keeps exactly that count-then-emit structure but
expresses both passes as whole-vector `searchsorted` + gather/scatter, which
XLA fuses into a handful of VPU passes; the per-tasklet cursor walk
disappears.

Two equality semantics:

- ``one_to_one`` -- the reference's semantics (join.c:160-173,
  cpu_app.c:213-217): on equal keys both cursors advance once, so the k-th
  duplicate of a key in table 1 pairs with the k-th duplicate in table 2 and
  a key with a copies left / b copies right yields min(a, b) rows, not a*b.
  Vectorized as occurrence-rank matching: row i of table 1 with occurrence
  rank r (its index within its equal-key run) matches iff r < (count of the
  key in table 2), partnering row ``lower_bound2 + r``.
- ``inner`` -- standard SQL inner-join cross product on duplicates.

Output schema: table1 columns ++ table2 columns minus its key column
(join.c:212-231); output rows follow table-1 key order.

Both tables must already be sorted ascending on their keys, with +inf
sentinel padding (see `ops/sort.py`). Keys equal to the sentinel value
(int64 max / +inf) in *valid* rows are not supported.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pim_sort_merge_join_tpu.columnar.table import Table


def _out_names(t1: Table, t2: Table, key2: int) -> tuple:
    ncol = t1.ncol + t2.ncol - 1
    return tuple(f"col{i + 1}" for i in range(ncol))


def _emit(
    t1: Table,
    t2: Table,
    key2: int,
    src1: jax.Array,
    src2: jax.Array,
    valid_out: jax.Array,
    num_out: jax.Array,
) -> Table:
    """Gather matched row pairs into the concatenated output table.

    ``src1[j]``/``src2[j]`` give the table-1/table-2 row feeding output row
    ``j``; ``valid_out`` masks live output slots (already front-compacted).
    """
    safe1 = jnp.where(valid_out, src1, 0)
    safe2 = jnp.where(valid_out, src2, 0)
    part1 = jnp.take(t1.data, safe1, axis=0)
    keep2 = [c for c in range(t2.ncol) if c != key2]
    part2 = jnp.take(t2.data[:, jnp.asarray(keep2)], safe2, axis=0)
    data = jnp.concatenate([part1, part2], axis=1)
    data = jnp.where(valid_out[:, None], data, jnp.zeros_like(data))
    return Table(
        data=data,
        num_rows=num_out.astype(jnp.int32),
        names=_out_names(t1, t2, key2),
    )


class _MatchInfo(NamedTuple):
    lo2: jax.Array  # lower bound of t1 key in t2 keys, per t1 row
    cnt2: jax.Array  # multiplicity of t1 key in t2, per t1 row
    occ: jax.Array  # occurrence rank of t1 row within its equal-key run


def _run_starts(keys: jax.Array) -> jax.Array:
    """For sorted ``keys``: index of the first element of each equal run.

    O(n) head-flag + running max -- replaces a self-searchsorted, which at
    16M int64 elements costs seconds in scan mode.
    """
    n = keys.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    head = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), keys[1:] != keys[:-1]]
    )
    return jax.lax.cummax(jnp.where(head, iota, 0))


def _match_info(t1: Table, t2: Table, key1: int, key2: int) -> _MatchInfo:
    k1 = t1.masked_keys(key1)
    k2 = t2.masked_keys(key2)
    # method='sort': rank-by-merge instead of per-query binary search --
    # sequential access, ~20x faster than the scan method at 16M int64.
    lo2 = jnp.searchsorted(k2, k1, side="left", method="sort").astype(jnp.int32)
    hi2 = jnp.searchsorted(k2, k1, side="right", method="sort").astype(jnp.int32)
    lo1 = _run_starts(k1)
    occ = jnp.arange(t1.capacity, dtype=jnp.int32) - lo1
    return _MatchInfo(lo2=lo2, cnt2=hi2 - lo2, occ=occ)


def merge_join_one_to_one(t1: Table, t2: Table, key1: int, key2: int) -> Table:
    """Reference-semantics 1:1 merge join of two sorted tables.

    Output capacity equals table 1's capacity (1:1 output rows <= n1).
    """
    info = _match_info(t1, t2, key1, key2)
    match = t1.valid_mask() & (info.occ < info.cnt2)
    num_out = jnp.sum(match, dtype=jnp.int32)
    cap1 = t1.capacity
    # Front-compact matched (row, partner) pairs, keeping table-1 order
    # (== key order): one stable sort on the inverted match flag.
    partner = info.lo2 + info.occ
    _, src1, src2 = jax.lax.sort(
        (
            (~match).astype(jnp.int8),
            jnp.arange(cap1, dtype=jnp.int32),
            partner,
        ),
        num_keys=1,
        is_stable=True,
    )
    valid_out = jnp.arange(cap1, dtype=jnp.int32) < num_out
    return _emit(t1, t2, key2, src1, src2, valid_out, num_out)


def merge_join_inner(
    t1: Table, t2: Table, key1: int, key2: int, *, out_capacity: int | None = None
) -> Table:
    """Standard inner join (full cross product on duplicate keys).

    ``out_capacity`` bounds the output (default: table 1 capacity); rows
    beyond it are dropped and the true count is still reported in
    ``num_rows`` so callers can detect overflow (num_rows > capacity).
    """
    info = _match_info(t1, t2, key1, key2)
    cnt = jnp.where(t1.valid_mask(), info.cnt2, 0)
    starts = jnp.cumsum(cnt, dtype=jnp.int32) - cnt  # exclusive prefix
    total = jnp.sum(cnt, dtype=jnp.int32)
    out_cap = t1.capacity if out_capacity is None else out_capacity
    j = jnp.arange(out_cap, dtype=jnp.int32)
    # Which t1 row does output slot j belong to? Last i with starts[i] <= j.
    src1 = (
        jnp.searchsorted(starts, j, side="right", method="sort").astype(jnp.int32)
        - 1
    ).clip(0, t1.capacity - 1)
    offset = j - jnp.take(starts, src1)
    src2 = jnp.take(info.lo2, src1) + offset
    valid_out = j < jnp.minimum(total, out_cap)
    # Slots whose src1 row produced zero matches are only reachable when
    # j >= total, i.e. already invalid.
    return _emit(t1, t2, key2, src1, src2, valid_out, total)


def merge_join(
    t1: Table,
    t2: Table,
    key1: int,
    key2: int,
    *,
    mode: str = "one_to_one",
    out_capacity: int | None = None,
) -> Table:
    if mode == "one_to_one":
        return merge_join_one_to_one(t1, t2, key1, key2)
    if mode == "inner":
        return merge_join_inner(t1, t2, key1, key2, out_capacity=out_capacity)
    raise ValueError(f"unknown join mode {mode!r}")
