"""Vectorized selection (filter) operator.

TPU-native re-design of the reference SELECT kernel (select.c): where the DPU
kernel scans 256-byte MRAM chunks per tasklet, computes an exclusive prefix
count through a serial tasklet handshake chain (select.c:42-61) and compacts
rows in place, this operator evaluates the predicate over the whole column
vector and compacts with a parallel prefix-sum scatter -- the same
count-then-place structure, expressed as data parallelism XLA maps onto the
VPU in one fused pass.

The reference's only predicate form is strictly-greater-than on one column
(select.c:31); we support the full comparison set (config.PredicateOp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pim_sort_merge_join_tpu.columnar.table import Table
from pim_sort_merge_join_tpu.config import Predicate

_OPS = {
    ">": jnp.greater,
    ">=": jnp.greater_equal,
    "<": jnp.less,
    "<=": jnp.less_equal,
    "==": jnp.equal,
    "!=": jnp.not_equal,
}


def predicate_mask(table: Table, pred: Predicate) -> jax.Array:
    """Boolean mask of valid rows satisfying the predicate."""
    value = jnp.asarray(pred.value, dtype=table.dtype)
    return table.valid_mask() & _OPS[pred.op](table.column(pred.col), value)


def compact(table: Table, mask: jax.Array) -> Table:
    """Stable-compact masked rows to the front; returns same-capacity table.

    Parallel equivalent of the reference's handshake prefix-count + dense
    write-back (select.c:149-156): position = exclusive prefix sum of the
    mask; unselected rows scatter out of range and are dropped.
    """
    cap = table.capacity
    count = jnp.sum(mask, dtype=jnp.int32)
    pos = jnp.where(mask, jnp.cumsum(mask, dtype=jnp.int32) - 1, cap)
    new_data = jnp.zeros_like(table.data).at[pos, :].set(table.data, mode="drop")
    return table.replace(data=new_data, num_rows=count)


def apply_filter(table: Table, pred: Predicate) -> Table:
    """SELECT rows satisfying ``pred``; compacted, row order preserved."""
    return compact(table, predicate_mask(table, pred))
