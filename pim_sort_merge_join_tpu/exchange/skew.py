"""Skew-aware repartitioning: heavy-hitter detection and rank co-partitioning.

BASELINE config 4 (Zipf-skewed keys). Range partitioning sends all rows of
one key to one shard -- required for join co-location, catastrophic when one
key is a large fraction of the table (the shard overflows its exchange
capacity; engine/errors.ExchangeOverflowError). The reference has no analog:
its stage-4 co-partitioning (app.c:585-633) splits table 1 by POSITION and
binary-searches table 2, so a heavy key simply lands in one DPU pair and
serializes there.

Mechanism here:

1. `detect_heavy_hitters` -- any key exceeding `heavy_hitter_fraction` of
   the pooled splitter sample (the sample every shard already computes for
   range splitters) is a heavy hitter; at most K = floor(1/fraction) exist.
   Detection is replicated: every shard derives the same key set from the
   same pooled sample.

2. Rank co-partitioning (`heavy_rank_destination`) -- heavy rows are routed
   by their key's GLOBAL occurrence rank, `dest = rank % P`, instead of by
   key range. The global rank is local rank + an all-gathered per-shard
   count prefix (one [P, K] int32 all_gather -- negligible traffic).

   For the reference's 1:1 join semantics this is exact, not approximate:
   the k-th occurrence of a key in table 1 pairs with the k-th occurrence
   in table 2 (join.c:160-173), so routing rank r of BOTH tables to shard
   r % P co-locates exactly the pairs that match, pairs them in the right
   order (exchange arrival order is source-shard-major = ascending rank),
   and spreads a heavy key's load across all P shards evenly.

   For `inner` joins (cross product on duplicates) rank pairing is not
   enough: table-1 heavy rows spread by rank while table-2's heavy rows are
   broadcast to every shard (`gather_heavy_side`) -- the classic
   broadcast-join fallback for heavy keys, sized by `heavy_capacity` with
   true-count overflow reporting.

Output-order note: a heavy key's output rows interleave across shards (rank
mod P), so the global equal-key block order differs from single-chip order
-- the documented duplicate-key tie-order caveat (engine/distributed.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pim_sort_merge_join_tpu.columnar.table import key_sentinel


def max_heavy_hitters(fraction: float, num_partitions: int) -> int:
    """Static bound on simultaneous heavy hitters (keys above ``fraction``)."""
    if fraction >= 1.0:
        return 0
    return max(1, min(int(1.0 / max(fraction, 1e-3)), 2 * num_partitions, 16))


def detect_heavy_hitters(
    samples: jax.Array, fraction: float, k_max: int
) -> jax.Array:
    """Keys exceeding ``fraction`` of the valid pooled sample.

    ``samples``: flat pooled key sample (sentinel entries invalid).
    Returns ``[k_max]`` ascending keys, sentinel-padded -- suitable for
    ``searchsorted`` membership tests. Detection is sample-based: a heavy
    key missed by the sample falls back to range routing, where the
    exchange's true-count overflow check still catches the imbalance.
    """
    s = jnp.sort(samples)
    sent = key_sentinel(s.dtype)
    nvalid = jnp.sum(s != sent).astype(jnp.float32)
    lo = jnp.searchsorted(s, s, side="left")
    hi = jnp.searchsorted(s, s, side="right")
    cnt = (hi - lo).astype(jnp.float32)
    iota = jnp.arange(s.shape[0], dtype=lo.dtype)
    heavy_head = (iota == lo) & (cnt > fraction * nvalid) & (s != sent)
    marked = jnp.where(heavy_head, s, sent)
    return jnp.sort(marked)[:k_max]


def mask_heavy_samples(samples: jax.Array, heavy_keys: jax.Array) -> jax.Array:
    """Sentinel-out sample entries of heavy keys before splitter selection,
    so the range splitters balance the REMAINING (non-heavy) rows."""
    idx = jnp.searchsorted(heavy_keys, samples, side="left")
    idx = jnp.minimum(idx, heavy_keys.shape[0] - 1)
    is_heavy = jnp.take(heavy_keys, idx) == samples
    return jnp.where(is_heavy, key_sentinel(samples.dtype), samples)


def heavy_slot_of(keys: jax.Array, heavy_keys: jax.Array, valid: jax.Array):
    """(is_heavy [n] bool, slot [n] int32 in [0, K)) membership test."""
    k_max = heavy_keys.shape[0]
    idx = jnp.searchsorted(heavy_keys, keys, side="left").astype(jnp.int32)
    safe = jnp.minimum(idx, k_max - 1)
    is_heavy = (jnp.take(heavy_keys, safe) == keys) & valid
    return is_heavy, safe


def heavy_rank_destination(
    is_heavy: jax.Array,
    slot: jax.Array,
    k_max: int,
    axis_name: str,
) -> jax.Array:
    """Global-occurrence-rank destinations for heavy rows (rank % P).

    Must run inside shard_map. Rows must be processed in local order (they
    are: is_heavy/slot follow the local buffer order), and shards gather
    counts in axis order, so global rank = sum of earlier shards' counts +
    local rank -- and exchange arrival order (source-shard-major) delivers
    each shard's heavy rows in ascending global rank, which the 1:1 join's
    occurrence pairing requires.
    """
    p = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    rank_local = jnp.zeros(is_heavy.shape, jnp.int32)
    cnt_local = []
    for k in range(k_max):
        mk = is_heavy & (slot == k)
        rank_local = rank_local + jnp.where(
            mk, jnp.cumsum(mk, dtype=jnp.int32) - 1, 0
        )
        cnt_local.append(jnp.sum(mk, dtype=jnp.int32))
    cnt_local = jnp.stack(cnt_local)  # [K]
    all_counts = jax.lax.all_gather(cnt_local, axis_name)  # [P, K]
    shard_ix = jnp.arange(p, dtype=jnp.int32)[:, None]
    offsets = jnp.sum(
        jnp.where(shard_ix < me, all_counts, 0), axis=0, dtype=jnp.int32
    )  # [K]
    rank = rank_local + jnp.take(offsets, slot)
    return jax.lax.rem(rank, jnp.int32(p))


def gather_heavy_side(
    data: jax.Array,
    is_heavy: jax.Array,
    axis_name: str,
    *,
    capacity: int,
):
    """Broadcast this table's heavy rows to every shard (inner-join side).

    Compacts heavy rows to the front (stable sort -- rows ride the sort,
    no gathers), takes ``capacity`` of them, and all_gathers. Returns
    (rows [P*capacity, ncol], valid [P*capacity] bool, true_count int32 --
    overflow when true_count > capacity on any shard).
    """
    cap, ncol = data.shape
    order_key = jnp.where(is_heavy, jnp.int32(0), jnp.int32(1))
    packed = jax.lax.sort(
        (order_key,) + tuple(data[:, c] for c in range(ncol)),
        num_keys=1,
        is_stable=True,
    )
    rows = jnp.stack(packed[1:], axis=1)[:capacity]
    true_count = jnp.sum(is_heavy, dtype=jnp.int32)
    sent_count = jnp.minimum(true_count, capacity)
    g_rows = jax.lax.all_gather(rows, axis_name)  # [P, capacity, ncol]
    g_counts = jax.lax.all_gather(sent_count, axis_name)  # [P]
    p = g_rows.shape[0]
    flat = g_rows.reshape(p * capacity, ncol)
    off = jnp.arange(p * capacity, dtype=jnp.int32) % capacity
    src = jnp.arange(p * capacity, dtype=jnp.int32) // capacity
    valid = off < jnp.take(g_counts, src)
    return flat, valid, true_count
