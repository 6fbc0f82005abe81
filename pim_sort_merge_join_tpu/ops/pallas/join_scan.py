"""Fused join-rank scan: the 1:1 join's whole scan block in two O(n) passes.

After the merge sort, `ops/join._one_to_one_merged` derives each element's
output slot from ~7 XLA scan ops (cumsum / cummax / reverse cummin) plus
elementwise glue -- measured ~45 ms of HBM passes at 20M elements on a v5e,
against a ~2 MB/ms traffic floor. This module computes the same `dest`
array with TWO Pallas passes over the merged (key, position) arrays:

  pass A (forward)  -- per tile: in-VMEM flat prefix sums/maxes compute the
      side-2 prefix count, run-head broadcasts, per-side ranks, witness
      matches and the witness prefix (m2cum); SMEM scalars carry the run
      state across the sequential grid. Side-2 elements finalize their slot
      (m2cum-1); side-1 elements emit a CANDIDATE slot, encoded as the
      bitwise complement (negative), because their match test needs their
      run's total witness count, which lies ahead of them:
      a side-1 candidate c matches iff c < (witnesses by its run's end).
  pass B (backward) -- walks tiles in reverse, computes each element's
      run-end witness count (a suffix-min of tail-gated m2cum, m2cum being
      nondecreasing), and resolves candidates: dest = c if c < end_m2 else
      drop.

The algebra is identical to the XLA block (see `_one_to_one_merged`); the
reference semantics trace to join.c:151-248 (count pass -> offsets -> emit).

Key encoding: 64-bit keys enter as two int32 planes whose lexicographic
signed order equals the key order (hbm_sort._decompose); the all-ones
sentinel (int64 max) maps to I32MAX on every plane, so liveness is a
plane-wise I32MAX test.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pim_sort_merge_join_tpu.ops.pallas.hbm_sort import _decompose

_LANES = 128
_I32MAX = np.int32(np.iinfo(np.int32).max)
_I32MIN = np.int32(np.iinfo(np.int32).min)

# Elements per grid tile. 2^16 x ~5 int32 planes = ~1.3 MB of VMEM blocks
# per step -- small enough to double-buffer, large enough to amortize the
# ~17-step in-tile prefix networks.
_TILE = 1 << 16


def _iotas(rows):
    lane_ix = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
    row_ix = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0)
    return lane_ix, row_ix


def _prefix_combine(x, lane_ix, row_ix, op, fill):
    """Inclusive prefix of ``op`` over the FLAT row-major order of [R,128].

    Hillis-Steele along lanes (7 steps), a native cross-lane reduction for
    row totals, then Hillis-Steele along sublanes (log2 R steps).
    """
    rows = x.shape[0]
    if op == "add":
        combine = lambda a, b: a + b
        # dtype pinned: under x64 jnp.sum widens int32 to an int64
        # accumulator, which Mosaic cannot lower.
        reduce_rows = lambda v: jnp.sum(
            v, axis=1, keepdims=True, dtype=jnp.int32
        )
    else:
        combine = jnp.maximum
        reduce_rows = lambda v: jnp.max(v, axis=1, keepdims=True)
    totals = reduce_rows(x)  # [R, 1] per-row total
    lane = x
    d = 1
    while d < _LANES:
        sh = pltpu.roll(lane, jnp.int32(d), 1)
        lane = combine(lane, jnp.where(lane_ix >= d, sh, fill))
        d *= 2
    # Inclusive prefix of row totals, broadcast over lanes.
    rp = jnp.broadcast_to(totals, (rows, _LANES))
    d = 1
    while d < rows:
        sh = pltpu.roll(rp, jnp.int32(d), 0)
        rp = combine(rp, jnp.where(row_ix >= d, sh, fill))
        d *= 2
    # Exclusive row offset: the inclusive row prefix shifted down one row.
    excl = pltpu.roll(rp, jnp.int32(1), 0)
    excl = jnp.where(row_ix >= 1, excl, fill)
    return combine(lane, excl)


def _suffix_min(x, lane_ix, row_ix):
    """Inclusive suffix MIN over the flat order of [R,128] (fill +I32MAX)."""
    rows = x.shape[0]
    fill = _I32MAX
    totals = jnp.min(x, axis=1, keepdims=True)
    lane = x
    d = 1
    while d < _LANES:
        sh = pltpu.roll(lane, jnp.int32(_LANES - d), 1)  # sh[l] = x[l+d]
        lane = jnp.minimum(lane, jnp.where(lane_ix < _LANES - d, sh, fill))
        d *= 2
    rp = jnp.broadcast_to(totals, (rows, _LANES))
    d = 1
    while d < rows:
        sh = pltpu.roll(rp, jnp.int32(rows - d), 0)
        rp = jnp.minimum(rp, jnp.where(row_ix < rows - d, sh, fill))
        d *= 2
    excl = pltpu.roll(rp, jnp.int32(rows - 1), 0)  # row r+1's suffix
    excl = jnp.where(row_ix < rows - 1, excl, fill)
    return jnp.minimum(lane, excl)


def _prev_flat(x, lane_ix, row_ix, boundary):
    """x shifted one position UP in flat order; position 0 gets ``boundary``."""
    p = pltpu.roll(x, jnp.int32(1), 1)  # p[r, l] = x[r, l-1]
    q = pltpu.roll(p, jnp.int32(1), 0)  # q[r, l] = x[r-1, l-1] = row above's wrap
    out = jnp.where(lane_ix == 0, q, p)
    return jnp.where((lane_ix == 0) & (row_ix == 0), boundary, out)


def _next_flat(x, lane_ix, row_ix, boundary):
    """x shifted one position DOWN in flat order; the last slot gets boundary."""
    rows = x.shape[0]
    p = pltpu.roll(x, jnp.int32(_LANES - 1), 1)  # p[r, l] = x[r, l+1]
    q = pltpu.roll(p, jnp.int32(rows - 1), 0)  # q[r, l] = x[r+1, l+1]
    out = jnp.where(lane_ix == _LANES - 1, q, p)
    return jnp.where(
        (lane_ix == _LANES - 1) & (row_ix == rows - 1), boundary, out
    )


def _forward_kernel(
    *refs, nkeys: int, cap1: int, big: int, rows_pt: int, ntiles: int
):
    key_refs = refs[:nkeys]
    mpos_ref = refs[nkeys]
    cand_ref = refs[nkeys + 1]
    m2_ref = refs[nkeys + 2]
    carry = refs[nkeys + 3]  # SMEM [4 + nkeys]: c2, base2, run_start, m2 | prev key planes

    i = pl.program_id(0)
    lane_ix, row_ix = _iotas(rows_pt)
    base = i * jnp.int32(rows_pt * _LANES)
    gidx = base + row_ix * _LANES + lane_ix

    @pl.when(i == 0)
    def _():
        carry[0] = jnp.int32(0)  # c2 so far
        carry[1] = jnp.int32(0)  # base2 of current run
        carry[2] = jnp.int32(0)  # run_start of current run
        carry[3] = jnp.int32(0)  # m2cum so far
        for p in range(nkeys):
            carry[4 + p] = jnp.int32(0)

    keys = [key_refs[p][...] for p in range(nkeys)]
    mpos = mpos_ref[...]

    # head: key differs from the previous element's key (lexicographic on
    # planes => differs on ANY plane); global element 0 is always a head.
    diff = None
    for p in range(nkeys):
        prevp = _prev_flat(keys[p], lane_ix, row_ix, carry[4 + p])
        d = keys[p] != prevp
        diff = d if diff is None else (diff | d)
    first = (gidx == 0) & (i == 0)
    head = diff | first

    is2 = (mpos >= cap1).astype(jnp.int32)
    c2 = carry[0] + _prefix_combine(is2, lane_ix, row_ix, "add", jnp.int32(0))
    base2 = jnp.maximum(
        _prefix_combine(
            jnp.where(head, c2 - is2, _I32MIN), lane_ix, row_ix, "max", _I32MIN
        ),
        carry[1],
    )
    run_start = jnp.maximum(
        _prefix_combine(
            jnp.where(head, gidx, _I32MIN), lane_ix, row_ix, "max", _I32MIN
        ),
        carry[2],
    )
    jr = gidx - run_start
    s2r = c2 - base2
    rank = jnp.where(is2 == 1, s2r - 1, jr)
    live = None
    for p in range(nkeys):
        lv = keys[p] != _I32MAX
        live = lv if live is None else (live | lv)
    matched2 = (is2 == 1) & (rank < (jr + 1 - s2r)) & live
    m2cum = carry[3] + _prefix_combine(
        matched2.astype(jnp.int32), lane_ix, row_ix, "add", jnp.int32(0)
    )
    cand1 = m2cum + rank
    cand_ref[...] = jnp.where(
        matched2,
        m2cum - 1,
        jnp.where((is2 == 0) & live, ~cand1, jnp.int32(big)),
    )
    m2_ref[...] = m2cum

    # Carry out: state at the tile's last flat element.
    last = (rows_pt - 1, _LANES - 1)
    carry[0] = c2[last]
    carry[1] = base2[last]
    carry[2] = run_start[last]
    carry[3] = m2cum[last]
    for p in range(nkeys):
        carry[4 + p] = keys[p][last]


def _backward_kernel(
    *refs, nkeys: int, big: int, rows_pt: int, ntiles: int
):
    key_refs = refs[:nkeys]
    cand_ref = refs[nkeys]
    m2_ref = refs[nkeys + 1]
    dest_ref = refs[nkeys + 2]
    carry = refs[nkeys + 3]  # SMEM [1 + nkeys]: em | next key planes

    i = pl.program_id(0)  # processes array tile ntiles-1-i (via index maps)
    lane_ix, row_ix = _iotas(rows_pt)

    @pl.when(i == 0)
    def _():
        carry[0] = _I32MAX  # em: nearest run-end witness count after tile
        for p in range(nkeys):
            # No element follows the last one; any value works because the
            # last element is forced to be a tail below.
            carry[1 + p] = _I32MAX

    keys = [key_refs[p][...] for p in range(nkeys)]
    m2cum = m2_ref[...]
    cand = cand_ref[...]

    diff = None
    for p in range(nkeys):
        nxtp = _next_flat(keys[p], lane_ix, row_ix, carry[1 + p])
        d = keys[p] != nxtp
        diff = d if diff is None else (diff | d)
    last_elem = (
        (i == 0)
        & (lane_ix == _LANES - 1)
        & (row_ix == rows_pt - 1)
    )
    tail = diff | last_elem

    # Nearest tail at/after me carries my run's total witness count; m2cum
    # is nondecreasing, so suffix-MIN of tail-gated values finds it.
    end_m2 = jnp.minimum(
        _suffix_min(
            jnp.where(tail, m2cum, _I32MAX), lane_ix, row_ix
        ),
        carry[0],
    )
    is_cand = cand < 0
    c = ~cand
    dest_ref[...] = jnp.where(
        is_cand, jnp.where(c < end_m2, c, jnp.int32(big)), cand
    )

    carry[0] = end_m2[0, 0]
    for p in range(nkeys):
        carry[1 + p] = keys[p][0, 0]


def join_scan_dest(
    mkeys: jax.Array,
    mpos: jax.Array,
    cap1: int,
    *,
    interpret: bool = False,
    tile: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """(dest, num_out) for the merged-domain 1:1 join.

    ``mkeys``/``mpos``: the merge sort's outputs (keys ascending, t1-first
    on ties; mpos the concat position). Drop slots get dest == len(mkeys).
    Semantically identical to the XLA scan block in
    `ops/join._one_to_one_merged` (pinned by tests/test_join_scan.py).
    """
    n = mkeys.shape[0]
    big = n
    planes, _ = _decompose(mkeys)
    nkeys = len(planes)
    tile = _TILE if tile is None else tile
    rows_pt = tile // _LANES
    n2 = max(-(-n // tile) * tile, tile)
    pad = n2 - n
    if pad:
        planes = [
            jnp.concatenate([p, jnp.full((pad,), _I32MAX, jnp.int32)])
            for p in planes
        ]
        mpos = jnp.concatenate(
            [mpos, jnp.full((pad,), jnp.int32(big))]
        )
    rows = n2 // _LANES
    ntiles = rows // rows_pt
    planes2d = [p.reshape(rows, _LANES) for p in planes]
    mpos2d = mpos.reshape(rows, _LANES)

    # Index-map zeros derive from i (i * 0): a literal 0 weak-types to i64
    # under x64, which Mosaic rejects.
    block = lambda: pl.BlockSpec((rows_pt, _LANES), lambda i: (i, i * 0))
    fwd = pl.pallas_call(
        functools.partial(
            _forward_kernel,
            nkeys=nkeys,
            cap1=cap1,
            big=big,
            rows_pt=rows_pt,
            ntiles=ntiles,
        ),
        grid=(ntiles,),
        in_specs=[block() for _ in range(nkeys + 1)],
        out_specs=[block(), block()],
        out_shape=[
            jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((4 + nkeys,), jnp.int32)],
        interpret=interpret,
    )
    cand, m2 = fwd(*planes2d, mpos2d)

    rblock = lambda: pl.BlockSpec(
        (rows_pt, _LANES), lambda i, nt=ntiles: (nt - 1 - i, i * 0)
    )
    bwd = pl.pallas_call(
        functools.partial(
            _backward_kernel,
            nkeys=nkeys,
            big=big,
            rows_pt=rows_pt,
            ntiles=ntiles,
        ),
        grid=(ntiles,),
        in_specs=[rblock() for _ in range(nkeys + 2)],
        out_specs=rblock(),
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1 + nkeys,), jnp.int32)],
        interpret=interpret,
    )
    dest = bwd(*planes2d, cand, m2)

    dest_flat = dest.reshape(n2)[:n]
    # Padding slots (key sentinel) are dead by construction; clamp any
    # padded-region artifacts away by construction of the slice above.
    num_out = m2.reshape(n2)[n - 1]
    return dest_flat, num_out
