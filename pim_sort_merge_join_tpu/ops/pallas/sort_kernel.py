"""Pallas bitonic sort over VMEM-resident (key, value) pairs.

The TPU-native replacement for the reference's per-DPU sort
(sort_dpu.c:157-187: O(n^2) insertion sort over MRAM rows, then a 4-round
tasklet merge tree, :251-323). A bitonic network is the natural fit for the
VPU: every compare-exchange substep is a reshape + elementwise min/max over
8x128 vectors, no gathers, and the whole log^2(n) schedule runs inside one
`pallas_call` with the data resident in VMEM -- HBM is touched exactly twice
(load in, store out), where the reference re-reads MRAM per comparison.

The compare-exchange uses the (i, i^j) pairing expressed as a reshape to
[n/2j, 2, j]: the two middle slices are the partner halves, and the sort
direction per outer block is ((block_index * 2j) & k) == 0 -- precomputable
as a broadcast sign vector, so each substep is pure VPU work.

Determinism/stability: keys are compared with a (key, value) lexicographic
tiebreak, so with value = original row index the result is exactly a stable
sort (bitonic networks are not otherwise stable).

Capacity constraints: n must be a power of two >= 256 (callers pad with the
+inf key sentinel; `sort_pairs_pallas` handles padding internally). Keys and
values are int32 in-kernel: the engine routes here when the key dtype fits
(`EngineConfig.sort_algorithm == "pallas_bitonic"`), falling back to XLA's
sort otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _substeps(n: int):
    """The (k, j) schedule of a bitonic sort network of width n."""
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            yield k, j
            j //= 2
        k *= 2


def _compare_exchange(keys, vals, n: int, k: int, j: int):
    """One bitonic substep on flat [n] key/val arrays (pure VPU ops)."""
    m = n // (2 * j)
    ka = keys.reshape(m, 2, j)
    va = vals.reshape(m, 2, j)
    lo_k, hi_k = ka[:, 0, :], ka[:, 1, :]
    lo_v, hi_v = va[:, 0, :], va[:, 1, :]
    # Ascending iff bit log2(k) of the global element index is 0; constant
    # within each outer block because 2j <= k.
    blk = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    up = ((blk * (2 * j)) & k) == 0
    # Lexicographic (key, value) comparison for stability.
    gt = (lo_k > hi_k) | ((lo_k == hi_k) & (lo_v > hi_v))
    swap = jnp.where(up, gt, ~gt)
    new_lo_k = jnp.where(swap, hi_k, lo_k)
    new_hi_k = jnp.where(swap, lo_k, hi_k)
    new_lo_v = jnp.where(swap, hi_v, lo_v)
    new_hi_v = jnp.where(swap, lo_v, hi_v)
    keys = jnp.stack([new_lo_k, new_hi_k], axis=1).reshape(n)
    vals = jnp.stack([new_lo_v, new_hi_v], axis=1).reshape(n)
    return keys, vals


def bitonic_sort_xla(keys: jax.Array, vals: jax.Array):
    """Pure-XLA bitonic network (same schedule; oracle + CPU fallback)."""
    n = keys.shape[0]
    assert n & (n - 1) == 0, f"bitonic width must be a power of two, got {n}"
    for k, j in _substeps(n):
        keys, vals = _compare_exchange(keys, vals, n, k, j)
    return keys, vals


_LANES = 128


def _bit_mask(rows: int, lanes: int, bit: int):
    """((global_index & bit) == 0) as a [rows, lanes] bool, via iotas.

    Global index of element (r, l) is r * LANES + l, so bits < LANES live in
    the lane index and higher bits in the row index -- no reshapes needed.
    """
    if bit < lanes:
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
        return (lane & bit) == 0
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
    return (row & (bit // lanes)) == 0


def _partner(x, j: int, lanes: int):
    """Value at global index (i ^ j), via two static rotations + select.

    For j < LANES the partner differs in the lane index; otherwise in the
    row index. A rotation by +-j and a (index & j) parity select realize the
    XOR pairing without any gather or unsupported shape cast.
    """
    rows = x.shape[0]

    def _roll(v, shift, axis):
        # Shift as an explicit i32: under jax_enable_x64 a bare Python int
        # weak-types to i64, which tpu.dynamic_rotate rejects.
        return pltpu.roll(v, jnp.asarray(shift, jnp.int32), axis)

    if j < lanes:
        fwd = _roll(x, lanes - j, 1)  # out[l] = x[l + j]
        bwd = _roll(x, j, 1)          # out[l] = x[l - j]
        lo = _bit_mask(rows, lanes, j)
        return jnp.where(lo, fwd, bwd)
    jr = j // lanes
    fwd = _roll(x, rows - jr, 0)
    bwd = _roll(x, jr, 0)
    lo = _bit_mask(rows, lanes, j)
    return jnp.where(lo, fwd, bwd)


def _compare_exchange_2d(keys, vals, k: int, j: int, lanes: int):
    """One bitonic substep on [rows, lanes] arrays (rolls + VPU selects)."""
    rows = keys.shape[0]
    pk = _partner(keys, j, lanes)
    pv = _partner(vals, j, lanes)
    is_lo = _bit_mask(rows, lanes, j)
    up = _bit_mask(rows, lanes, k)
    # Lexicographic (key, val) order; val uniqueness makes pairs comparable
    # without an equality case.
    gt = (keys > pk) | ((keys == pk) & (vals > pv))
    take = gt == (is_lo == up)
    keys = jnp.where(take, pk, keys)
    vals = jnp.where(take, pv, vals)
    return keys, vals


def _sort_kernel(keys_ref, vals_ref, keys_out, vals_out, *, n: int):
    """Bitonic schedule as a while_loop with traced (k, j) substep state.

    Rotation distances and direction masks are computed from traced scalars
    (tpu.dynamic_rotate takes a dynamic shift), so Mosaic compiles ONE
    substep body instead of the ~log^2(n) unrolled network -- compile time
    drops from minutes to seconds at the cost of loop overhead that is
    negligible next to the per-substep VPU work.
    """
    rows, lanes = keys_ref.shape
    # All scalars pinned to i32: under jax_enable_x64 a Python-int operand
    # promotes to i64, which Mosaic cannot lower inside the kernel.
    lanes_c = jnp.int32(lanes)
    rows_c = jnp.int32(rows)
    n_c = jnp.int32(n)
    one = jnp.int32(1)
    two = jnp.int32(2)

    lane_ix = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    row_ix = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
    zero_v = jnp.zeros((rows, lanes), jnp.int32)

    def bit_clear(bit):
        # ((global_index & bit) == 0) for a traced power-of-two bit.
        # Select via i32 arithmetic, not jnp.where on bools: Mosaic cannot
        # legalize arith.select on i1 vectors.
        masked = jnp.where(bit < lanes_c, lane_ix & bit, row_ix & (bit // lanes_c))
        return masked == zero_v

    def substep(carry):
        k, j, keys, vals = carry
        is_lo = bit_clear(j)
        up = bit_clear(k)

        def lane_partner(x):
            fwd = pltpu.roll(x, lanes_c - j, 1)
            bwd = pltpu.roll(x, j, 1)
            return jnp.where(is_lo, fwd, bwd)

        def row_partner(x):
            jr = j // lanes_c
            fwd = pltpu.roll(x, rows_c - jr, 0)
            bwd = pltpu.roll(x, jr, 0)
            return jnp.where(is_lo, fwd, bwd)

        pk, pv = jax.lax.cond(
            j < lanes_c,
            lambda: (lane_partner(keys), lane_partner(vals)),
            lambda: (row_partner(keys), row_partner(vals)),
        )
        gt = (keys > pk) | ((keys == pk) & (vals > pv))
        # take = (gt == (is_lo == up)), expressed as XOR so no i1-vector
        # select/compare is needed.
        take = gt ^ is_lo ^ up
        keys = jnp.where(take, pk, keys)
        vals = jnp.where(take, pv, vals)

        # Next (k, j): halve j; when the inner loop ends, double k.
        j2 = j // two
        ended = j2 < one
        k_next = jnp.where(ended, k * two, k)
        j_next = jnp.where(ended, k, j2)  # new k's first j is (2k)/2 = k
        return (k_next, j_next, keys, vals)

    init = (two, one, keys_ref[:], vals_ref[:])
    _, _, keys, vals = jax.lax.while_loop(
        lambda c: c[0] <= n_c, substep, init
    )
    keys_out[:] = keys
    vals_out[:] = vals


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sort_pairs_pallas_p2(keys, vals, interpret=False):
    """Sort a power-of-two-length pair array with one pallas_call."""
    n = keys.shape[0]
    lanes = 128
    rows = max(n // lanes, 1)
    shape2d = (rows, lanes) if n >= lanes else (1, n)
    kernel = functools.partial(_sort_kernel, n=n)
    out_k, out_v = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(shape2d, keys.dtype),
            jax.ShapeDtypeStruct(shape2d, vals.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(keys.reshape(shape2d), vals.reshape(shape2d))
    return out_k.reshape(n), out_v.reshape(n)


# Above this width the VMEM-resident kernel exceeds on-chip memory
# (keys + vals + partner/roll temporaries). Larger inputs belong to the
# HBM-scale sort (`ops/pallas/hbm_sort.py`), which this entry point
# delegates to -- loudly, not silently (the round-1 silent XLA fallback is
# gone).
PALLAS_SORT_MAX = 1 << 21


def sort_pairs_pallas(keys: jax.Array, vals: jax.Array, *, interpret: bool = False):
    """Stable-sort (keys, vals) by (key, val) ascending; any length.

    Pads to the next power of two with the max-key sentinel; returns arrays
    of the original length. Inputs past the VMEM-resident cap run on the
    HBM-scale Pallas sort instead (one warning; same contract).
    """
    n = keys.shape[0]
    n2 = max(_next_pow2(n), 256)
    if n2 > PALLAS_SORT_MAX and not interpret:
        import warnings

        from pim_sort_merge_join_tpu.ops.pallas.hbm_sort import hbm_sort

        warnings.warn(
            f"sort_pairs_pallas: n={n} exceeds the VMEM-resident cap "
            f"({PALLAS_SORT_MAX}); running the HBM-scale Pallas sort "
            "(ops/pallas/hbm_sort.py) instead",
            stacklevel=2,
        )
        # (key, val) 2-key semantics: vals are unique in every engine call
        # site (an arange), and hbm_sort's synthetic arange plane makes the
        # sort stable, so sorting by key alone is equivalent.
        return hbm_sort((keys, vals))
    if n2 != n:
        pad_k = jnp.full((n2 - n,), jnp.iinfo(keys.dtype).max, dtype=keys.dtype)
        pad_v = jnp.full((n2 - n,), jnp.iinfo(vals.dtype).max, dtype=vals.dtype)
        keys = jnp.concatenate([keys, pad_k])
        vals = jnp.concatenate([vals, pad_v])
    out_k, out_v = _sort_pairs_pallas_p2(keys, vals, interpret=interpret)
    return out_k[:n], out_v[:n]
