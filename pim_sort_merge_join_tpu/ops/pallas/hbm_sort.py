"""HBM-scale multi-operand Pallas sort: chunk bitonic + merge-path merge passes.

The production TPU replacement for the reference's whole sort stage
(sort_dpu.c:157-187 per-tasklet insertion sort + :251-323 tasklet merge tree,
then the host-driven pairwise DPU merge tree, app.c:408-547). Where the
VMEM-resident kernel in `sort_kernel.py` caps at what fits on chip, this one
sorts arrays of any size out of HBM with O(n log n) *sequential* traffic:

  phase A  -- grid over VMEM-sized chunks; each chunk is bitonic-sorted on
              the VPU (keys + payload planes move together, no gathers).
              One HBM read + one HBM write of the whole array.
  phase B  -- ceil(log2(n/C)) merge passes. Each pass pairs adjacent sorted
              runs and merges them via *merge-path co-partitioning*: the
              output is cut into T-element tiles, a vectorized binary search
              (pure JAX, O(tiles * log L) work) finds for every tile the
              exact A/B input windows whose stable merge fills it, and a
              Pallas kernel DMAs those windows into VMEM, half-cleans
              A against reversed-B (one shift-free compare pass), bitonic-
              merges the surviving T-element min half, and writes the tile.
              One read + one write of the array per pass, all slices
              sequential.

This is the same co-partitioning idea as the reference's stage-4 binary
search split (app.c:585-633, merge_dpu.c:91-103), applied intra-chip.

Data model: every operand is decomposed into 32-bit "planes" (int64 -> hi +
lo words, floats -> order-preserving bit patterns), stacked as one
[planes, rows, 128] int32 array. The sort key is operands[0]; a synthetic
arange plane is appended as the final key plane, which (a) makes the sort
stable, (b) makes every element unique so compare-exchange needs no equality
path, and (c) keeps merge-path splits (computed with A-preference on key
ties) exactly consistent with the in-kernel lexicographic order, because a
left run's arange values are all smaller than its right partner's at every
pass.

Capacity: none (that is the point). VMEM use is bounded by construction:
chunk and tile sizes shrink as the plane count grows.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_I32MAX = np.int32(np.iinfo(np.int32).max)
_SIGN32 = np.int32(-(2**31))

# VMEM working-set budget per kernel invocation (bytes). The chunk kernel
# holds ~6 copies of a chunk (in + out double buffers + loop carries); the
# merge kernel ~10 copies of a tile. 16 MiB VMEM per core minus headroom.
_VMEM_BUDGET = 9 * 1024 * 1024


def _pow2_floor(x: int) -> int:
    return 1 << (int(x).bit_length() - 1)


def choose_sizes(num_planes: int) -> tuple[int, int]:
    """(chunk C, tile T) in elements for a given plane count.

    Divisors measured, not asserted: the round-5 chunk/tile sweep
    (bench/sort_tune.py, artifacts/sort_tune_r05.json; the CACHE_SIZE-sweep
    analog of the reference report's table 2) gridded {C/4..2C} x {T/4..2T}
    at 20M 2-plane elements. Optimum: chunk 262144 = 2x the former
    24-divisor value at tile 65536 (48.1 vs 50.2 ms); every smaller tile
    lost monotonically, larger tiles were flat. Chunk divisor 12 puts the
    auto point on the measured optimum (working set ~12.6 MB, fits VMEM
    at every plane count since the byte budget scales with 1/planes);
    tile divisor 40 already sat on it.
    """
    c = _pow2_floor(max(_VMEM_BUDGET // (12 * num_planes), 2 * _LANES))
    t = _pow2_floor(max(_VMEM_BUDGET // (40 * num_planes), 2 * _LANES))
    t = min(t, c)
    return c, t


# ---------------------------------------------------------------------------
# Operand <-> int32 plane conversion
# ---------------------------------------------------------------------------


# NOTE: the axon TPU client rewrites 64-bit element types into 32-bit pairs
# and cannot lower 64-bit `bitcast_convert_type`; all 64-bit decompositions
# below therefore use shifts/converts (which the rewrite pass supports) and
# bitcast only at 32-bit width.


def _u32_to_i32(x: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _i32_to_u32(x: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def _hi_lo_of_64(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(hi 32 bits as uint32, lo 32 bits as uint32) of an int64/uint64."""
    hi = (x >> 32).astype(jnp.uint32)  # arithmetic shift keeps the bit hi word
    lo = x.astype(jnp.uint32)  # converts mod 2^32: the low word
    return hi, lo


def _from_hi_lo_i64(hi_u: jax.Array, lo_u: jax.Array) -> jax.Array:
    return (hi_u.astype(jnp.int64) << 32) | lo_u.astype(jnp.int64)


def _float_monotone_u32(x: jax.Array) -> jax.Array:
    """float32 -> uint32 with the same total order (sign-flip map).

    NaNs sort above +inf (the engine never feeds NaNs)."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    sign = jnp.uint32(1) << 31
    return jnp.where((u & sign) != 0, ~u, u | sign)


def _float_from_monotone_u32(u: jax.Array) -> jax.Array:
    sign = jnp.uint32(1) << 31
    bits = jnp.where((u & sign) != 0, u & ~sign, ~u)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _f64_words(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(hi, lo) uint32 words of a float64's bit pattern, via 32-bit bitcast.

    64-bit bitcasts are unsupported on this client; bitcasting f64 -> u32
    yields a trailing [..., 2] axis of (lo, hi) little-endian words.
    """
    w = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return w[..., 1], w[..., 0]


def _f64_from_words(hi: jax.Array, lo: jax.Array) -> jax.Array:
    w = jnp.stack([lo, hi], axis=-1)
    return jax.lax.bitcast_convert_type(w, jnp.float64)


_BIAS = jnp.uint32(0x80000000)


def _decompose(x: jax.Array) -> tuple[list[jax.Array], tuple]:
    """Operand -> int32 planes whose lexicographic SIGNED order equals the
    operand's natural order. Returns (planes, recompose-tag)."""
    dt = x.dtype
    if dt == jnp.int32:
        return [x], ("i32",)
    if dt == jnp.uint32:
        return [_u32_to_i32(x ^ _BIAS)], ("u32",)
    if dt == jnp.float32:
        return [_u32_to_i32(_float_monotone_u32(x) ^ _BIAS)], ("f32",)
    if dt == jnp.int64:
        hi, lo = _hi_lo_of_64(x)
        # hi compares signed as-is; lo is unsigned -> bias into signed range.
        return [_u32_to_i32(hi), _u32_to_i32(lo ^ _BIAS)], ("i64",)
    if dt == jnp.uint64:
        hi, lo = _hi_lo_of_64(x)
        return [_u32_to_i32(hi ^ _BIAS), _u32_to_i32(lo ^ _BIAS)], ("u64",)
    if dt == jnp.float64:
        hi, lo = _f64_words(x)
        sign = jnp.uint32(1) << 31
        neg = (hi & sign) != 0
        mhi = jnp.where(neg, ~hi, hi | sign)
        mlo = jnp.where(neg, ~lo, lo)
        return [_u32_to_i32(mhi ^ _BIAS), _u32_to_i32(mlo ^ _BIAS)], ("f64",)
    raise NotImplementedError(f"hbm_sort: unsupported dtype {dt}")


def _recompose(planes: list[jax.Array], tag: tuple) -> jax.Array:
    kind = tag[0]
    if kind == "i32":
        return planes[0]
    if kind == "u32":
        return _i32_to_u32(planes[0]) ^ _BIAS
    if kind == "f32":
        return _float_from_monotone_u32(_i32_to_u32(planes[0]) ^ _BIAS)
    if kind == "i64":
        hi = _i32_to_u32(planes[0])
        lo = _i32_to_u32(planes[1]) ^ _BIAS
        return _from_hi_lo_i64(hi, lo)
    if kind == "u64":
        hi = _i32_to_u32(planes[0]) ^ _BIAS
        lo = _i32_to_u32(planes[1]) ^ _BIAS
        return (hi.astype(jnp.uint64) << 32) | lo.astype(jnp.uint64)
    if kind == "f64":
        mhi = _i32_to_u32(planes[0]) ^ _BIAS
        mlo = _i32_to_u32(planes[1]) ^ _BIAS
        sign = jnp.uint32(1) << 31
        neg = (mhi & sign) == 0  # monotone-mapped negatives have sign bit 0
        hi = jnp.where(neg, ~mhi, mhi & ~sign)
        lo = jnp.where(neg, ~mlo, mlo)
        return _f64_from_words(hi, lo)
    raise AssertionError(kind)


# ---------------------------------------------------------------------------
# In-kernel helpers (shared by the chunk-sort and merge kernels)
# ---------------------------------------------------------------------------


def _lex_gt(a_planes, b_planes, nkeys: int):
    """a > b over the first ``nkeys`` planes, lexicographic signed compare.

    The final key plane (the synthetic arange) is unique, so the result is
    never an undetermined tie.
    """
    gt = a_planes[nkeys - 1] > b_planes[nkeys - 1]
    for a, b in zip(reversed(a_planes[: nkeys - 1]), reversed(b_planes[: nkeys - 1])):
        gt = (a > b) | ((a == b) & gt)
    return gt


def _partner_static(x, j: int, is_lo):
    """Value at flat index (i ^ j) of a [rows, 128] plane; j compile-time.

    Static shifts lower to constant-amount lane/sublane rotations (cheap
    shuffles). Profiling showed traced shifts (tpu.dynamic_rotate's
    generic path) cost ~5x overall; every schedule here is static, so all
    kernels unroll their substeps instead of looping with traced (k, j).
    """
    rows, lanes = x.shape
    if j < lanes:
        fwd = pltpu.roll(x, jnp.int32(lanes - j), 1)
        bwd = pltpu.roll(x, jnp.int32(j), 1)
    else:
        jr = j // lanes
        fwd = pltpu.roll(x, jnp.int32(rows - jr), 0)
        bwd = pltpu.roll(x, jnp.int32(jr), 0)
    return jnp.where(is_lo, fwd, bwd)


def _bit_clear_static(lane_ix, row_ix, bit: int, lanes: int):
    """((flat index & bit) == 0) for a compile-time power-of-two ``bit``."""
    if bit < lanes:
        return (lane_ix & bit) == 0
    return (row_ix & (bit // lanes)) == 0


def _substep_static(planes, nkeys: int, j: int, up, lane_ix, row_ix, lanes: int):
    """One static compare-exchange (i, i^j) over a tuple of planes.

    ``up`` is the ascending-direction mask (bool array or True)."""
    is_lo = _bit_clear_static(lane_ix, row_ix, j, lanes)
    partners = tuple(_partner_static(p, j, is_lo) for p in planes)
    gt = _lex_gt(planes, partners, nkeys)
    take = gt ^ is_lo ^ up
    return tuple(jnp.where(take, q, p) for p, q in zip(planes, partners))


def _flip_flat(x):
    """Reverse a [rows, 128] plane in flat order via static partner swaps.

    out[i] = x[n-1-i]: XOR with (n-1) composes one roll-exchange per index
    bit. Mosaic has no general reverse; each static-shift roll is a cheap
    lane/sublane rotation.
    """
    rows, lanes = x.shape
    lane_ix = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    row_ix = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
    b = 1
    while b < rows * lanes:
        if b < lanes:
            fwd = pltpu.roll(x, jnp.int32(lanes - b), 1)
            bwd = pltpu.roll(x, jnp.int32(b), 1)
            is_lo = (lane_ix & b) == 0
        else:
            br = b // lanes
            fwd = pltpu.roll(x, jnp.int32(rows - br), 0)
            bwd = pltpu.roll(x, jnp.int32(br), 0)
            is_lo = (row_ix & br) == 0
        x = jnp.where(is_lo, fwd, bwd)
        b *= 2
    return x


# ---------------------------------------------------------------------------
# Phase A: chunk-local bitonic sort (grid over chunks, auto-pipelined)
# ---------------------------------------------------------------------------


def _chunk_sort_kernel(in_ref, out_ref, *, chunk: int, nkeys: int):
    """Fully-unrolled bitonic sort of one chunk (static shifts throughout)."""
    nplanes, rows, lanes = in_ref.shape
    lane_ix = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    row_ix = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
    planes = tuple(in_ref[p] for p in range(nplanes))
    k = 2
    while k <= chunk:
        up = _bit_clear_static(lane_ix, row_ix, k, lanes)
        j = k // 2
        while j >= 1:
            planes = _substep_static(
                planes, nkeys, j, up, lane_ix, row_ix, lanes
            )
            j //= 2
        k *= 2
    for p in range(nplanes):
        out_ref[p] = planes[p]


def _chunk_sort(x: jax.Array, *, chunk: int, nkeys: int, out_rows: int, interpret: bool):
    """Sort each C-element chunk of [P, rows, 128] planes; output has
    ``out_rows`` rows (>= input rows; the tail is scratch for merge DMA)."""
    nplanes, rows, lanes = x.shape
    crows = chunk // lanes
    nchunks = rows // crows
    kernel = functools.partial(_chunk_sort_kernel, chunk=chunk, nkeys=nkeys)
    # Index-map zeros derive from i (i * 0): a literal 0 weak-types to i64
    # under x64, which Mosaic rejects.
    return pl.pallas_call(
        kernel,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec(
                (nplanes, crows, lanes),
                lambda i: (i * 0, i, i * 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (nplanes, crows, lanes),
            lambda i: (i * 0, i, i * 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nplanes, out_rows, lanes), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x)


# ---------------------------------------------------------------------------
# Phase B: merge-path co-partitioned merge pass
# ---------------------------------------------------------------------------


def _pass_tiles(runs: list[tuple[int, int]], tile: int):
    """Static tile table for one merge pass.

    Returns (tiles, new_runs): tiles is a list of
    (a_start, a_len_run, b_start, b_len_run, d0) element offsets; output
    tile i covers global rows [i*T, (i+1)*T).
    """
    tiles = []
    new_runs = []
    i = 0
    while i < len(runs):
        if i + 1 < len(runs):
            (sa, la), (sb, lb) = runs[i], runs[i + 1]
            assert sb == sa + la
            for t in range((la + lb) // tile):
                tiles.append((sa, la, sb, lb, t * tile))
            new_runs.append((sa, la + lb))
            i += 2
        else:
            sa, la = runs[i]
            for t in range(la // tile):
                tiles.append((sa, la, sa + la, 0, t * tile))
            new_runs.append((sa, la))
            i += 1
    return tiles, new_runs


def _key_le(planes, nkeys_user: int, ai, bi):
    """A[ai] <= B[bi] on the user key planes (A-preference on full ties)."""
    le = None
    for p in range(nkeys_user - 1, -1, -1):
        pa = planes[p][ai // _LANES, ai % _LANES]
        pb = planes[p][bi // _LANES, bi % _LANES]
        if le is None:
            le = pa <= pb
        else:
            le = (pa < pb) | ((pa == pb) & le)
    return le


def _merge_path_meta(x, tiles, tile: int, nkeys_user: int):
    """Vectorized merge-path binary search -> per-tile DMA metadata.

    Returns six int32 [ntiles] arrays:
    (a_row0, a_off, a_len, b_row0, b_off, b_len).
    """
    sa = jnp.asarray([t[0] for t in tiles], jnp.int32)
    la = jnp.asarray([t[1] for t in tiles], jnp.int32)
    sb = jnp.asarray([t[2] for t in tiles], jnp.int32)
    lb = jnp.asarray([t[3] for t in tiles], jnp.int32)
    d0 = jnp.asarray([t[4] for t in tiles], jnp.int32)
    max_l = max((t[1] for t in tiles), default=1)
    iters = max(int(math.ceil(math.log2(max_l + 1))) + 1, 1)

    planes = [x[p] for p in range(nkeys_user)]

    lo = jnp.maximum(jnp.int32(0), d0 - lb)
    hi = jnp.minimum(d0, la)

    def step(_, lh):
        lo, hi = lh
        mid = (lo + hi) // 2
        # A[mid] <= B[d0 - mid - 1]  (indices valid within the search range)
        cond = _key_le(planes, nkeys_user, sa + mid, sb + (d0 - mid - 1))
        active = lo < hi
        lo2 = jnp.where(active & cond, mid + 1, lo)
        hi2 = jnp.where(active & ~cond, mid, hi)
        return (lo2, hi2)

    a0, _ = jax.lax.fori_loop(0, iters, step, (lo, hi))

    # a_len: a-offset at the next diagonal. Tiles of one pair are adjacent,
    # so the next tile's a0 is this tile's end; a pair's last tile ends at
    # la. Detect pair-last statically.
    is_last = jnp.asarray(
        [
            (i + 1 >= len(tiles))
            or (tiles[i + 1][0] != t[0])
            or (tiles[i + 1][4] == 0)
            for i, t in enumerate(tiles)
        ],
        bool,
    )
    a_next = jnp.where(is_last, la, jnp.roll(a0, -1))
    a_len = a_next - a0
    b_off = d0 - a0
    a_g = sa + a0
    b_g = sb + b_off
    return (
        a_g // _LANES,
        a_g % _LANES,
        a_len,
        b_g // _LANES,
        b_g % _LANES,
        jnp.int32(tile) - a_len,
    )


def _shift_mask(buf, off, length, trows: int, *, is_key: bool):
    """Align a [W, 128] window to its element offset and sentinel-mask.

    out flat f = buf flat (f + off) for f < trows*128; slots >= length get
    INT32_MAX when ``is_key`` so they sort after every real element.
    """
    wrows, lanes = buf.shape
    lanes_c = jnp.int32(lanes)
    # off may be 0: keep the rotate amount in [0, lanes).
    lr = pltpu.roll(buf, jax.lax.rem(lanes_c - off, lanes_c), 1)
    ru = pltpu.roll(lr, jnp.int32(wrows - 1), 0)
    lane_ix = jax.lax.broadcasted_iota(jnp.int32, (wrows, lanes), 1)
    z = jnp.where(lane_ix < lanes_c - off, lr, ru)[:trows]
    if not is_key:
        return z
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (trows, lanes), 0) * lanes
        + jax.lax.broadcasted_iota(jnp.int32, (trows, lanes), 1)
    )
    return jnp.where(flat < length, z, _I32MAX)


def _merge_kernel(
    a_row0_ref,
    a_off_ref,
    a_len_ref,
    b_row0_ref,
    b_off_ref,
    b_len_ref,
    in_hbm,
    out_ref,
    abuf,
    bbuf,
    sems,
    *,
    nplanes: int,
    trows: int,
    wrows: int,
    nkeys: int,
    ntiles: int,
    tile: int,
):
    i = pl.program_id(0)
    two = jnp.int32(2)
    slot = jax.lax.rem(i, two)
    nxt = jax.lax.rem(i + jnp.int32(1), two)

    def dma(idx, s):
        # Indices pinned to i32: under x64 a Python-int index weak-types to
        # i64, which tpu.memref_slice rejects.
        return (
            pltpu.make_async_copy(
                in_hbm.at[:, pl.ds(a_row0_ref[idx], wrows), :],
                abuf.at[s],
                sems.at[s, jnp.int32(0)],
            ),
            pltpu.make_async_copy(
                in_hbm.at[:, pl.ds(b_row0_ref[idx], wrows), :],
                bbuf.at[s],
                sems.at[s, jnp.int32(1)],
            ),
        )

    zero = jnp.int32(0)

    @pl.when(i == 0)
    def _():
        da, db = dma(zero, zero)
        da.start()
        db.start()

    @pl.when(i + 1 < ntiles)
    def _():
        da, db = dma(i + 1, nxt)
        da.start()
        db.start()

    da, db = dma(i, slot)
    da.wait()
    db.wait()

    a_off = a_off_ref[i]
    b_off = b_off_ref[i]
    a_len = a_len_ref[i]
    b_len = b_len_ref[i]

    lane_ix = jax.lax.broadcasted_iota(jnp.int32, (trows, _LANES), 1)
    row_ix = jax.lax.broadcasted_iota(jnp.int32, (trows, _LANES), 0)

    # [A ascending; B reversed] is bitonic of length 2T, but only the T
    # smallest elements fill this tile -- so the 2T-wide work collapses:
    # the merge's FIRST stage compares flat index i with i+T, i.e. A-part
    # element i with reversed-B element i, elementwise with no shifts, and
    # by Batcher's half-cleaner property its min half (a) contains exactly
    # the T smallest and (b) is itself bitonic. The remaining log2(T)
    # stages then run on T rows instead of 2T: ~2x less VPU work per pass
    # than merging the full 2T and discarding the top half.
    a_planes = []
    b_planes = []
    for p in range(nplanes):
        is_key = p < nkeys
        a_planes.append(
            _shift_mask(abuf[slot, p], a_off, a_len, trows, is_key=is_key)
        )
        b_planes.append(
            _flip_flat(
                _shift_mask(bbuf[slot, p], b_off, b_len, trows, is_key=is_key)
            )
        )
    gt = _lex_gt(a_planes, b_planes, nkeys)
    planes = tuple(
        jnp.where(gt, b, a) for a, b in zip(a_planes, b_planes)
    )

    # Ascending bitonic merge of the min half, fully unrolled, static shifts.
    j = tile // 2
    while j >= 1:
        planes = _substep_static(
            planes, nkeys, j, True, lane_ix, row_ix, _LANES
        )
        j //= 2
    for p in range(nplanes):
        out_ref[p] = planes[p]


def _merge_pass(
    x: jax.Array,
    meta: tuple,
    *,
    tile: int,
    nkeys: int,
    out_rows: int,
    interpret: bool,
):
    nplanes, rows, lanes = x.shape
    trows = tile // lanes
    wrows = trows + 1
    ntiles = int(meta[0].shape[0])
    kernel = functools.partial(
        _merge_kernel,
        nplanes=nplanes,
        trows=trows,
        wrows=wrows,
        nkeys=nkeys,
        ntiles=ntiles,
        tile=tile,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (nplanes, trows, lanes),
            lambda i, *_: (i * 0, i, i * 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, nplanes, wrows, lanes), jnp.int32),
            pltpu.VMEM((2, nplanes, wrows, lanes), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nplanes, out_rows, lanes), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*meta, x)


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------


def hbm_sort(
    operands: tuple[jax.Array, ...] | list[jax.Array],
    *,
    interpret: bool = False,
    chunk: int | None = None,
    tile: int | None = None,
    num_keys: int = 1,
    unique_keys: bool = False,
) -> tuple[jax.Array, ...]:
    """Stable-sort 1D ``operands`` ascending by ``operands[:num_keys]``.

    Drop-in for ``jax.lax.sort(ops, num_keys=num_keys, is_stable=True)`` on
    int32 / uint32 / int64 / uint64 / float32 / float64 operands of any
    common length. Float keys use IEEE TOTAL order: -0.0 sorts strictly
    before +0.0 (lax.sort treats them as equal ties), and NaN keys are
    unsupported (they sort above +inf).

    ``unique_keys=True`` asserts (unchecked) that the joint key tuple is
    unique across elements AND never equals the all-INT32-MAX plane tuple
    (the kernel's DMA-scratch sentinel). The synthetic arange tie-break
    plane is then skipped -- one plane less of HBM traffic on every pass,
    the single largest lever on 1-2 plane sorts (bench r4: 3-plane 61.2 ms
    -> 2-plane ~41 ms at 20M). The join's internal sorts qualify: mpos is a
    permutation, (key, pos) pairs are unique, dest slots are uniquified.
    Stability is vacuous for unique keys.

    ``chunk``/``tile`` override the VMEM sizing heuristics (powers of two,
    tile <= chunk); used by tests to exercise multi-pass merging at small n.
    """
    operands = tuple(operands)
    n = operands[0].shape[0]
    if any(o.shape != (n,) for o in operands):
        raise ValueError("hbm_sort operands must be 1D of equal length")
    if not 1 <= num_keys <= len(operands):
        raise ValueError(f"num_keys={num_keys} out of range")
    if n == 0:
        return operands

    planes: list[jax.Array] = []
    tags = []
    for op in operands[:num_keys]:
        kp, key_tag = _decompose(op)
        planes.extend(kp)
        tags.append((key_tag, len(kp)))
    nkeys_user = len(planes)
    if unique_keys:
        nkeys = nkeys_user
    else:
        # Synthetic arange plane: stability + uniqueness + merge consistency.
        planes.append(jnp.arange(n, dtype=jnp.int32))
        nkeys = nkeys_user + 1
    for op in operands[num_keys:]:
        pl_, tag = _decompose(op)
        planes.extend(pl_)
        tags.append((tag, len(pl_)))

    nplanes = len(planes)
    auto_chunk, auto_tile = choose_sizes(nplanes)
    chunk = auto_chunk if chunk is None else chunk
    tile = auto_tile if tile is None else min(tile, chunk)
    n2 = max(-(-n // chunk) * chunk, chunk)
    if n2 != n:
        padded = []
        sent = _I32MAX
        for p, plane in enumerate(planes):
            fill = sent if p < nkeys else jnp.int32(0)
            padded.append(
                jnp.concatenate(
                    [plane, jnp.full((n2 - n,), fill, jnp.int32)]
                )
            )
        planes = padded

    rows = n2 // _LANES
    wrows = tile // _LANES + 1
    out_rows = rows + wrows  # DMA scratch tail; contents unspecified
    x = jnp.stack([p.reshape(rows, _LANES) for p in planes])

    x = _chunk_sort(
        x, chunk=chunk, nkeys=nkeys, out_rows=out_rows, interpret=interpret
    )
    runs = [(i * chunk, chunk) for i in range(n2 // chunk)]
    while len(runs) > 1:
        tiles, runs = _pass_tiles(runs, tile)
        meta = _merge_path_meta(x, tiles, tile, nkeys_user)
        x = _merge_pass(
            x,
            meta,
            tile=tile,
            nkeys=nkeys,
            out_rows=out_rows,
            interpret=interpret,
        )

    flat = x[:, : n2 // _LANES, :].reshape(nplanes, n2)[:, :n]
    out = []
    pi = 0
    for ti, (tag, cnt) in enumerate(tags):
        sub = [flat[pi + c] for c in range(cnt)]
        out.append(_recompose(sub, tag))
        pi += cnt
        if ti == num_keys - 1 and not unique_keys:
            pi += 1  # skip the synthetic arange plane
    return tuple(out)


def hbm_sort_adaptive(
    operands: tuple[jax.Array, ...] | list[jax.Array],
    *,
    interpret: bool = False,
    chunk: int | None = None,
    tile: int | None = None,
    wide_algorithm: str = "hbm",
    num_keys: int = 1,
    unique_keys: bool = False,
) -> tuple[jax.Array, ...]:
    """`hbm_sort` with runtime range-adaptive key compaction for 64-bit keys.

    A 64-bit key decomposes into two int32 planes, doubling the comparator
    work of every compare-exchange -- the reason the wide kernel trails
    `jax.lax.sort` on int64 (artifacts/sort_r02.json). But most real 64-bit
    key columns (the reference generator's keys are <= 3N,
    generate_data.py:9) span far less than 2^31 values, so this wrapper
    measures min/max at runtime (one cheap reduce) and `lax.cond`-dispatches:
    if max - min <= INT32_MAX - 1, keys are rebased to a SINGLE int32 plane
    (order-preserving, exactly invertible) and sorted by the one-plane
    kernel; otherwise the wide two-plane kernel runs. Both branches compile
    (one extra compile, cached); the fast branch cuts comparator work ~2x.

    ``wide_algorithm`` picks the fallback when the span does NOT fit:
    "hbm" (the two-plane Pallas kernel) or "xla" (`jax.lax.sort`) -- below
    the measured two-plane crossover the XLA sort is the faster loser
    (artifacts/sort_r03.json), so `ops/sort`'s auto dispatch passes "xla"
    there.
    """
    operands = tuple(operands)
    key = operands[0]
    if key.dtype not in (jnp.int64, jnp.uint64) or key.shape[0] == 0:
        return hbm_sort(
            operands,
            interpret=interpret,
            chunk=chunk,
            tile=tile,
            num_keys=num_keys,
            unique_keys=unique_keys,
        )

    # Probe the range over VALID keys only: padded tables carry the dtype-max
    # sentinel (columnar/table.py masked_keys), which would blow the span to
    # ~2^63 and permanently disable the fast path (ADVICE r3). Sentinel keys
    # are re-mapped to int32 max inside the narrow branch so padding still
    # sorts last. Valid keys EQUAL to the sentinel are unsupported here, as
    # everywhere in the engine (ops/join.py module contract).
    sent = jnp.array(jnp.iinfo(key.dtype).max, dtype=key.dtype)
    is_valid = key != sent
    lo = jnp.min(jnp.where(is_valid, key, sent))
    hi = jnp.max(jnp.where(is_valid, key, jnp.iinfo(key.dtype).min))
    # Span in uint64: exact for any signed pair with hi >= lo. An all-
    # sentinel input gives hi < lo, wrapping the uint64 span to ~1, so
    # `fits` is True and the NARROW branch runs -- which is still correct:
    # every key equals the sentinel and is remapped to int32 max inside the
    # branch, so the (trivially sorted) result round-trips exactly.
    span = hi.astype(jnp.uint64) - lo.astype(jnp.uint64)
    fits = span <= jnp.uint64(np.iinfo(np.int32).max - 1)

    def narrow_branch(ops):
        k = ops[0]
        k32 = jnp.where(
            k == sent,
            jnp.int32(np.iinfo(np.int32).max),
            (k.astype(jnp.uint64) - lo.astype(jnp.uint64)).astype(jnp.int32),
        )
        sorted_ops = hbm_sort(
            (k32,) + ops[1:],
            interpret=interpret,
            chunk=chunk,
            tile=tile,
            num_keys=num_keys,
            unique_keys=unique_keys,
        )
        k_back = jnp.where(
            sorted_ops[0] == jnp.int32(np.iinfo(np.int32).max),
            sent,
            (
                sorted_ops[0].astype(jnp.uint64) + lo.astype(jnp.uint64)
            ).astype(key.dtype),
        )
        return (k_back.astype(key.dtype),) + sorted_ops[1:]

    def wide_branch(ops):
        if wide_algorithm == "xla":
            return jax.lax.sort(
                ops, num_keys=num_keys, is_stable=not unique_keys
            )
        return hbm_sort(
            ops,
            interpret=interpret,
            chunk=chunk,
            tile=tile,
            num_keys=num_keys,
            unique_keys=unique_keys,
        )

    return jax.lax.cond(fits, narrow_branch, wide_branch, operands)
