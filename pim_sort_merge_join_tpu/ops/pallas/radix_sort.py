"""LSD radix-sort prototypes for the narrow-key (int32) path.

VERDICT r3/r4 asked for the radix experiment SURVEY.md section 7 names
("bitonic or radix sort"): the engine's narrow-key sorts run a fixed number
of O(log^2 C) bitonic substeps per element; a radix sort has a FIXED pass
count (ceil(key_bits/digit_bits)), so on hardware with cheap data-dependent
permutation it wins asymptotically. This module implements the two honest
TPU realizations so the comparison is measured, not argued
(bench/radix_bench.py -> artifacts/radix_r05.json):

1. `radix_tile_sort` -- Pallas kernel, the canonical "counting sort on the
   MXU" formulation. Grid over S-element tiles; per LSD pass, in VMEM:
     - one-hot digit matrix  oh[S, V]           (V = 2^digit_bits)
     - in-VMEM histogram + stable ranks via an inclusive-prefix matmul
       pre = tril[S, S] @ oh                    (MXU)
     - exclusive digit bases via a strict-upper matmul over [1, V]
     - destination = base[digit] + rank, and the tile permutation applied
       as a one-hot matmul  y = dperm^T @ x     (MXU)
   Data planes move through f32 matmuls as exact 16-bit halves (f32 holds
   integers < 2^24 exactly; int32 payloads split/recombine losslessly).
   The apples-to-apples baseline is the SAME work done by the bitonic
   chunk kernel (`hbm_sort._chunk_sort` at chunk=S): both produce
   independently sorted S-runs that the identical merge machinery would
   combine.

2. `xla_lsd_radix_sort` -- the global-LSD route: whole-array counting sort
   per pass in pure XLA, with the per-pass permutation as a scatter. This
   is the formulation GPU radix sorts use (shared-memory scatter); on TPU
   the scatter lowers to the serialized path the engine already measured at
   2-12x worse than sorts (artifacts/sort_variants_r04.json), so this
   quantifies the whole route rather than assuming it.

Why radix is expected to LOSE on this hardware (the root-cause arithmetic
the benchmark confirms): a bitonic substep costs ~6 vector-slot ops per
element and the full chunk sort ~log2(S)*(log2(S)+1)/2 substeps, i.e.
~0.4-1.6 VPU cycles/element at S=512..2^17. The radix pass's permutation
needs a one-hot S x S matrix whose CONSTRUCTION alone is S vector-slot
compares per element per pass (S=512 -> ~0.5 VPU cycles/element/pass), and
the rank matmul costs S*V MACs per element per pass on the MXU; with
ceil(key_bits/digit_bits) >= 4 passes the one-hot builds alone exceed the
entire bitonic budget. TPU has no vector scatter (mram-style DMA is
contiguous; compare-exchange networks are the native permutation
primitive), so no formulation avoids this: the permutation must be either
a network (= bitonic) or a materialized one-hot (= this kernel) or an HBM
scatter (= route 2).

Reference anchor: replaces the same stage as sort_dpu.c:157-187 (insertion
sort) + :251-323 (tasklet merge tree); the reference's own sort is also
comparison-based because MRAM DMA is 8-byte-aligned sequential
(mram.h:33-60) -- the same structural constraint, one level down.
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


def _split16(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """int32 -> (hi, lo) 16-bit halves, each exactly representable in f32."""
    lo = x & jnp.int32(0xFFFF)
    hi = (x >> 16) & jnp.int32(0xFFFF)
    return hi, lo


def _join16(hi: jax.Array, lo: jax.Array) -> jax.Array:
    return (hi << 16) | lo


def _radix_tile_kernel(
    *refs,
    tile: int,
    digit_bits: int,
    key_bits: int,
    nops: int,
):
    in_refs, out_refs = refs[:nops], refs[nops:]
    s = tile
    v = 1 << digit_bits
    npass = math.ceil(key_bits / digit_bits)

    # Pass-invariant matrices (f32, built once per tile).
    row_i = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    tril_incl = (col_i <= row_i).astype(jnp.float32)  # pre[i] sums j <= i
    vcol = jax.lax.broadcasted_iota(jnp.int32, (s, v), 1)
    vrow_i = jax.lax.broadcasted_iota(jnp.int32, (v, v), 0)
    vcol_i = jax.lax.broadcasted_iota(jnp.int32, (v, v), 1)
    strict_upper = (vrow_i < vcol_i).astype(jnp.float32)  # exclusive base

    # Data as exact f32 16-bit halves: [S, 1] each.
    planes = []
    for p in range(nops):
        x = in_refs[p][...]
        hi, lo = _split16(x)
        planes.append((hi.astype(jnp.float32), lo.astype(jnp.float32)))
    key_i32 = in_refs[0][...]

    f32 = jnp.float32
    dot = functools.partial(
        jax.lax.dot_general, preferred_element_type=jnp.float32
    )

    for pss in range(npass):
        shift = pss * digit_bits
        digit = (key_i32 >> shift) & jnp.int32(v - 1)  # [S, 1]
        oh = (digit == vcol).astype(f32)  # [S, V]
        # Inclusive per-digit prefix counts (stable ranks): MXU matmul.
        pre = dot(tril_incl, oh, (((1,), (0,)), ((), ())))  # [S, V]
        rank = jnp.sum(oh * pre, axis=1, keepdims=True) - 1.0  # [S, 1]
        hist = pre[s - 1 : s, :]  # [1, V]
        base = dot(hist, strict_upper, (((1,), (0,)), ((), ())))  # [1, V]
        elem_base = jnp.sum(oh * base, axis=1, keepdims=True)  # [S, 1]
        dest = (elem_base + rank).astype(jnp.int32)  # [S, 1], a permutation
        # One-hot permutation, transposed build: dpermT[j, i] = dest[j]==i.
        dpermT = (dest == col_i).astype(f32)  # [S, S]
        new_planes = []
        for hi, lo in planes:
            nhi = dot(dpermT, hi, (((0,), (0,)), ((), ())))
            nlo = dot(dpermT, lo, (((0,), (0,)), ((), ())))
            new_planes.append((nhi, nlo))
        planes = new_planes
        key_i32 = _join16(
            planes[0][0].astype(jnp.int32), planes[0][1].astype(jnp.int32)
        )

    for p in range(nops):
        hi, lo = planes[p]
        out_refs[p][...] = _join16(hi.astype(jnp.int32), lo.astype(jnp.int32))


def radix_tile_sort(
    operands: tuple[jax.Array, ...],
    *,
    tile: int = 512,
    digit_bits: int = 8,
    key_bits: int = 32,
    interpret: bool = False,
) -> tuple[jax.Array, ...]:
    """Sort each S-element tile of the operands by operands[0], LSD radix.

    Keys must be NON-NEGATIVE int32 with key_bits significant bits (the
    engine's narrow path: values in [0, 3N) plus the INT32_MAX pad
    sentinel, which key_bits=32 covers since the sign bit is always 0).
    Output tiles are independently sorted runs -- the same contract as the
    bitonic chunk kernel (`hbm_sort._chunk_sort`) at chunk=tile, making
    the two directly comparable as the run-formation phase.
    """
    key = operands[0]
    n = key.shape[0]
    if n % tile != 0:
        raise ValueError(f"n={n} must be a multiple of tile={tile}")
    if key.dtype != jnp.int32:
        raise ValueError("radix_tile_sort: int32 keys only (narrow path)")
    nops = len(operands)
    cols = [op.reshape(n, 1) for op in operands]
    kernel = functools.partial(
        _radix_tile_kernel,
        tile=tile,
        digit_bits=digit_bits,
        key_bits=key_bits,
        nops=nops,
    )
    spec = pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=[spec] * nops,
        out_specs=[spec] * nops,
        out_shape=[jax.ShapeDtypeStruct((n, 1), jnp.int32)] * nops,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*cols)
    return tuple(o.reshape(n) for o in outs)


def xla_lsd_radix_sort(
    operands: tuple[jax.Array, ...],
    *,
    digit_bits: int = 8,
    key_bits: int = 32,
) -> tuple[jax.Array, ...]:
    """Global LSD radix sort in pure XLA; scatter-based permutation.

    Whole-array stable counting sort per pass: digit one-hot cumsum gives
    stable ranks, digit histogram prefix gives bases, and the permutation
    is applied with `.at[dest].set` -- the GPU-style formulation. On TPU
    the scatter serializes (measured 2-12x worse than sorts at 10-20M,
    artifacts/sort_variants_r04.json); this exists to MEASURE that route.
    """
    key = operands[0]
    if key.dtype != jnp.int32:
        raise ValueError("xla_lsd_radix_sort: int32 keys only")
    n = key.shape[0]
    v = 1 << digit_bits
    npass = math.ceil(key_bits / digit_bits)
    ops = tuple(operands)
    for pss in range(npass):
        shift = pss * digit_bits
        digit = (ops[0] >> shift) & jnp.int32(v - 1)
        oh = jax.nn.one_hot(digit, v, dtype=jnp.int32)  # [n, V]
        pre = jnp.cumsum(oh, axis=0)  # inclusive rank per digit
        hist = pre[-1]
        base = jnp.cumsum(hist) - hist  # exclusive
        rank = jnp.take_along_axis(pre, digit[:, None], axis=1)[:, 0] - 1
        dest = jnp.take(base, digit) + rank
        ops = tuple(
            jnp.zeros_like(x).at[dest].set(x, mode="drop") for x in ops
        )
    return ops
