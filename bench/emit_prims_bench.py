"""Microbenchmark: candidate realizations of the join's unmerge + emit blocks.

VERDICT r3 item 1: the unmerge (permutation-inverse) sort + two emit sorts
cost ~191 ms of the 273 ms 10M-row pipeline. All their sort keys are unique
bounded int32s (mpos is a permutation of [0,2n); live dest slots are unique),
so each block has an O(n) scatter/gather realization. This harness times the
primitives head-to-head at pipeline sizes (serial-chain slope protocol,
bench/timing.py) so the join core can dispatch on measured numbers, not the
round-2 "scatters are 75x" folklore (which was measured for a different
shape regime).

Run: python -m bench.emit_prims_bench [n_merged]
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from bench.timing import opaque_zero, time_chained_ms


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000  # merged domain
    half = n // 2
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    vals = jnp.arange(n, dtype=jnp.int32)
    # dest: ~40% matched rows w/ unique increasing slots, rest big sentinel
    live = rng.random(half) < 0.4
    dest_np = np.where(live, np.cumsum(live) - 1, half).astype(np.int32)
    dest = jnp.asarray(dest_np)
    data = jnp.asarray(rng.integers(0, 1 << 31, size=(half, 4), dtype=np.int32))
    res = {"n_merged": n, "n_table": half}

    def run(name, body, *ops):
        res[name] = round(time_chained_ms(body, *ops), 3)
        print(name, res[name], flush=True)

    # -- unmerge block: invert a permutation carrying one int32 payload -----
    def unmerge_sort(c, p, v):
        _, out = jax.lax.sort((p + opaque_zero(c), v), num_keys=1)
        return c + out[0]

    run("unmerge_sort2_ms", unmerge_sort, perm, vals)

    def unmerge_scatter(c, p, v):
        out = jnp.zeros((n,), jnp.int32).at[p + opaque_zero(c)].set(
            v, unique_indices=True, mode="drop"
        )
        return c + out[0]

    run("unmerge_scatter_ms", unmerge_scatter, perm, vals)

    # -- emit block: place table rows at their dest slots -------------------
    def emit_sort(c, d, t):
        ops = jax.lax.sort(
            (d + opaque_zero(c),) + tuple(t[:, i] for i in range(4)),
            num_keys=1,
            is_stable=False,
        )
        return c + ops[1][0].astype(jnp.int32)

    run("emit_sort5_ms", emit_sort, dest, data)

    def emit_scatter_rows(c, d, t):
        out = jnp.zeros((half, 4), t.dtype).at[d + opaque_zero(c)].set(
            t, unique_indices=True, mode="drop"
        )
        return c + out[0, 0].astype(jnp.int32)

    run("emit_scatter_rows_ms", emit_scatter_rows, dest, data)

    def emit_scatter_cols(c, d, t):
        z = opaque_zero(c)
        acc = c
        for i in range(4):
            out = jnp.zeros((half,), t.dtype).at[d + z].set(
                t[:, i], unique_indices=True, mode="drop"
            )
            acc = acc + out[0].astype(jnp.int32)
        return acc

    run("emit_scatter_cols_ms", emit_scatter_cols, dest, data)

    # gather-based emit: src indices (monotone = sorted-table case; random =
    # fused-unsorted case)
    take_mono_np = np.flatnonzero(live).astype(np.int32)
    take_mono = jnp.asarray(
        np.pad(take_mono_np, (0, half - take_mono_np.shape[0]))
    )
    take_rand = jnp.asarray(rng.integers(0, half, size=(half,), dtype=np.int32))

    def gather_rows(c, t, ix):
        out = jnp.take(t, ix + opaque_zero(c), axis=0)
        return c + out[0, 0].astype(jnp.int32)

    run("emit_gather_rows_mono_ms", gather_rows, data, take_mono)
    run("emit_gather_rows_rand_ms", gather_rows, data, take_rand)

    # compaction of matched mpos inside merged domain (for gather-emit):
    # cumsum + scatter of int32
    m1 = jnp.asarray(rng.random(n) < 0.2)

    def compact(c, mask, v):
        slot = jnp.where(mask, jnp.cumsum(mask, dtype=jnp.int32) - 1, half)
        out = jnp.zeros((half,), jnp.int32).at[slot + opaque_zero(c)].set(
            v, unique_indices=True, mode="drop"
        )
        return c + out[0]

    run("compact_scatter_ms", compact, m1, vals)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
