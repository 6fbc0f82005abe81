"""Pipeline component breakdown: measure every candidate primitive on chip.

Round-3 perf work is decided by data, not folklore: the fused 1:1 join is
four `lax.sort` calls plus scans (ops/join.py `_one_to_one_merged`), and the
round-2 roofline says the pipeline is overhead-bound (8-17% of HBM
speed-of-light). This bench times, with the serial-chain slope protocol
(bench/timing.py), each primitive that could replace a sort:

  - the sorts the pipeline issues today (merge 2n, unmerge 2n, emit n)
  - scatter/gather at the same sizes (the unmerge is a permutation inverse,
    the emit is a compaction -- both are one scatter pass, not a sort)
  - the scan-algebra block
  - a full "dense-domain join" candidate: for integer keys with bounded
    range R = max-min+1 <= c*n (always true for the reference generator,
    keys <= 3N, generate_data.py:9), scatter rows by key offset into an
    R-slot domain, AND the presence flags, and compact -- zero sorts.

Run: python -m bench.breakdown_bench [--rows 10000000] [--reps 3]
Writes one JSON line per variant.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

import numpy as np


def run(rows: int, reps: int = 3, domain_factor: int = 3):
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from bench.timing import opaque_zero, time_chained_ms

    n = rows
    m = 2 * rows  # merged-domain size
    r = domain_factor * rows  # dense key domain
    rng = np.random.default_rng(0)

    # Reference-distribution keys: unique, uniform in [1, 3N).
    k1u = rng.choice(r, size=n, replace=False).astype(np.int64) + 1
    k2u = rng.choice(r, size=n, replace=False).astype(np.int64) + 1
    perm_n = rng.permutation(n).astype(np.int32)
    perm_m = rng.permutation(m).astype(np.int32)

    keys64_m = jnp.asarray(np.concatenate([k1u, k2u]))
    keys32_m = keys64_m.astype(jnp.int32)
    keys64_n = jnp.asarray(k1u)
    keys32_n = keys64_n.astype(jnp.int32)
    k2_dev = jnp.asarray(k2u)
    idx_m = jnp.arange(m, dtype=jnp.int32)
    pm = jnp.asarray(perm_m)
    pn = jnp.asarray(perm_n)
    rows4 = jnp.asarray(
        rng.integers(1, r, size=(n, 4)).astype(np.int64)
    )
    vals_m = jnp.arange(m, dtype=jnp.int32)

    results = []

    def bench(name, body, *ops, k1=1, k2=4):
        med = time_chained_ms(body, *ops, k1=k1, k2=k2, reps=reps)
        rec = {"bench": name, "rows": n, "wall_ms": round(med, 3)}
        print(json.dumps(rec), flush=True)
        results.append(rec)

    z = opaque_zero

    # --- sorts the pipeline issues today -----------------------------------
    def sort_pair(carry, k, v):
        kp = k.at[0].add(z(carry).astype(k.dtype))
        ok, ov = jax.lax.sort((kp, v), num_keys=1, is_stable=True)
        return carry + ov[m // 2]

    bench("sort_pair_i64_2n", sort_pair, keys64_m, idx_m)
    bench("sort_pair_i32_2n", sort_pair, keys32_m, idx_m)

    def sort_payload(carry, k, d):
        kp = k.at[0].add(z(carry).astype(k.dtype))
        cols = tuple(d[:, c] for c in range(4))
        out = jax.lax.sort((kp,) + cols, num_keys=1, is_stable=True)
        return carry + out[1][n // 2].astype(jnp.int32)

    bench("sort_payload_i64_n", sort_payload, keys64_n, rows4)
    bench("sort_payload_i32_n", sort_payload, keys32_n, rows4)

    # --- scatter / gather candidates ---------------------------------------
    def scatter_i32(carry, p, v):
        vp = v.at[0].add(z(carry))
        out = jnp.zeros((m,), jnp.int32).at[p].set(vp)
        return carry + out[m // 2]

    bench("scatter_i32_2n", scatter_i32, pm, vals_m)

    def gather_i32(carry, p, v):
        pp = p.at[0].add(z(carry))
        out = jnp.take(v, pp)
        return carry + out[m // 2]

    bench("gather_i32_2n", gather_i32, pm, vals_m)

    def scatter_rows(carry, p, d):
        dp = d.at[0, 0].add(z(carry).astype(d.dtype))
        out = jnp.zeros((n, 4), d.dtype).at[p].set(dp)
        return carry + out[n // 2, 0].astype(jnp.int32)

    bench("scatter_rows4_i64_n", scatter_rows, pn, rows4)

    def gather_rows(carry, p, d):
        pp = p.at[0].add(z(carry))
        out = jnp.take(d, pp, axis=0)
        return carry + out[n // 2, 0].astype(jnp.int32)

    bench("gather_rows4_i64_n", gather_rows, pn, rows4)

    # --- scan block (the join's algebra at merged size) --------------------
    def scans(carry, k):
        kp = k.at[0].add(z(carry))
        head = jnp.concatenate([jnp.ones((1,), jnp.bool_), kp[1:] != kp[:-1]])
        tail = jnp.concatenate([kp[1:] != kp[:-1], jnp.ones((1,), jnp.bool_)])
        iota = jnp.arange(m, dtype=jnp.int32)
        is2 = (iota >= n).astype(jnp.int32)
        c2 = jnp.cumsum(is2, dtype=jnp.int32)
        run_start = jax.lax.cummax(jnp.where(head, iota, 0))
        base2 = jax.lax.cummax(jnp.where(head, c2 - is2, 0))
        run_end = jax.lax.cummin(jnp.where(tail, iota, m)[::-1])[::-1]
        end2 = jax.lax.cummin(jnp.where(tail, c2, m)[::-1])[::-1]
        s = run_start + base2 + run_end + end2
        return carry + s[m // 2]

    bench("scan_block_2n", scans, keys32_m)

    def cumsum1(carry, k):
        kp = k.at[0].add(z(carry))
        return carry + jnp.cumsum(kp, dtype=jnp.int32)[m // 2]

    bench("cumsum_i32_2n", cumsum1, vals_m)

    # --- dense-domain join (no sorts; unique integer keys, range <= r) -----
    def dense_join(carry, ka, kb, d):
        kap = ka.at[0].add(z(carry).astype(ka.dtype))
        ia = (kap - 1).astype(jnp.int32)  # keys in [1, r]
        ib = (kb - 1).astype(jnp.int32)
        # presence flags + row payload scatter into the dense domain
        pa = jnp.zeros((r,), jnp.int8).at[ia].set(1, mode="drop")
        pb = jnp.zeros((r,), jnp.int8).at[ib].set(1, mode="drop")
        both = (pa & pb) == 1
        # rows of table 1 land at their key slot
        dom = jnp.zeros((r, 4), d.dtype).at[ia].set(d, mode="drop")
        # compact matched slots to the front (output is in key order)
        sel = both.astype(jnp.int32)
        pos = jnp.cumsum(sel) - sel
        src = jnp.zeros((n,), jnp.int32).at[jnp.where(both, pos, n)].set(
            jnp.arange(r, dtype=jnp.int32), mode="drop"
        )
        out = jnp.take(dom, src, axis=0)
        return carry + out[0, 0].astype(jnp.int32) + jnp.sum(sel)

    bench("dense_join_1table_n", dense_join, keys64_n, k2_dev, rows4)

    # searchsorted rank-by-merge (what method='sort' costs)
    def ss_sort(carry, ka, kb):
        kap = ka.at[0].add(z(carry).astype(ka.dtype))
        lo = jnp.searchsorted(kb, kap, side="left", method="sort")
        return carry + lo[n // 2].astype(jnp.int32)

    k1s = jnp.sort(keys64_n)
    k2s = jnp.sort(k2_dev)
    bench("searchsorted_sort_n", ss_sort, k1s, k2s)

    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)
    run(args.rows, reps=args.reps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
