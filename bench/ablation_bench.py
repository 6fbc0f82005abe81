"""In-context stage ablation of the fused 1:1 join pipeline.

The standalone component costs (bench/breakdown_bench.py) sum to ~2x the
measured full-pipeline time, so XLA's in-context fusion matters; this bench
times nested prefixes of `_one_to_one_merged` inside one jitted program each,
so stage costs are read as differences between adjacent prefixes:

  P2_merge_sort   -- step 1 only (the 2n-element key/pos sort)
  P1_scans        -- step 1 + the run/rank/match scan algebra
  P3_unmerge      -- + step 2 (the 2n-element permutation-inverse sort)
  P0_full         -- the whole pipeline_core (reproduces the roofline number)
  P4_emit_only    -- the two payload emit sorts alone, dest precomputed

Run: python -m bench.ablation_bench [--rows 10000000]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def run(rows: int, reps: int = 3, narrow: bool = False):
    import functools

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from bench.timing import opaque_zero, time_chained_ms
    from pim_sort_merge_join_tpu.columnar.generate import generate_table
    from pim_sort_merge_join_tpu.columnar.table import Table, key_sentinel
    from pim_sort_merge_join_tpu.config import EngineConfig
    from pim_sort_merge_join_tpu.engine.pipeline import pipeline_core
    from pim_sort_merge_join_tpu.ops import filter as filter_ops
    from pim_sort_merge_join_tpu.ops.join import _head_broadcast, _narrow32

    n = rows
    rows1 = generate_table(n, seed=1)
    rows2 = generate_table(n, seed=2)
    cfg = EngineConfig(narrow_keys=narrow)
    t1 = Table.from_numpy(rows1)
    t2 = Table.from_numpy(rows2)
    jax.block_until_ready((t1.data, t2.data))
    z = opaque_zero

    def masked_keys(a, b):
        m1 = filter_ops.predicate_mask(a, cfg.predicate1) & a.valid_mask()
        m2 = filter_ops.predicate_mask(b, cfg.predicate2) & b.valid_mask()
        k1 = jnp.where(m1, a.data[:, 0], key_sentinel(a.dtype))
        k2 = jnp.where(m2, b.data[:, 0], key_sentinel(b.dtype))
        if narrow:
            k1, k2 = _narrow32(k1), _narrow32(k2)
        return k1, k2

    def merge_sort(a, b):
        k1, k2 = masked_keys(a, b)
        cap1 = a.capacity
        m = cap1 + b.capacity
        keys = jnp.concatenate([k1, k2])
        pos = jnp.arange(m, dtype=jnp.int32)
        mkeys, mpos = jax.lax.sort((keys, pos), num_keys=2)
        return mkeys, mpos, cap1, m

    def scans(a, b):
        mkeys, mpos, cap1, m = merge_sort(a, b)
        is2 = (mpos >= cap1).astype(jnp.int32)
        is1 = 1 - is2
        head = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), mkeys[1:] != mkeys[:-1]]
        )
        tail = jnp.concatenate(
            [mkeys[1:] != mkeys[:-1], jnp.ones((1,), jnp.bool_)]
        )
        iota = jnp.arange(m, dtype=jnp.int32)
        c2 = jnp.cumsum(is2, dtype=jnp.int32)
        c1 = (iota + 1) - c2
        run_start = _head_broadcast(head, iota)
        base2 = _head_broadcast(head, c2 - is2)
        base1 = run_start - base2
        rank = jnp.where(is2 == 1, c2 - is2 - base2, c1 - is1 - base1)
        run_end = jax.lax.cummin(jnp.where(tail, iota, m)[::-1])[::-1]
        end2 = jax.lax.cummin(jnp.where(tail, c2, m)[::-1])[::-1]
        end1 = (run_end + 1) - end2
        cnt1_run = end1 - base1
        cnt2_run = end2 - base2
        match = jnp.where(is2 == 1, rank < cnt1_run, rank < cnt2_run) & (
            mkeys != key_sentinel(mkeys.dtype)
        )
        matched1 = (match & (is2 == 0)).astype(jnp.int32)
        m0 = jnp.cumsum(matched1, dtype=jnp.int32)
        slot_base = _head_broadcast(head, m0 - matched1)
        dest = jnp.where(match, slot_base + rank, jnp.int32(m))
        return mpos, dest, cap1

    def unmerge(a, b):
        mpos, dest, cap1 = scans(a, b)
        _, dest_by_pos = jax.lax.sort((mpos, dest), num_keys=1)
        return dest_by_pos, cap1

    rng = np.random.default_rng(0)
    d1 = jnp.asarray(rng.permutation(n).astype(np.int32))
    d2 = jnp.asarray(rng.permutation(n).astype(np.int32))

    def emit_only(a, b, dd1, dd2):
        ops1 = jax.lax.sort(
            (dd1,) + tuple(a.data[:, c] for c in range(a.ncol)),
            num_keys=1,
            is_stable=True,
        )
        ops2 = jax.lax.sort(
            (dd2,) + tuple(b.data[:, c] for c in range(1, b.ncol)),
            num_keys=1,
            is_stable=True,
        )
        return ops1[1][n // 2] + ops2[1][n // 2]

    variants = {}

    def perturb(a, carry):
        return a.replace(num_rows=a.num_rows + z(carry))

    def body_p0(carry, a, b):
        res = pipeline_core(perturb(a, carry), b, config=cfg)
        return carry + res.num_rows

    variants["P0_full"] = body_p0

    def body_p2(carry, a, b):
        mk, mp, _, m = merge_sort(perturb(a, carry), b)
        return carry + mp[m // 2]

    variants["P2_merge_sort"] = body_p2

    def body_p1(carry, a, b):
        mpos, dest, _ = scans(perturb(a, carry), b)
        return carry + dest[n] + mpos[n // 2]

    variants["P1_scans"] = body_p1

    def body_p3(carry, a, b):
        dbp, _ = unmerge(perturb(a, carry), b)
        return carry + dbp[n // 2]

    variants["P3_unmerge"] = body_p3

    def body_p4(carry, a, b):
        dd1 = d1.at[0].add(z(carry))
        s = emit_only(a, b, dd1, d2)
        return carry + s.astype(jnp.int32)

    variants["P4_emit_only"] = body_p4

    for name, body in variants.items():
        med = time_chained_ms(body, t1, t2, k1=1, k2=4, reps=reps)
        print(
            json.dumps(
                {
                    "bench": name,
                    "rows": n,
                    "narrow": narrow,
                    "wall_ms": round(med, 3),
                }
            ),
            flush=True,
        )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--narrow", action="store_true")
    args = ap.parse_args(argv)
    run(args.rows, reps=args.reps, narrow=args.narrow)
    return 0


if __name__ == "__main__":
    sys.exit(main())
