"""Honest stage attribution for the fused 1:1 join.

Prefix ablation (bench/ablation_bench.py) proved unreliable: a prefix of the
pipeline can measure SLOWER than the whole program (XLA restructures around
consumers). This bench instead times the FULL pipeline with exactly one
stage replaced by a shape-preserving fake (results are wrong; only the
timing matters), so each stage's in-context cost is the delta from the real
full run:

  full        -- the real fused join (baseline)
  no_merge    -- step-1 merge sort faked (identity order)
  no_scans    -- scan algebra faked (dest = iota)
  no_unmerge  -- step-2 inverse-permutation sort faked (dest_by_pos = dest)
  no_emit     -- step-3 payload sorts faked (slices)

Run: python -m bench.attrib_bench [--rows 10000000] [--narrow]
"""

from __future__ import annotations

import argparse
import json
import sys


def run(rows: int, reps: int = 3, narrow: bool = False):
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
    from pim_sort_merge_join_tpu.ops import filter as filter_ops
    from pim_sort_merge_join_tpu.ops.join import _head_broadcast, _narrow32

    n = rows
    t1 = Table.from_numpy(generate_table(n, seed=1))
    t2 = Table.from_numpy(generate_table(n, seed=2))
    jax.block_until_ready((t1.data, t2.data))
    cfg = EngineConfig(narrow_keys=narrow)
    z = opaque_zero

    def core(a, b, *, fake=None):
        """The fused join with one stage optionally faked."""
        m1 = filter_ops.predicate_mask(a, cfg.predicate1) & a.valid_mask()
        m2 = filter_ops.predicate_mask(b, cfg.predicate2) & b.valid_mask()
        k1 = jnp.where(m1, a.data[:, 0], key_sentinel(a.dtype))
        k2 = jnp.where(m2, b.data[:, 0], key_sentinel(b.dtype))
        if narrow:
            k1, k2 = _narrow32(k1), _narrow32(k2)
        cap1, cap2 = a.capacity, b.capacity
        m = cap1 + cap2
        keys = jnp.concatenate([k1, k2])
        pos = jnp.arange(m, dtype=jnp.int32)
        if fake == "merge":
            mkeys, mpos = keys, pos
        else:
            mkeys, mpos = jax.lax.sort((keys, pos), num_keys=2)
        if fake == "scans":
            dest = pos
            num_out = mpos[0] + jnp.int32(1)
        else:
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
            base2 = _head_broadcast(head, c2 - is2)
            base1 = _head_broadcast(head, c1 - is1)
            rank = jnp.where(is2 == 1, c2 - is2 - base2, c1 - is1 - base1)
            live = mkeys != key_sentinel(mkeys.dtype)
            matched2 = (is2 == 1) & (rank < (c1 - base1)) & live
            m2cum = jnp.cumsum(matched2.astype(jnp.int32), dtype=jnp.int32)
            end2 = jax.lax.cummin(jnp.where(tail, c2, m)[::-1])[::-1]
            matched1 = (is2 == 0) & (rank < (end2 - base2)) & live
            dest = jnp.where(
                matched2, m2cum - 1, jnp.where(matched1, m2cum + rank, jnp.int32(m))
            )
            num_out = jnp.sum(matched2, dtype=jnp.int32)
        if fake == "unmerge":
            dest_by_pos = dest
        else:
            _, dest_by_pos = jax.lax.sort((mpos, dest), num_keys=1)
        dest1 = dest_by_pos[:cap1]
        dest2 = dest_by_pos[cap1:]
        if fake == "emit":
            part1 = a.data
            part2 = b.data[:, 1:]
            out_probe = part1[0, 0] + part2[0, 0]
        else:
            ops1 = jax.lax.sort(
                (dest1,) + tuple(a.data[:, c] for c in range(a.ncol)),
                num_keys=1,
                is_stable=False,
            )
            part1 = jnp.stack(ops1[1:], axis=1)[:cap1]
            ops2 = jax.lax.sort(
                (dest2,) + tuple(b.data[:, c] for c in range(1, b.ncol)),
                num_keys=1,
                is_stable=False,
            )
            part2 = jnp.stack(ops2[1:], axis=1)[:cap1]
            out_probe = part1[0, 0] + part2[0, 0]
        valid_out = jnp.arange(cap1, dtype=jnp.int32) < num_out
        data = jnp.concatenate([part1, part2[:cap1]], axis=1)
        data = jnp.where(valid_out[:, None], data, jnp.zeros_like(data))
        return num_out + data[0, 0].astype(jnp.int32) + out_probe.astype(jnp.int32)

    results = {}
    for fake in (None, "merge", "scans", "unmerge", "emit"):

        def body(carry, a, b, fake=fake):
            ap = a.replace(num_rows=a.num_rows + z(carry))
            return carry + core(ap, b, fake=fake)

        med = time_chained_ms(body, t1, t2, k1=1, k2=4, reps=reps)
        name = "full" if fake is None else f"no_{fake}"
        results[name] = med
        rec = {"bench": name, "rows": n, "narrow": narrow, "wall_ms": round(med, 3)}
        if fake is not None and "full" in results:
            rec["stage_cost_ms"] = round(results["full"] - med, 3)
        print(json.dumps(rec), flush=True)


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
