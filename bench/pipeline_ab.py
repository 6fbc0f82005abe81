"""Interleaved full-pipeline A/B under one process.

Cross-run drift on the tunneled chip can reach tens of percent, so
comparing two configurations from separate processes/runs is unsound. This
bench compiles every requested configuration up front, then interleaves
outer repetitions (A, B, A, B, ...) so drift hits both sides equally, and
reports per-config min/median.

Each body folds a result-data element into the carry (full materialization;
see docs/bench_regression_analysis.md).

Run: python -m bench.pipeline_ab --rows 10000000 \
         --configs narrow:xla,narrow:auto,wide:xla
"""

from __future__ import annotations

import argparse
import functools
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--outer", type=int, default=3)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--configs", default="narrow:xla,narrow:auto")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import pim_sort_merge_join_tpu as smj
    from bench.timing import opaque_zero, time_chained_ms
    from pim_sort_merge_join_tpu.columnar.generate import generate_table
    from pim_sort_merge_join_tpu.columnar.table import Table
    from pim_sort_merge_join_tpu.engine.pipeline import pipeline_core

    n = args.rows
    t1 = Table.from_numpy(generate_table(n, seed=1))
    t2 = Table.from_numpy(generate_table(n, seed=2))
    jax.block_until_ready((t1.data, t2.data))
    thr = (3 * n) // 20

    from pim_sort_merge_join_tpu.ops import join as join_mod

    def make_body(spec):
        parts = spec.split(":")
        width, alg = parts[0], parts[1]
        # Optional third field: "kscan" forces the Pallas join-scan kernel,
        # "xscan" forces the XLA scan block -- applied by patching the
        # dispatch threshold just before this config traces.
        scan = parts[2] if len(parts) > 2 else "auto"
        # width: "wide" | "narrow" (int32 keys) | "ndata" (int32 keys AND
        # int32 emit-sort payload planes, config.narrow_data).
        cfg = smj.EngineConfig(
            predicate1=smj.Predicate(0, ">", thr),
            predicate2=smj.Predicate(0, ">", thr),
            narrow_keys=(width in ("narrow", "ndata")),
            narrow_data=(width == "ndata"),
            sort_algorithm=alg,
        )
        core = functools.partial(pipeline_core, config=cfg)

        def body(carry, a, b):
            if scan == "kscan":
                join_mod.JOIN_SCAN_PALLAS_MIN = 0
            elif scan == "xscan":
                join_mod.JOIN_SCAN_PALLAS_MIN = 1 << 62
            ap = a.replace(num_rows=a.num_rows + opaque_zero(carry))
            res = core(ap, b)
            return carry + res.num_rows + res.data[0, 0].astype(jnp.int32)

        return body

    specs = args.configs.split(",")
    bodies = {s: make_body(s) for s in specs}
    results = {s: [] for s in specs}
    for r in range(args.outer):
        for s in specs:
            val = time_chained_ms(
                bodies[s], t1, t2, k1=1, k2=4, reps=args.reps
            )
            results[s].append(round(val, 3))
            print(
                json.dumps({"config": s, "round": r, "wall_ms": round(val, 3)}),
                flush=True,
            )
    for s in specs:
        v = sorted(results[s])
        print(
            json.dumps(
                {
                    "config": s,
                    "rows": n,
                    "min_ms": v[0],
                    "median_ms": v[len(v) // 2],
                    "all_ms": results[s],
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
