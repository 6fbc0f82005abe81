"""In-pipeline A/B of the WIDE (two-plane int64) join-scan kernel.

VERDICT r4 next #4: the repro driver (bench/joinscan_wide_repro.py) passes
all three embedding stages on the current toolchain
(artifacts/joinscan_wide_r05.json), so ops/join.py re-enables the wide
dispatch (JOIN_SCAN_WIDE_OK). This bench measures what that is worth: the
FULL pipeline at --rows per table with narrow_keys/narrow_data FORCED OFF
(the configuration whose merged-domain scan block runs on two int64 key
planes), kernel vs XLA scans, interleaved. Correctness gate: both variants
must produce identical num_rows and data checksum before timing.

Run: python -m bench.joinscan_wide_ab --rows 10000000
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
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

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
    from pim_sort_merge_join_tpu.ops import join as join_ops

    n = args.rows
    thr = (3 * n) // 20
    cfg = smj.EngineConfig(
        predicate1=smj.Predicate(0, ">", thr),
        predicate2=smj.Predicate(0, ">", thr),
        narrow_keys=False,
        narrow_data=False,
    )
    t1 = Table.from_numpy(generate_table(n, seed=1))
    t2 = Table.from_numpy(generate_table(n, seed=2))
    jax.block_until_ready((t1.data, t2.data))

    core = functools.partial(pipeline_core, config=cfg)

    # --- correctness gate: identical outputs both ways --------------------
    sums = {}
    for wide_ok in (True, False):
        join_ops.JOIN_SCAN_WIDE_OK = wide_ok
        out = jax.jit(core)(t1, t2)
        nr = int(out.num_rows)
        s = int(
            jnp.sum(
                out.data[: out.capacity]
                * (jnp.arange(out.capacity, dtype=out.data.dtype)[:, None] % 97)
            )
        )
        sums[wide_ok] = (nr, s)
        print(
            json.dumps({"gate": "kernel" if wide_ok else "xla", "rows": nr}),
            flush=True,
        )
    assert sums[True] == sums[False], f"wide kernel output mismatch: {sums}"

    # --- timed A/B --------------------------------------------------------
    def make_body(wide_ok):
        def body(carry, a, b):
            join_ops.JOIN_SCAN_WIDE_OK = wide_ok  # trace-time switch
            ap_ = a.replace(num_rows=a.num_rows + opaque_zero(carry))
            res = core(ap_, b)
            return carry + res.num_rows + res.data[0, 0].astype(jnp.int32)

        return body

    results = {"kernel": [], "xla": []}
    for _ in range(args.outer):
        for name, wide_ok in (("kernel", True), ("xla", False)):
            join_ops.JOIN_SCAN_WIDE_OK = wide_ok
            v = time_chained_ms(
                make_body(wide_ok), t1, t2, k1=1, k2=3, reps=args.reps
            )
            results[name].append(round(v, 2))
    join_ops.JOIN_SCAN_WIDE_OK = True
    for name, vals in results.items():
        s = sorted(vals)
        print(
            json.dumps(
                {
                    "bench": "joinscan_wide_ab",
                    "rows": n,
                    "variant": name,
                    "min_ms": s[0],
                    "median_ms": s[len(s) // 2],
                    "all_ms": vals,
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
