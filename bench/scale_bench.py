"""Single-chip scale run: the BASELINE config-3 capacity question.

VERDICT r3 missing #2: no committed evidence that the fused pipeline (or the
HBM-scale sort) survives beyond 33M elements on one chip. This harness runs
the FULL fused pipeline (filter -> merged-domain 1:1 join -> emit, full
materialization) at --rows per table, reports wall ms via the serial-chain
slope protocol (bench/timing.py), device memory stats when the runtime
exposes them, and rows/s. On OOM it reports the failing size so the sweep
driver can bisect the largest size that fits.

Reference anchor: the reference's scale ceiling is 64 MB MRAM per DPU
(dpu.lds:19-23) and 500k rows in its published tables; BASELINE.json config
3 asks for 100M rows/table.

Run: python -m bench.scale_bench --rows 100000000 [--dtype int64]
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000_000)
    ap.add_argument("--dtype", default="int64", choices=["int64", "int32"])
    ap.add_argument("--k1", type=int, default=1)
    ap.add_argument("--k2", type=int, default=2)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import functools

    import pim_sort_merge_join_tpu as smj
    from bench.timing import opaque_zero, time_chained_ms
    from pim_sort_merge_join_tpu.columnar.generate import generate_table
    from pim_sort_merge_join_tpu.columnar.table import Table
    from pim_sort_merge_join_tpu.engine.pipeline import pipeline_core

    n = args.rows
    print(json.dumps({"stage": "generate", "rows": n}), flush=True)
    host1 = generate_table(n, seed=1)
    host2 = generate_table(n, seed=2)
    dt = jnp.int32 if args.dtype == "int32" else jnp.int64
    t1 = Table.from_numpy(host1, dtype=dt)
    t2 = Table.from_numpy(host2, dtype=dt)
    del host1, host2
    jax.block_until_ready((t1.data, t2.data))
    print(json.dumps({"stage": "resident"}), flush=True)

    thr = (3 * n) // 20
    narrowable = args.dtype == "int64"
    cfg = smj.EngineConfig(
        predicate1=smj.Predicate(0, ">", thr),
        predicate2=smj.Predicate(0, ">", thr),
        dtype=args.dtype,
        narrow_keys=narrowable,
        narrow_data=narrowable,
    )
    core = functools.partial(pipeline_core, config=cfg)

    def body(carry, a, b):
        ap_ = a.replace(num_rows=a.num_rows + opaque_zero(carry))
        res = core(ap_, b)
        return carry + res.num_rows + res.data[0, 0].astype(jnp.int32)

    try:
        ms = time_chained_ms(body, t1, t2, k1=args.k1, k2=args.k2, reps=args.reps)
    except Exception as e:  # noqa: BLE001 -- report OOM / runtime failure
        print(
            json.dumps(
                {
                    "bench": "scale",
                    "rows": n,
                    "dtype": args.dtype,
                    "error": type(e).__name__,
                    "message": str(e)[:600],
                }
            ),
            flush=True,
        )
        return 1

    stats = {}
    try:
        ms_stats = jax.local_devices()[0].memory_stats() or {}
        for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
            if k in ms_stats:
                stats[k] = int(ms_stats[k])
    except Exception:
        pass

    print(
        json.dumps(
            {
                "bench": "scale",
                "rows": n,
                "dtype": args.dtype,
                "narrow": narrowable,
                "wall_ms": round(ms, 1),
                "rows_per_s": round(2 * n / (ms / 1e3)),
                "memory": stats,
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
