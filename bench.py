"""Headline benchmark: the reference workload on one TPU chip.

Runs the reference's own benchmark pipeline -- data1.csv |><| data2.csv
(100k rows/table: filter col1>5000, sort by col1, 1:1 merge join; the
workload timed in BASELINE.md) -- on device, and reports steady-state
device execution time against the reference's published total
(37,897.143 ms, NR_DPUS=64 / NR_TASKLETS=16 / CACHE_SIZE=256 on the UPMEM
functional simulator; BASELINE.md table 1).

Timing uses the serial-chain slope protocol in `bench/timing.py`: on this
tunneled transport `block_until_ready` resolves at enqueue (not completion)
and a scalar readback costs a ~25 ms round trip, so per-iteration device
time is extracted as the slope between two chain lengths of a
data-dependent `fori_loop` -- dispatch, RTT, and readback cancel.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}
vs_baseline is the speedup factor (reference_ms / ours_ms; higher is better).
"""

import json
import os
import sys

import numpy as np

REF_TOTAL_MS = 37897.143  # BASELINE.md: 100k rows, CPU->DPU + DPU + DPU->CPU
DATA_DIR = "/root/reference/sort-merge-join/data"


def _load_inputs():
    from pim_sort_merge_join_tpu.columnar import csv_io

    p1 = os.path.join(DATA_DIR, "data1.csv")
    p2 = os.path.join(DATA_DIR, "data2.csv")
    if os.path.exists(p1) and os.path.exists(p2):
        return csv_io.load_csv_numpy(p1), csv_io.load_csv_numpy(p2)
    # Fallback: regenerate the same distribution (generate_data.py semantics).
    from pim_sort_merge_join_tpu.columnar.generate import generate_table

    return (
        generate_table(100_000, seed=1),
        generate_table(100_000, seed=2),
    )


def main():
    import functools

    import jax

    # Persistent compile cache: repeated driver runs skip the ~minutes of
    # (remote) compilation and measure the device, not the compiler.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import pim_sort_merge_join_tpu as smj
    from bench.timing import opaque_zero, time_chained_ms
    from pim_sort_merge_join_tpu.columnar.table import Table
    from pim_sort_merge_join_tpu.engine.pipeline import pipeline_core

    rows1, rows2 = _load_inputs()
    # Resolve narrow_keys="auto" exactly as QueryPipeline.run_csv would:
    # the reference generator's keys are <= 3N (generate_data.py:9), so the
    # default path takes the int32 merge-sort keys.
    config = (
        smj.EngineConfig()
        .resolve_narrow(rows1[:, 0], rows2[:, 0])
        .resolve_narrow_data(rows1, rows2)
    )

    dtype = config.jnp_dtype()
    t1 = Table.from_numpy(rows1, dtype=dtype)
    t2 = Table.from_numpy(rows2, dtype=dtype)
    jax.block_until_ready((t1.data, t2.data))

    core = functools.partial(pipeline_core, config=config)

    # Correctness readback first (row count survives to the final report).
    out = jax.jit(core)(t1, t2)
    expect_rows = int(out.num_rows)
    assert expect_rows > 0, "join produced no rows -- benchmark invalid"

    import jax.numpy as jnp

    def body(carry, a, b):
        # opaque_zero keeps each iteration data-dependent on the last so
        # XLA cannot hoist or overlap the pipeline across iterations.
        ap = a.replace(num_rows=a.num_rows + opaque_zero(carry))
        res = core(ap, b)
        # Fold an element of the DATA into the carry, not just the row
        # count: a body that consumes only num_rows lets XLA dead-code-
        # eliminate the join's emit stage inside the loop, and rounds 1-2
        # silently benchmarked a partial pipeline (see
        # docs/bench_regression_analysis.md).
        return carry + res.num_rows + res.data[0, 0].astype(jnp.int32)

    # Long chains (200 iterations of signal between the two lengths): at
    # 100k rows one pipeline iteration is ~0.5 ms, so short chains drown in
    # the tunnel's multi-ms RTT jitter -- the r01->r02 "regression"
    # (0.727 -> 1.321 ms) was protocol noise, not device time (see
    # docs/bench_regression_analysis.md). Median of 3 independent slopes;
    # measured spread at these settings is <1%.
    runs = [
        time_chained_ms(body, t1, t2, k1=10, k2=210, reps=5) for _ in range(3)
    ]
    value = sorted(runs)[1]

    # 10M-row companion figure (VERDICT r3 weak #4/#8): the 100k workload is
    # ~0.5 ms of device time and its ABSOLUTE value swings with tunnel/
    # session conditions even though the in-process protocol is tight; the
    # 10M-row figure has 300x more signal per iteration and is stable to
    # ~1% across sessions. Reported in the same JSON line so every driver
    # round records both.
    from pim_sort_merge_join_tpu.columnar.generate import generate_table

    n10 = 10_000_000
    r1b = generate_table(n10, seed=1)
    r2b = generate_table(n10, seed=2)
    thr = (3 * n10) // 20
    cfg10 = (
        smj.EngineConfig(
            predicate1=smj.Predicate(0, ">", thr),
            predicate2=smj.Predicate(0, ">", thr),
        )
        .resolve_narrow(r1b[:, 0], r2b[:, 0])
        .resolve_narrow_data(r1b, r2b)
    )
    core10 = functools.partial(pipeline_core, config=cfg10)
    t1b = Table.from_numpy(r1b, dtype=dtype)
    t2b = Table.from_numpy(r2b, dtype=dtype)
    del r1b, r2b
    jax.block_until_ready((t1b.data, t2b.data))

    def body10(carry, a, b):
        ap = a.replace(num_rows=a.num_rows + opaque_zero(carry))
        res = core10(ap, b)
        return carry + res.num_rows + res.data[0, 0].astype(jnp.int32)

    runs10 = [
        time_chained_ms(body10, t1b, t2b, k1=1, k2=4, reps=3) for _ in range(3)
    ]
    value10 = sorted(runs10)[1]

    print(
        json.dumps(
            {
                "metric": "sort_merge_join_pipeline_100k_rows",
                "value": round(value, 3),
                "unit": "ms",
                "vs_baseline": round(REF_TOTAL_MS / value, 1),
                "pipeline_10m_ms": round(value10, 1),
                "pipeline_10m_rows_per_s": round(2 * n10 / (value10 / 1e3)),
                # The 100k value/vs_baseline swing up to 2x with tunnel/
                # session conditions (driver captures across rounds: 0.727 /
                # 1.321 / 1.016 / 0.886 ms for identical code); treat them
                # as a legacy indicator. The 10M figure is the stable
                # headline (~1% session spread).
                "noisy_legacy_metric": True,
                "stable_headline": "pipeline_10m_ms",
            }
        )
    )
    print(
        f"# device={jax.devices()[0]} joined_rows={expect_rows} "
        f"chained-slope timing (bench/timing.py) "
        f"reference_total={REF_TOTAL_MS}ms 10M-row figure: full "
        f"materialization, median of 3 slopes",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
