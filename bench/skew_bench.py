"""Zipf-skewed join benchmark (heavy-hitter keys).

BASELINE.json config 4: joins whose key distribution is Zipf-skewed, which
breaks naive equal-width range partitioning. Measures the distributed
pipeline's balance under skew: per-shard received-row spread (from the
exchange diagnostics) and wall time, at increasing skew exponents.

Run: python -m bench.skew_bench [--rows 200000] [--simulator 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def run(rows, zipf_as, *, simulator=None, slack=4.0, reps=3):
    if simulator:
        from pim_sort_merge_join_tpu.runner.simulator import use_simulator

        use_simulator(simulator)
    import jax
    from jax.sharding import Mesh

    import pim_sort_merge_join_tpu as smj
    from pim_sort_merge_join_tpu.columnar.generate import generate_table
    from pim_sort_merge_join_tpu.engine.distributed import (
        DistributedQueryPipeline,
        ShardedTable,
    )
    from pim_sort_merge_join_tpu.engine.errors import ExchangeOverflowError

    devices = jax.devices()
    p = min(len(devices), 8)
    mesh = Mesh(np.array(devices[:p]), ("p",))
    for a in zipf_as:
        kw = (
            {"key_distribution": "zipf", "zipf_a": a}
            if a > 0
            else {"key_distribution": "uniform"}
        )
        rows1 = generate_table(rows, seed=1, **kw)
        rows2 = generate_table(rows, seed=2, **kw)
        cfg = smj.EngineConfig(
            predicate1=smj.Predicate(1, ">", 0),
            predicate2=smj.Predicate(1, ">", 0),
            exchange_slack=slack,
            splitter_sample=4096,
        )
        pipe = DistributedQueryPipeline(cfg, mesh)
        t1 = ShardedTable.from_numpy(rows1, mesh, "p")
        t2 = ShardedTable.from_numpy(rows2, mesh, "p")
        try:
            pipe.run_tables(t1, t2)  # compile + overflow check
            times = []
            out = None
            for _ in range(reps):
                t0 = time.perf_counter()
                out = pipe.run_tables(t1, t2, check_overflow=False)
                times.append(time.perf_counter() - t0)
            counts = np.asarray(jax.device_get(out.counts))
            rec = {
                "zipf_a": a,
                "rows": rows,
                "wall_ms": round(float(np.median(times)) * 1000, 3),
                "out_rows": int(counts.sum()),
                "shard_balance": round(
                    float(counts.max() / max(counts.mean(), 1)), 2
                ),
            }
        except ExchangeOverflowError as e:
            rec = {
                "zipf_a": a,
                "rows": rows,
                "overflow": True,
                "max_true_rows": max(e.true_rows),
                "capacity": e.capacity,
            }
        print(json.dumps(rec), flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--zipf", default="0,1.1,1.3,1.7")
    ap.add_argument("--slack", type=float, default=4.0)
    ap.add_argument("--simulator", type=int, default=None)
    args = ap.parse_args(argv)
    run(
        args.rows,
        [float(a) for a in args.zipf.split(",")],
        simulator=args.simulator,
        slack=args.slack,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
