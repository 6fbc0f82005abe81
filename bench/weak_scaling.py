"""Weak-scaling harness: rows/s efficiency as the mesh grows.

BASELINE.json's scaling target: >=80% weak-scaling rows/s efficiency from
1 host to a v5p-16 slice. This harness measures the mechanism -- per-shard
work held constant while the mesh axis grows -- on whatever devices exist
(a virtual CPU mesh exercises the same collectives; real efficiency numbers
need real chips, which the driver's environment provides one of today).

Run: python -m bench.weak_scaling [--rows-per-shard 100000] [--meshes 1,2,4,8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def run_weak_scaling(mesh_sizes, rows_per_shard, reps=3, simulator=None):
    if simulator:
        from pim_sort_merge_join_tpu.runner.simulator import use_simulator

        use_simulator(max(mesh_sizes))
    import jax
    from jax.sharding import Mesh

    import pim_sort_merge_join_tpu as smj
    from pim_sort_merge_join_tpu.columnar.generate import generate_table
    from pim_sort_merge_join_tpu.engine.distributed import (
        DistributedQueryPipeline,
        ShardedTable,
    )

    devices = jax.devices()
    records = []
    base_rate = None
    for p in mesh_sizes:
        if p > len(devices):
            print(
                json.dumps({"mesh": p, "skipped": f"only {len(devices)} devices"}),
                flush=True,
            )
            continue
        n = rows_per_shard * p
        rows1 = generate_table(n, seed=1, key_distribution="uniform")
        rows2 = generate_table(n, seed=2, key_distribution="uniform")
        cfg = smj.EngineConfig(
            predicate1=smj.Predicate(0, ">", (3 * n) // 100),
            predicate2=smj.Predicate(0, ">", (3 * n) // 100),
        )
        mesh = Mesh(np.array(devices[:p]), ("p",))
        pipe = DistributedQueryPipeline(cfg, mesh)
        t1 = ShardedTable.from_numpy(rows1, mesh, "p")
        t2 = ShardedTable.from_numpy(rows2, mesh, "p")
        jax.block_until_ready((t1.data, t2.data))
        pipe.run_tables(t1, t2, check_overflow=False)  # compile
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = pipe.run_tables(t1, t2, check_overflow=False)
            times.append(time.perf_counter() - t0)
        rate = 2 * n / np.median(times)
        if base_rate is None:
            base_rate = rate / p
        rec = {
            "mesh": p,
            "rows": n,
            "wall_ms": round(float(np.median(times)) * 1000, 3),
            "rows_per_s": round(rate),
            "efficiency": round(rate / (base_rate * p), 3),
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)
    return records


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-per-shard", type=int, default=100_000)
    ap.add_argument("--meshes", default="1,2,4,8")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--simulator", action="store_true")
    args = ap.parse_args(argv)
    run_weak_scaling(
        [int(m) for m in args.meshes.split(",")],
        args.rows_per_shard,
        reps=args.reps,
        simulator=args.simulator,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
