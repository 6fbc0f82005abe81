"""Headline-bench forensics: explain r01 0.727 ms -> r02 1.321 ms.

Runs the 100k-row reference workload under controlled variants:

  honest_narrow   -- tables as loop operands, narrow resolved (r03 default)
  honest_wide     -- tables as loop operands, narrow off
  closure_consts  -- tables CLOSED OVER by the jitted chain (the r01
                     protocol): device constants are embedded in the
                     executable, letting XLA constant-fold data-dependent
                     work at compile time -- the suspected artifact.
  each variant also reports min/median/max over outer repeats.

Run: python -m bench.headline_ab
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

DATA_DIR = "/root/reference/sort-merge-join/data"


def main(argv=None):
    import functools

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import pim_sort_merge_join_tpu as smj
    from bench.timing import opaque_zero, time_chained_ms
    from pim_sort_merge_join_tpu.columnar import csv_io
    from pim_sort_merge_join_tpu.columnar.table import Table
    from pim_sort_merge_join_tpu.engine.pipeline import pipeline_core

    rows1 = csv_io.load_csv_numpy(os.path.join(DATA_DIR, "data1.csv"))
    rows2 = csv_io.load_csv_numpy(os.path.join(DATA_DIR, "data2.csv"))
    t1 = Table.from_numpy(rows1)
    t2 = Table.from_numpy(rows2)
    jax.block_until_ready((t1.data, t2.data))

    def measure(cfg, label, closure=False, k1=2, k2=12):
        core = functools.partial(pipeline_core, config=cfg)
        outer = []
        for _ in range(3):
            if closure:
                # r01 protocol: tables are captured constants, only the
                # carry is a loop operand.
                def body(carry):
                    ap = t1.replace(num_rows=t1.num_rows + opaque_zero(carry))
                    res = core(ap, t2)
                    return carry + res.num_rows

                val = time_chained_ms(lambda c: body(c), k1=k1, k2=k2, reps=5)
            else:
                def body(carry, a, b):
                    ap = a.replace(num_rows=a.num_rows + opaque_zero(carry))
                    res = core(ap, b)
                    return carry + res.num_rows

                val = time_chained_ms(body, t1, t2, k1=k1, k2=k2, reps=5)
            outer.append(val)
        print(
            json.dumps(
                {
                    "bench": label,
                    "k": [k1, k2],
                    "min_ms": round(min(outer), 3),
                    "median_ms": round(sorted(outer)[1], 3),
                    "max_ms": round(max(outer), 3),
                }
            ),
            flush=True,
        )

    wide = smj.EngineConfig(narrow_keys=False)
    narrow = smj.EngineConfig(narrow_keys=True)
    measure(narrow, "honest_narrow")
    measure(wide, "honest_wide")
    measure(wide, "closure_consts_wide", closure=True)
    measure(narrow, "honest_narrow_k1_5", k1=1, k2=5)
    return 0


if __name__ == "__main__":
    sys.exit(main())
