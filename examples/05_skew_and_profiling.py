"""Example 5: skewed joins, partition schemes, and device profiling.

Three round-2 engine capabilities:

- Zipf-skewed join keys (BASELINE config 4): heavy hitters detected from
  the pooled splitter sample are co-partitioned by occurrence rank
  (`exchange/skew.py`), so a key holding 30% of all rows no longer
  overflows one shard's exchange bucket -- the reference's analog is the
  static boundary co-partitioning at app.c:585-633, which cannot rebalance
  a hot key at all.
- `partition_scheme="hash"` (BASELINE config 3): mix(key) % P routing as
  an alternative to range partitioning.
- `engine/profiling.device_trace`: a jax.profiler capture of the run,
  viewable in TensorBoard/Perfetto (the `dpu-profiling` analog; also
  available as `smj-tpu run --profile DIR`).

Run: python examples/05_skew_and_profiling.py [--simulator N]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

if "--simulator" in sys.argv:
    from pim_sort_merge_join_tpu.runner.simulator import use_simulator

    use_simulator(int(sys.argv[sys.argv.index("--simulator") + 1]))

import jax
import numpy as np

import pim_sort_merge_join_tpu as smj
from pim_sort_merge_join_tpu.columnar.generate import generate_table
from pim_sort_merge_join_tpu.engine.distributed import DistributedQueryPipeline
from pim_sort_merge_join_tpu.engine.profiling import device_trace
from pim_sort_merge_join_tpu.ops import oracle

N = 50_000
P = min(len(jax.devices()), 8)

# --- 1. a Zipf-skewed join that naive range partitioning cannot balance ---
rows1 = generate_table(N, seed=1, key_distribution="zipf", zipf_a=1.3)
rows2 = generate_table(N, seed=2, key_distribution="zipf", zipf_a=1.3)
cfg = smj.EngineConfig(
    predicate1=smj.Predicate(1, ">", 0),
    predicate2=smj.Predicate(1, ">", 0),
    exchange_slack=1.5,  # tight: without skew handling this overflows
    splitter_sample=2048,
)
pipe = DistributedQueryPipeline(cfg)
out = pipe.run_arrays(rows1, rows2).to_numpy()
want = oracle.pipeline_oracle(rows1, rows2, pred1=(1, ">", 0), pred2=(1, ">", 0))
assert out.shape == want.shape
print(f"zipf a=1.3 join over {P} shards: {out.shape[0]} rows, "
      f"matches oracle multiset: "
      f"{np.array_equal(out[np.lexsort(out.T[::-1])], want[np.lexsort(want.T[::-1])])}")

# --- 2. the same join, hash-partitioned -----------------------------------
cfg_hash = smj.EngineConfig(
    predicate1=smj.Predicate(1, ">", 0),
    predicate2=smj.Predicate(1, ">", 0),
    partition_scheme="hash",
    exchange_slack=4.0,
    splitter_sample=2048,
)
out_h = DistributedQueryPipeline(cfg_hash).run_arrays(rows1, rows2).to_numpy()
print(f"hash-partitioned: {out_h.shape[0]} rows, same multiset: "
      f"{np.array_equal(out_h[np.lexsort(out_h.T[::-1])], want[np.lexsort(want.T[::-1])])}")

# --- 3. capture a device trace of the whole thing -------------------------
with tempfile.TemporaryDirectory() as td:
    with device_trace(td):
        DistributedQueryPipeline(cfg).run_arrays(rows1, rows2)
    n_files = sum(len(fs) for _, _, fs in os.walk(td))
    print(f"device trace captured: {n_files} file(s) under a temp dir "
          f"(use smj-tpu run --profile DIR to keep one)")
