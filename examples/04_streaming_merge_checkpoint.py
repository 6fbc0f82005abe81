"""Example 4: incremental sorted-run merging + stage-checkpointed queries.

Two SDK-level capabilities of the reference, engine-style:

- `ops/merge.py` is the analog of merge_dpu.c + the app.c merge-tree driver
  (app.c:408-547): pre-sorted runs arriving over time (micro-batches, spill
  files) are merged pairwise into one sorted table without re-sorting.
- `engine/checkpoint.py` is the analog of dpu_checkpoint.h: a query
  interrupted after its filter+sort stage resumes at the join.

Run: python examples/04_streaming_merge_checkpoint.py [--simulator N]
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
from pim_sort_merge_join_tpu.columnar.table import Table
from pim_sort_merge_join_tpu.ops.merge import merge_sorted, merge_tree
from pim_sort_merge_join_tpu.ops.sort import sort_by_key

rng = np.random.default_rng(0)

# --- incremental merge: sorted micro-batches -> one sorted table ----------
batches = []
for i in range(4):
    rows = np.column_stack(
        [rng.integers(0, 10_000, 250), rng.integers(0, 100, (250, 3))]
    ).astype(np.int64)
    t = Table.from_numpy(rows, capacity=256)
    batches.append(sort_by_key(t, 0))

merged = jax.jit(lambda *ts: merge_tree(ts, 0))(*batches)
keys = merged.to_numpy()[:, 0]
assert (keys[1:] >= keys[:-1]).all(), "merge_tree output must be sorted"
print(f"merged {len(batches)} sorted runs -> {int(merged.num_rows)} rows, "
      f"capacity {merged.capacity}")

# Streaming flavor: fold each new run into the accumulated table as it lands.
acc = batches[0]
for b in batches[1:]:
    acc = merge_sorted(acc, b, 0)
print(f"streaming fold: {int(acc.num_rows)} rows")

# --- stage-checkpointed query: kill after sort, resume at join ------------
with tempfile.TemporaryDirectory() as ckdir:
    cfg = smj.EngineConfig(
        predicate1=smj.Predicate(0, ">", 500),
        predicate2=smj.Predicate(0, ">", 500),
        checkpoint_dir=ckdir,
    )
    pipe = smj.QueryPipeline(cfg)
    n = 2_000
    r1 = np.column_stack(
        [rng.permutation(np.arange(1, n + 1)), rng.integers(1, n, (n, 3))]
    ).astype(np.int64)
    r2 = np.column_stack(
        [rng.permutation(np.arange(1, n + 1)), rng.integers(1, n, (n, 3))]
    ).astype(np.int64)
    t1, t2 = Table.from_numpy(r1), Table.from_numpy(r2)

    out1 = pipe.run_tables_resumable(t1, t2)  # writes "sorted" checkpoint
    # A fresh pipeline (new process in real life) resumes from the sorted
    # snapshot -- the join runs, the filter+sort stage does not.
    pipe2 = smj.QueryPipeline(cfg)
    out2 = pipe2.run_tables_resumable(t1, t2)
    np.testing.assert_array_equal(out1.to_numpy(), out2.to_numpy())
    assert int(out2.num_rows) > 0
    print(f"resumed query matches: {int(out2.num_rows)} rows")
