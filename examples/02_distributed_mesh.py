"""Example 2: the SPMD pipeline over a device mesh.

Runs the same query sharded across all available devices (or a virtual
CPU mesh with --simulator N), with the splitter-sampled all_to_all range
exchange replacing the reference's host merge tree.

Run: python examples/02_distributed_mesh.py [--simulator 8]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


if "--simulator" in sys.argv:
    n = int(sys.argv[sys.argv.index("--simulator") + 1])
    from pim_sort_merge_join_tpu.runner.simulator import use_simulator

    use_simulator(n)

import pim_sort_merge_join_tpu as smj
from pim_sort_merge_join_tpu.columnar.generate import generate_table
from pim_sort_merge_join_tpu.engine.distributed import DistributedQueryPipeline

rows1 = generate_table(100_000, seed=1)
rows2 = generate_table(100_000, seed=2)

config = smj.EngineConfig(
    predicate1=smj.Predicate(0, ">", 5000),
    predicate2=smj.Predicate(0, ">", 5000),
)
pipe = DistributedQueryPipeline(config)
print(f"mesh: {pipe.mesh}")
out = pipe.run_arrays(rows1, rows2)
result = out.to_numpy()
print(f"joined rows: {result.shape[0]}")
print(pipe.metrics_json())
