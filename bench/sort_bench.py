"""Sort-throughput microbenchmark (M keys/s/chip).

BASELINE.json's per-op metric: keys/s for the per-partition sort, across
backends (XLA sort, Pallas bitonic) and dtypes. Times with device fencing
only; no readbacks inside the loop (see bench.py).

Run: python -m bench.sort_bench [--sizes 1048576,16777216]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def run(sizes, reps=5):
    import jax
    import jax.numpy as jnp

    from pim_sort_merge_join_tpu.ops.pallas.sort_kernel import (
        PALLAS_SORT_MAX,
        sort_pairs_pallas,
    )

    rng = np.random.default_rng(0)
    for n in sizes:
        keys64 = jnp.asarray(rng.integers(0, 3 * n, size=n).astype(np.int64))
        keys32 = keys64.astype(jnp.int32)
        idx = jnp.arange(n, dtype=jnp.int32)

        variants = {
            "xla_sort_i64": jax.jit(
                lambda k, v: jax.lax.sort((k, v), num_keys=1, is_stable=True)
            ),
            "xla_sort_i32": jax.jit(
                lambda k, v: jax.lax.sort((k, v), num_keys=1, is_stable=True)
            ),
        }
        inputs = {
            "xla_sort_i64": (keys64, idx),
            "xla_sort_i32": (keys32, idx),
        }
        if n <= PALLAS_SORT_MAX:
            variants["pallas_bitonic_i32"] = sort_pairs_pallas
            inputs["pallas_bitonic_i32"] = (keys32, idx)

        for name, fn in variants.items():
            a = inputs[name]
            out = jax.block_until_ready(fn(*a))
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                out = jax.block_until_ready(fn(*a))
                times.append(time.perf_counter() - t0)
            med = float(np.median(times))
            print(
                json.dumps(
                    {
                        "bench": name,
                        "n": n,
                        "wall_ms": round(med * 1000, 3),
                        "mkeys_per_s": round(n / med / 1e6, 1),
                    }
                ),
                flush=True,
            )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1048576,16777216")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args(argv)
    run([int(s) for s in args.sizes.split(",")], reps=args.reps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
