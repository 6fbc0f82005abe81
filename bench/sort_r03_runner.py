"""Focused round-3 sort artifact: i64 Pallas-vs-XLA, measured (not extrapolated).

VERDICT.md round-2 ask 1(b)/6: measure `hbm_sort` against `jax.lax.sort`
for the DEFAULT int64 dtype at 16M/32M (and the adaptive single-plane
rebase that reference-distribution keys take), so the auto-dispatch
crossover is a measurement. A subset of bench/sort_bench.py's variants --
the full matrix costs hours of cold remote compilation on this transport.

Run: python -m bench.sort_r03_runner [--sizes ...] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def run(sizes, reps=3, out_path=None):
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from bench.timing import opaque_zero, time_chained_ms
    from pim_sort_merge_join_tpu.ops.pallas.hbm_sort import (
        hbm_sort,
        hbm_sort_adaptive,
    )

    records = []
    rng = np.random.default_rng(0)
    for n in sizes:
        # Reference distribution: keys in [0, 3N) -- always < 2^31 at these
        # sizes, so the adaptive kernel's single-plane rebase can engage.
        keys64 = jnp.asarray(rng.integers(0, 3 * n, size=n).astype(np.int64))
        idx = jnp.arange(n, dtype=jnp.int32)

        variants = {
            "xla_sort_i64": lambda k, v: jax.lax.sort(
                (k, v), num_keys=1, is_stable=True
            ),
            "hbm_pallas_i64": lambda k, v: hbm_sort((k, v)),
            "hbm_adaptive_i64": lambda k, v: hbm_sort_adaptive((k, v)),
        }
        for name, fn in variants.items():

            def body(carry, k, v, fn=fn):
                kp = k.at[0].add(opaque_zero(carry).astype(k.dtype))
                out_k, out_v = fn(kp, v)
                return carry + out_v[n // 2]

            med_ms = time_chained_ms(body, keys64, idx, k1=1, k2=5, reps=reps)
            rec = {
                "bench": name,
                "n": n,
                "wall_ms": round(med_ms, 3),
                "mkeys_per_s": round(n / (med_ms / 1e3) / 1e6, 1),
            }
            records.append(rec)
            print(json.dumps(rec), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
    return records


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="16777216,33554432")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    run([int(s) for s in args.sizes.split(",")], reps=args.reps, out_path=args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
