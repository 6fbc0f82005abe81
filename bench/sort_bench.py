"""Sort-throughput microbenchmark (M keys/s/chip).

BASELINE.json's per-op metric: keys/s for the per-partition sort, across
backends (XLA sort, Pallas bitonic) and dtypes. Timed with the serial-chain
slope protocol (`bench/timing.py`) -- the only honest device timing on this
transport.

Run: python -m bench.sort_bench [--sizes 1048576,16777216]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def run(sizes, reps=5):
    import jax
    import jax.numpy as jnp

    # Persistent compile cache: chained-slope programs at these sizes take
    # minutes to (remotely) compile; repeated runs should time the device.
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
    from pim_sort_merge_join_tpu.ops.pallas.sort_kernel import (
        PALLAS_SORT_MAX,
        sort_pairs_pallas,
    )

    rng = np.random.default_rng(0)
    for n in sizes:
        keys64 = jnp.asarray(rng.integers(0, 3 * n, size=n).astype(np.int64))
        keys32 = keys64.astype(jnp.int32)
        # Full-range 64-bit keys: the adaptive rebase CANNOT trigger; the
        # honest wide-path number.
        keys64_full = jnp.asarray(
            rng.integers(-(2**62), 2**62, size=n).astype(np.int64)
        )
        idx = jnp.arange(n, dtype=jnp.int32)

        def xla_sort(k, v):
            return jax.lax.sort((k, v), num_keys=1, is_stable=True)

        def hbm(k, v):
            return hbm_sort((k, v))

        def hbm_adapt(k, v):
            return hbm_sort_adaptive((k, v))

        variants = {
            "xla_sort_i64": (xla_sort, keys64),
            "xla_sort_i32": (xla_sort, keys32),
            "xla_sort_i64_fullrange": (xla_sort, keys64_full),
        }
        # Pallas kernels only compile for TPU; off-TPU this bench still
        # reports the XLA rows so the harness degrades instead of crashing.
        if jax.default_backend() not in ("cpu",):
            variants["hbm_pallas_i64"] = (hbm, keys64)
            variants["hbm_pallas_i32"] = (hbm, keys32)
            # Range-adaptive: reference-distribution keys (<= 3N) take the
            # rebased single-plane branch; full-range keys the wide branch.
            variants["hbm_adaptive_i64"] = (hbm_adapt, keys64)
            variants["hbm_adaptive_i64_fullrange"] = (hbm_adapt, keys64_full)
            if n <= PALLAS_SORT_MAX:
                variants["pallas_bitonic_i32"] = (sort_pairs_pallas, keys32)

        for name, (fn, keys) in variants.items():

            def body(carry, k, v, fn=fn):
                # Data-dependent perturbation of one key defeats loop
                # hoisting; folding a sorted output element back into the
                # carry serializes iterations on device.
                kp = k.at[0].add(opaque_zero(carry).astype(k.dtype))
                out_k, out_v = fn(kp, v)
                return carry + out_v[n // 2]

            med_ms = time_chained_ms(body, keys, idx, k1=1, k2=5, reps=reps)
            print(
                json.dumps(
                    {
                        "bench": name,
                        "n": n,
                        "wall_ms": round(med_ms, 3),
                        "mkeys_per_s": round(n / (med_ms / 1e3) / 1e6, 1),
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
