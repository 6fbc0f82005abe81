"""Hash vs sort-merge join comparison (BASELINE north star; VERDICT r3 #5).

Interleaved in-process A/B of the two join algorithms through the SAME
`pipeline_core` entry, at --rows per table, over {one_to_one, inner} x
{unique, zipf} key distributions. Outputs are cross-checked once per config
against the numpy oracle before timing (row counts + content equality after
canonical sorting for inner mode, whose hash-order emit may legally differ
in row order only when duplicate keys exist -- for the timed configs here
the engine orders match the oracle exactly).

Run: python -m bench.hash_vs_smj --rows 10000000
"""

from __future__ import annotations

import argparse
import functools
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--outer", type=int, default=3)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--verify-rows", type=int, default=200_000)
    ap.add_argument(
        "--cpu",
        action="store_true",
        help="force the CPU backend (used to run the correctness gate "
        "quickly; remote TPU compiles make the 8-config gate minutes-slow)",
    )
    ap.add_argument(
        "--skip-verify",
        action="store_true",
        help="skip the oracle gate (run it separately with --cpu "
        "--verify-only first)",
    )
    ap.add_argument("--verify-only", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 1)
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import pim_sort_merge_join_tpu as smj
    from bench.timing import opaque_zero, time_chained_ms
    from pim_sort_merge_join_tpu.columnar.generate import generate_table
    from pim_sort_merge_join_tpu.columnar.table import Table
    from pim_sort_merge_join_tpu.engine.pipeline import pipeline_core
    from pim_sort_merge_join_tpu.ops import oracle

    n = args.rows
    thr = (3 * n) // 20

    def cfg_for(alg, mode):
        return smj.EngineConfig(
            predicate1=smj.Predicate(0, ">", thr),
            predicate2=smj.Predicate(0, ">", thr),
            join_algorithm=alg,
            join_mode=mode,
            join_slack=1.5,
            narrow_keys=(alg == "sort_merge"),
            narrow_data=(alg == "sort_merge"),
        )

    # --- correctness gate at a smaller size (fast, still multi-run) --------
    vn = args.verify_rows
    vthr = (3 * vn) // 20
    import dataclasses

    for dist in () if args.skip_verify else ("unique", "zipf"):
        hv1 = generate_table(vn, seed=11, key_distribution=dist)
        hv2 = generate_table(vn, seed=12, key_distribution=dist)
        tv1, tv2 = Table.from_numpy(hv1), Table.from_numpy(hv2)
        # inner mode on zipf keys cross-products into an output orders of
        # magnitude past any slack; timed configs exclude it, so does the
        # gate.
        modes = ("one_to_one", "inner") if dist == "unique" else ("one_to_one",)
        for mode in modes:
            want = oracle.pipeline_oracle(
                hv1, hv2, pred1=(0, ">", vthr), pred2=(0, ">", vthr), mode=mode
            )
            for alg in ("sort_merge", "hash"):
                c = dataclasses.replace(
                    cfg_for(alg, mode),
                    predicate1=smj.Predicate(0, ">", vthr),
                    predicate2=smj.Predicate(0, ">", vthr),
                    join_slack=4.0,
                )
                got = jax.jit(functools.partial(pipeline_core, config=c))(
                    tv1, tv2
                )
                gn = int(got.num_rows)
                ga = np.asarray(jax.device_get(got.data))[:gn]
                assert gn == want.shape[0], (alg, mode, dist, gn, want.shape)
                if alg == "hash":
                    # The hash path's contract is STREAMING order (table-1
                    # filtered-row order; tests/test_hash_ops.py), the
                    # oracle's is key order: same multiset, canonicalize
                    # before equality.
                    np.testing.assert_array_equal(
                        ga[np.lexsort(ga.T[::-1])],
                        want[np.lexsort(want.T[::-1])],
                    )
                else:
                    np.testing.assert_array_equal(ga, want)
        print(json.dumps({"verified": dist, "rows": vn}), flush=True)

    if args.verify_only:
        return 0

    # --- timed A/B ---------------------------------------------------------
    for dist in ("unique", "zipf"):
        t1 = Table.from_numpy(generate_table(n, seed=1, key_distribution=dist))
        t2 = Table.from_numpy(generate_table(n, seed=2, key_distribution=dist))
        jax.block_until_ready((t1.data, t2.data))
        modes = ("one_to_one", "inner") if dist == "unique" else ("one_to_one",)
        for mode in modes:
            bodies = {}
            for alg in ("sort_merge", "hash"):
                core = functools.partial(pipeline_core, config=cfg_for(alg, mode))

                def body(carry, a, b, core=core):
                    ap_ = a.replace(num_rows=a.num_rows + opaque_zero(carry))
                    res = core(ap_, b)
                    return carry + res.num_rows + res.data[0, 0].astype(jnp.int32)

                bodies[alg] = body
            results = {a: [] for a in bodies}
            for _ in range(args.outer):
                for alg, body in bodies.items():
                    v = time_chained_ms(body, t1, t2, k1=1, k2=3, reps=args.reps)
                    results[alg].append(round(v, 2))
            for alg, vals in results.items():
                s = sorted(vals)
                print(
                    json.dumps(
                        {
                            "bench": "hash_vs_smj",
                            "rows": n,
                            "distribution": dist,
                            "mode": mode,
                            "algorithm": alg,
                            "min_ms": s[0],
                            "median_ms": s[len(s) // 2],
                            "all_ms": vals,
                        }
                    ),
                    flush=True,
                )
    return 0


if __name__ == "__main__":
    sys.exit(main())
