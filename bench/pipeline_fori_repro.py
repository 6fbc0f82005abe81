"""Bisect the round-5 InvalidArgument in the chained 10M pipeline.

bench/hash_vs_smj.py's first timed chain (sort_merge, one_to_one, unique,
narrow keys -- the DEFAULT pipeline path) died with a deferred TPU-runtime
InvalidArgument on this toolchain. This driver reproduces narrowest-first
and bisects the dispatch knobs:

  1. plain jit(pipeline_core) + readback
  2. jit(fori_loop(k=1)) embedding (the timing harness shape)
  3. fori_loop with the Pallas join-scan kernel DISABLED
  4. fori_loop at join_slack default vs 1.5

Run: python -m bench.pipeline_fori_repro [rows]
"""

from __future__ import annotations

import functools
import json
import sys


def main(argv=None):
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import pim_sort_merge_join_tpu as smj
    from bench.timing import opaque_zero
    from pim_sort_merge_join_tpu.columnar.generate import generate_table
    from pim_sort_merge_join_tpu.columnar.table import Table
    from pim_sort_merge_join_tpu.engine.pipeline import pipeline_core
    from pim_sort_merge_join_tpu.ops import join as join_ops

    n = int(argv[0]) if argv else 4_000_000
    thr = (3 * n) // 20
    t1 = Table.from_numpy(generate_table(n, seed=1))
    t2 = Table.from_numpy(generate_table(n, seed=2))
    jax.block_until_ready((t1.data, t2.data))

    def cfg(slack):
        return smj.EngineConfig(
            predicate1=smj.Predicate(0, ">", thr),
            predicate2=smj.Predicate(0, ">", thr),
            join_slack=slack,
            narrow_keys=True,
            narrow_data=True,
        )

    def stage(name, fn):
        try:
            out = fn()
            val = int(out)  # readback = the only true fence
            print(json.dumps({"stage": name, "ok": True, "val": val}), flush=True)
            return True
        except Exception as e:  # noqa: BLE001
            print(
                json.dumps(
                    {
                        "stage": name,
                        "ok": False,
                        "error": type(e).__name__,
                        "msg": str(e)[:500],
                    }
                ),
                flush=True,
            )
            return False

    def chained(core, k):
        def body(c, a, b):
            ap_ = a.replace(num_rows=a.num_rows + opaque_zero(c))
            res = core(ap_, b)
            return c + res.num_rows + res.data[0, 0].astype(jnp.int32)

        looped = jax.jit(
            lambda c, a, b: jax.lax.fori_loop(
                0, k, lambda i, cc: body(cc, a, b), c
            )
        )
        return lambda: looped(jnp.int32(0), t1, t2)

    core15 = functools.partial(pipeline_core, config=cfg(1.5))

    stage("plain_jit", lambda: jax.jit(core15)(t1, t2).num_rows)
    ok1 = stage("fori_k1", chained(core15, 1))
    stage("fori_k3", chained(core15, 3))
    if not ok1:
        # Bisect: kernel off.
        saved = join_ops.JOIN_SCAN_PALLAS_MIN
        join_ops.JOIN_SCAN_PALLAS_MIN = 1 << 62
        stage("fori_k1_noscan", chained(core15, 1))
        join_ops.JOIN_SCAN_PALLAS_MIN = saved
        # Bisect: default slack.
        core20 = functools.partial(pipeline_core, config=cfg(2.0))
        stage("fori_k1_slack2", chained(core20, 1))
    # Repeated-invocation probe: hash_vs_smj dies inside _timed_call's
    # warm+reps loop on this config while single calls pass -- run the
    # SAME compiled chain several times back to back.
    f1 = chained(core15, 1)
    f3 = chained(core15, 3)
    for i in range(4):
        if not stage(f"fori_k1_repeat{i}", f1):
            break
    for i in range(4):
        if not stage(f"fori_k3_repeat{i}", f3):
            break
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
