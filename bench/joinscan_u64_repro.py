"""uint64 join-scan repro: isolate the dtype axis of the wide-kernel bug.

Round-5 evidence: the wide join-scan passes standalone + fori at 4M and
32M with INT64 keys (artifacts/joinscan_wide_r05.json, _32m_), but the
hash-join pipeline -- whose merged keys are UINT64 mix-hash values with
the 2^64-1 pad sentinel -- dies with the deferred InvalidArgument at 10M
rows/table. This driver runs the same three embedding stages with
uint64 keys shaped like the hash path's (full-range values, sentinel
padding) to pin whether the dtype/sentinel pattern alone reproduces it.

Run: python -m bench.joinscan_u64_repro [n]
"""

from __future__ import annotations

import json
import sys


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from pim_sort_merge_join_tpu.ops.pallas.join_scan import join_scan_dest

    n = int(argv[0]) if argv else 1 << 24
    rng = np.random.default_rng(0)
    cap1 = n // 2
    # Full-range uint64 "hash" keys + the uint64-max pad sentinel, sorted,
    # exactly the shape _merged_dest sees on the hash path.
    k = rng.integers(0, 2**63, size=n, dtype=np.uint64) * 2 + (
        rng.integers(0, 2, size=n, dtype=np.uint64)
    )
    k[rng.random(n) < 0.2] = np.iinfo(np.uint64).max
    keys = jnp.asarray(np.sort(k))
    mpos = jnp.asarray(rng.permutation(n).astype(np.int32))

    def stage(name, fn):
        try:
            out = jax.block_until_ready(fn())
            val = int(np.asarray(jax.device_get(out[1])))
            print(json.dumps({"stage": name, "ok": True, "num_out": val}), flush=True)
            return True
        except Exception as e:  # noqa: BLE001
            print(
                json.dumps(
                    {
                        "stage": name,
                        "ok": False,
                        "error": type(e).__name__,
                        "msg": str(e)[:800],
                    }
                ),
                flush=True,
            )
            return False

    stage(
        "standalone_jit",
        lambda: jax.jit(lambda a, b: join_scan_dest(a, b, cap1))(keys, mpos),
    )

    def fori_body():
        def body(c, a, b):
            dest, num = join_scan_dest(a, b, cap1)
            return c + num + dest[0]

        looped = jax.jit(
            lambda c, a, b: jax.lax.fori_loop(
                0, 3, lambda i, cc: body(cc, a, b), c
            )
        )
        out = looped(jnp.int32(0), keys, mpos)
        return (out, out)

    stage("fori_loop_jit", fori_body)

    def sort_then_kernel():
        def body(c, a, b):
            sk, sp = jax.lax.sort((a, b), num_keys=1)
            dest, num = join_scan_dest(sk, sp, cap1)
            return c + num + dest[0]

        looped = jax.jit(
            lambda c, a, b: jax.lax.fori_loop(
                0, 2, lambda i, cc: body(cc, a, b), c
            )
        )
        out = looped(jnp.int32(0), keys, mpos)
        return (out, out)

    stage("sort_plus_kernel_fori", sort_then_kernel)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
