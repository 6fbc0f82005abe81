"""Minimal repro driver for the wide (two-plane) join-scan kernel bug.

VERDICT r3 weak #2b: the int64 (two key plane) variant of
`ops/pallas/join_scan.join_scan_dest` passes its standalone 20M-element
chip test but raised a TPU-runtime InvalidArgument when embedded in the
pipeline's timing `fori_loop`; the dispatch therefore pins the kernel to
single-plane (<= 32-bit) keys (ops/join.py JOIN_SCAN dispatch). This script
reproduces the exact embedding in isolation, narrowest first:

  1. standalone jit call (known good)
  2. jit(fori_loop) around the bare kernel
  3. jit(fori_loop) around merge-sort + kernel (the pipeline shape)

Run: python -m bench.joinscan_wide_repro [n]
"""

from __future__ import annotations

import json
import sys


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pim_sort_merge_join_tpu.ops.pallas.join_scan import join_scan_dest

    n = int(argv[0]) if argv else 1 << 22
    rng = np.random.default_rng(0)
    cap1 = n // 2
    # Wide int64 keys (values past 2^31 force two live planes) + sentinels.
    k = rng.integers(2**33, 2**40, size=n).astype(np.int64)
    k[rng.random(n) < 0.2] = np.iinfo(np.int64).max
    keys = jnp.asarray(np.sort(k))
    mpos = jnp.asarray(rng.permutation(n).astype(np.int32))

    def stage(name, fn):
        try:
            out = jax.block_until_ready(fn())
            # A readback forces real completion on this transport.
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

    # 1. standalone
    f1 = jax.jit(lambda a, b: join_scan_dest(a, b, cap1))
    stage("standalone_jit", lambda: f1(keys, mpos))

    # 2. fori_loop around the kernel
    def looped(a, b):
        def body(_, carry):
            d, c = join_scan_dest(a, b, cap1)
            return carry + c

        return jax.lax.fori_loop(0, 3, body, jnp.int32(0))

    f2 = jax.jit(looped)
    stage("fori_loop_jit", lambda: (None, f2(keys, mpos)))

    # 3. pipeline shape: sort inside the loop feeding the kernel
    def pipeline_like(a, b):
        def body(_, carry):
            mk, mp = jax.lax.sort((a + carry.astype(a.dtype) * 0, b), num_keys=2)
            d, c = join_scan_dest(mk, mp, cap1)
            return carry + c

        return jax.lax.fori_loop(0, 2, body, jnp.int32(0))

    f3 = jax.jit(pipeline_like)
    stage("sort_plus_kernel_fori", lambda: (None, f3(keys, mpos)))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
