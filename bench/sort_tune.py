"""Chunk/tile sensitivity sweep for the HBM-scale Pallas sort.

The reference's report sweeps CACHE_SIZE {64..1024} and NR_TASKLETS {10..16}
(BASELINE.md tables 2-3; knob at common.h:11). The engine's analogous knobs
are hbm_sort's VMEM chunk (phase-A bitonic size, sets the merge-pass count
log2(n/C)) and merge tile T (phase-B VMEM window). choose_sizes() used
C = VMEM/(24*planes), T = VMEM/(40*planes) until this sweep ran; the
measured optimum (artifacts/sort_tune_r05.json: chunk at 2x the 24-divisor
value, tile on the 40-divisor point) moved the chunk divisor to 12
(VERDICT r3 missing #4, resolved round 5).

Run: python -m bench.sort_tune [n] -- times the 2-plane unique-keys sort
(the join's step-1/2 shape after the round-4 tie-break-plane removal).
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

    from bench.timing import opaque_zero, time_chained_ms
    from pim_sort_merge_join_tpu.ops.pallas.hbm_sort import choose_sizes, hbm_sort

    n = int(argv[0]) if argv else 20_000_000
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 3 * n // 2, size=n, dtype=np.int32))
    pos = jnp.arange(n, dtype=jnp.int32)

    auto_c, auto_t = choose_sizes(2)
    print(
        json.dumps({"bench": "sort_tune", "n": n, "auto_chunk": auto_c, "auto_tile": auto_t}),
        flush=True,
    )

    def make_body(chunk, tile):
        def body(c, k, p):
            mk, mp = hbm_sort(
                (k + opaque_zero(c), p),
                num_keys=2,
                unique_keys=True,
                chunk=chunk,
                tile=tile,
            )
            return c + mk[0] + mp[1]

        return body

    chunks = sorted({auto_c // 4, auto_c // 2, auto_c, auto_c * 2})
    tiles = sorted({auto_t // 4, auto_t // 2, auto_t, auto_t * 2})
    for chunk in chunks:
        for tile in tiles:
            if tile > chunk:
                continue
            try:
                ms = time_chained_ms(
                    make_body(chunk, tile), keys, pos, k1=2, k2=6, reps=3
                )
                print(
                    json.dumps(
                        {"chunk": chunk, "tile": tile, "ms": round(ms, 1)}
                    ),
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001 -- VMEM overflow at big cfgs
                print(
                    json.dumps(
                        {
                            "chunk": chunk,
                            "tile": tile,
                            "error": type(e).__name__,
                            "msg": str(e)[:160],
                        }
                    ),
                    flush=True,
                )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
