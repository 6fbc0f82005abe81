"""Radix-vs-bitonic A/B (VERDICT r4 next #1; SURVEY section 7 "bitonic or radix").

Measures, on the real chip with the serial-chain slope protocol:

  - the bitonic chunk kernel (`hbm_sort._chunk_sort`) at chunk=S -- the
    run-formation phase of the production sort, restricted to S so it is
    EXACTLY the same work as the radix tile kernel (independent sorted
    S-runs; identical downstream merge machinery would finish either);
  - `radix_tile_sort` at the same S for digit widths 4 and 8, at both
    key_bits=32 (full int32 contract incl. pad sentinel) and key_bits=26
    (the benchmark generator's known [0, 3N) range -- radix's best case);
  - the production bitonic chunk (choose_sizes) and full `hbm_sort` +
    `jax.lax.sort` for context;
  - the global scatter-permutation LSD route (`xla_lsd_radix_sort`) at a
    smaller n (its scatters are the measured 2-12x-worse primitive).

Everything is validated for sortedness once before timing.

Run: python -m bench.radix_bench [n]   (default 2^24)
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
    from pim_sort_merge_join_tpu.ops.pallas.hbm_sort import (
        _chunk_sort,
        choose_sizes,
        hbm_sort,
    )
    from pim_sort_merge_join_tpu.ops.pallas.radix_sort import (
        radix_tile_sort,
        xla_lsd_radix_sort,
    )

    n = int(argv[0]) if argv else 1 << 24
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 3 * n // 2, size=n, dtype=np.int32))
    pos = jnp.arange(n, dtype=jnp.int32)
    planes = jnp.stack([keys.reshape(-1, 128), pos.reshape(-1, 128)])
    rows = n // 128

    def emit(rec):
        print(json.dumps(rec), flush=True)

    emit({"bench": "radix_ab", "n": n, "key_range": 3 * n // 2})

    def check_tiles_sorted(k_sorted, tile):
        k2 = np.asarray(k_sorted).reshape(-1, tile)
        assert (np.diff(k2, axis=1) >= 0).all(), f"tile {tile} not sorted"

    # --- bitonic chunk kernel at matched S + production sizes ------------
    def bitonic_body(chunk):
        def body(c, x):
            out = _chunk_sort(
                x + opaque_zero(c),
                chunk=chunk,
                nkeys=1,
                out_rows=rows,
                interpret=False,
            )
            return c + out[0, 0, 0] + out[1, rows - 1, 127]

        return body

    prod_chunk, _ = choose_sizes(2)
    for chunk in (256, 512, 1024, prod_chunk):
        try:
            out = jax.block_until_ready(
                jax.jit(
                    lambda x, chunk=chunk: _chunk_sort(
                        x, chunk=chunk, nkeys=1, out_rows=rows, interpret=False
                    )
                )(planes)
            )
            check_tiles_sorted(out[0], chunk)
            ms = time_chained_ms(bitonic_body(chunk), planes, k1=2, k2=6, reps=3)
            emit(
                {
                    "case": f"bitonic_chunk_S{chunk}",
                    "ms": round(ms, 2),
                    "mkeys_per_s": round(n / ms / 1e3, 1),
                }
            )
        except Exception as e:  # noqa: BLE001
            emit(
                {
                    "case": f"bitonic_chunk_S{chunk}",
                    "error": type(e).__name__,
                    "msg": str(e)[:300],
                }
            )

    # --- radix tile kernel ----------------------------------------------
    def radix_body(tile, digit_bits, key_bits):
        def body(c, k, p):
            ok, op = radix_tile_sort(
                (k + opaque_zero(c), p),
                tile=tile,
                digit_bits=digit_bits,
                key_bits=key_bits,
            )
            return c + ok[0] + op[n - 1]

        return body

    for tile, dbits, kbits in (
        (256, 8, 32),
        (512, 8, 32),
        (512, 8, 26),
        (512, 4, 26),
        (1024, 8, 26),
    ):
        try:
            ok, _ = jax.block_until_ready(
                jax.jit(
                    lambda k, p, t=tile, d=dbits, kb=kbits: radix_tile_sort(
                        (k, p), tile=t, digit_bits=d, key_bits=kb
                    )
                )(keys, pos)
            )
            check_tiles_sorted(ok, tile)
            ms = time_chained_ms(
                radix_body(tile, dbits, kbits), keys, pos, k1=2, k2=6, reps=3
            )
            emit(
                {
                    "case": f"radix_tile_S{tile}_D{dbits}_kb{kbits}",
                    "passes": -(-kbits // dbits),
                    "ms": round(ms, 2),
                    "mkeys_per_s": round(n / ms / 1e3, 1),
                }
            )
        except Exception as e:  # noqa: BLE001
            emit(
                {
                    "case": f"radix_tile_S{tile}_D{dbits}_kb{kbits}",
                    "error": type(e).__name__,
                    "msg": str(e)[:300],
                }
            )

    # --- context: production sorts at n ----------------------------------
    def hbm_body(c, k, p):
        ok, op = hbm_sort((k + opaque_zero(c), p), num_keys=2, unique_keys=True)
        return c + ok[0] + op[n - 1]

    def xla_body(c, k, p):
        ok, op = jax.lax.sort((k + opaque_zero(c), p), num_keys=2)
        return c + ok[0] + op[n - 1]

    for name, body in (("hbm_sort_full", hbm_body), ("lax_sort", xla_body)):
        try:
            ms = time_chained_ms(body, keys, pos, k1=2, k2=6, reps=3)
            emit(
                {
                    "case": name,
                    "ms": round(ms, 2),
                    "mkeys_per_s": round(n / ms / 1e3, 1),
                }
            )
        except Exception as e:  # noqa: BLE001
            emit({"case": name, "error": type(e).__name__, "msg": str(e)[:300]})

    # --- global scatter LSD route at a reduced n --------------------------
    ns = min(n, 1 << 22)
    ks, ps = keys[:ns], pos[:ns]

    def scatter_body(c, k, p):
        ok, op = xla_lsd_radix_sort(
            (k + opaque_zero(c), p), digit_bits=8, key_bits=26
        )
        return c + ok[0] + op[ns - 1]

    try:
        ok, _ = jax.jit(
            lambda k, p: xla_lsd_radix_sort((k, p), digit_bits=8, key_bits=26)
        )(ks, ps)
        assert (np.diff(np.asarray(ok)) >= 0).all()
        ms = time_chained_ms(scatter_body, ks, ps, k1=1, k2=3, reps=3)
        emit(
            {
                "case": f"xla_scatter_lsd_n{ns}",
                "passes": 4,
                "ms": round(ms, 2),
                "mkeys_per_s": round(ns / ms / 1e3, 1),
            }
        )
    except Exception as e:  # noqa: BLE001
        emit(
            {
                "case": f"xla_scatter_lsd_n{ns}",
                "error": type(e).__name__,
                "msg": str(e)[:300],
            }
        )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
