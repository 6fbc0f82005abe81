"""Bisect the Mosaic compile crash of the radix tile kernel.

The remote compiler returns an opaque HTTP 500 (tpu_compile_helper exit 1)
for ops/pallas/radix_sort.radix_tile_sort; this probe AOT-compiles stripped
variants, narrowest first, to find the construct that kills it. Small
shapes -> ~30-60 s per compile.

Run: python -m bench.radix_compile_probe
"""

from __future__ import annotations

import functools
import json
import sys


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    S, V = 256, 256
    n = 4 * S
    key = jnp.asarray(np.random.default_rng(0).integers(0, 1000, (n, 1), dtype=np.int32))

    def run_case(name, kernel, nout=1):
        spec = pl.BlockSpec((S, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
        try:
            f = pl.pallas_call(
                kernel,
                grid=(n // S,),
                in_specs=[spec],
                out_specs=[spec] * nout,
                out_shape=[jax.ShapeDtypeStruct((n, 1), jnp.int32)] * nout,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ),
            )
            out = jax.block_until_ready(f(key))
            print(json.dumps({"case": name, "ok": True,
                              "v0": int(np.asarray(out[0])[0, 0])}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"case": name, "ok": False,
                              "error": type(e).__name__,
                              "msg": str(e)[:400]}), flush=True)

    dot = functools.partial(jax.lax.dot_general,
                            preferred_element_type=jnp.float32)

    # 1. identity through [S,1] block (is the block shape itself OK?)
    def k_ident(in_ref, out_ref):
        out_ref[...] = in_ref[...]

    run_case("ident_S1_block", k_ident)

    # 2. one-hot + standard matmul (tril @ oh)
    def k_onehot_mm(in_ref, out_ref):
        d = in_ref[...] & jnp.int32(V - 1)
        vcol = jax.lax.broadcasted_iota(jnp.int32, (S, V), 1)
        oh = (d == vcol).astype(jnp.float32)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        tril = (col_i <= row_i).astype(jnp.float32)
        pre = dot(tril, oh, (((1,), (0,)), ((), ())))
        out_ref[...] = jnp.sum(oh * pre, axis=1, keepdims=True).astype(jnp.int32)

    run_case("onehot_tril_matmul", k_onehot_mm)

    # 3. lane-axis reduction to [1, V] then strict-upper matmul
    def k_base(in_ref, out_ref):
        d = in_ref[...] & jnp.int32(V - 1)
        vcol = jax.lax.broadcasted_iota(jnp.int32, (S, V), 1)
        oh = (d == vcol).astype(jnp.float32)
        hist = jnp.sum(oh, axis=0, keepdims=True)  # [1, V]
        vr = jax.lax.broadcasted_iota(jnp.int32, (V, V), 0)
        vc = jax.lax.broadcasted_iota(jnp.int32, (V, V), 1)
        upper = (vr < vc).astype(jnp.float32)
        base = dot(hist, upper, (((1,), (0,)), ((), ())))  # [1, V]
        out_ref[...] = jnp.sum(oh * base, axis=1, keepdims=True).astype(jnp.int32)

    run_case("hist_base_matmul", k_base)

    # 4. dim0-contraction dot_general (the permute step's form)
    def k_dim0(in_ref, out_ref):
        x = in_ref[...].astype(jnp.float32)  # [S, 1]
        col_i = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        d = in_ref[...] % jnp.int32(S)
        m = (d == col_i).astype(jnp.float32)  # [S, S]
        y = dot(m, x, (((0,), (0,)), ((), ())))  # contract dim0 x dim0
        out_ref[...] = y.astype(jnp.int32)

    run_case("dim0_contraction", k_dim0)

    # 5. same permute as transpose + standard matmul
    def k_transpose_mm(in_ref, out_ref):
        x = in_ref[...].astype(jnp.float32)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        d = in_ref[...] % jnp.int32(S)
        m = (d == col_i).astype(jnp.float32)
        mt = jnp.transpose(m)
        y = dot(mt, x, (((1,), (0,)), ((), ())))
        out_ref[...] = y.astype(jnp.int32)

    run_case("transpose_matmul", k_transpose_mm)

    # 6. full single radix pass (everything together, one pass, D=8)
    from pim_sort_merge_join_tpu.ops.pallas.radix_sort import _radix_tile_kernel

    def k_full1(in_ref, out_ref):
        _radix_tile_kernel(in_ref, out_ref, tile=S, digit_bits=8,
                           key_bits=8, nops=1)

    run_case("full_one_pass_D8", k_full1)

    # 7. full four passes
    def k_full4(in_ref, out_ref):
        _radix_tile_kernel(in_ref, out_ref, tile=S, digit_bits=8,
                           key_bits=32, nops=1)

    run_case("full_four_pass_D8", k_full4)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
