"""Radix-sort prototype correctness (interpret mode; VERDICT r4 next #1).

Oracle: numpy per-tile / global sorts. The radix kernels are experiment
subjects (bench/radix_bench.py); correctness here keeps the measured A/B
honest -- a wrong kernel's timing is meaningless.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pim_sort_merge_join_tpu.ops.pallas.radix_sort import (
    radix_tile_sort,
    xla_lsd_radix_sort,
)


def _tile_oracle(key, payload, tile):
    k = key.reshape(-1, tile).copy()
    p = payload.reshape(-1, tile).copy()
    for r in range(k.shape[0]):
        order = np.argsort(k[r], kind="stable")
        k[r] = k[r][order]
        p[r] = p[r][order]
    return k.reshape(-1), p.reshape(-1)


@pytest.mark.parametrize("digit_bits", [4, 8])
@pytest.mark.parametrize("tile", [256, 512])
def test_radix_tile_sort_matches_per_tile_oracle(tile, digit_bits):
    rng = np.random.default_rng(7)
    n = 4 * tile
    key = rng.integers(0, 3 * n, size=n, dtype=np.int32)
    # Pad sentinels appear in real masked key columns: include some.
    key[rng.random(n) < 0.1] = np.iinfo(np.int32).max
    payload = rng.integers(np.iinfo(np.int32).min, np.iinfo(np.int32).max,
                           size=n, dtype=np.int32)
    got_k, got_p = radix_tile_sort(
        (jnp.asarray(key), jnp.asarray(payload)),
        tile=tile,
        digit_bits=digit_bits,
        key_bits=32,
        interpret=True,
    )
    want_k, want_p = _tile_oracle(key, payload, tile)
    np.testing.assert_array_equal(np.asarray(got_k), want_k)
    np.testing.assert_array_equal(np.asarray(got_p), want_p)


def test_radix_tile_sort_reduced_key_bits():
    rng = np.random.default_rng(3)
    tile, n = 256, 1024
    key = rng.integers(0, 1 << 20, size=n, dtype=np.int32)
    pos = np.arange(n, dtype=np.int32)
    got_k, got_p = radix_tile_sort(
        (jnp.asarray(key), jnp.asarray(pos)),
        tile=tile,
        digit_bits=8,
        key_bits=20,
        interpret=True,
    )
    want_k, want_p = _tile_oracle(key, pos, tile)
    np.testing.assert_array_equal(np.asarray(got_k), want_k)
    np.testing.assert_array_equal(np.asarray(got_p), want_p)


@pytest.mark.parametrize("digit_bits", [4, 8])
def test_xla_lsd_radix_global(digit_bits):
    rng = np.random.default_rng(11)
    n = 5000
    key = rng.integers(0, 3 * n, size=n, dtype=np.int32)
    payload = rng.integers(-(2**31), 2**31 - 1, size=n, dtype=np.int32)
    got_k, got_p = xla_lsd_radix_sort(
        (jnp.asarray(key), jnp.asarray(payload)),
        digit_bits=digit_bits,
        key_bits=32,
    )
    order = np.argsort(key, kind="stable")
    np.testing.assert_array_equal(np.asarray(got_k), key[order])
    np.testing.assert_array_equal(np.asarray(got_p), payload[order])
