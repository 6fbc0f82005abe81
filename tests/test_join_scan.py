"""Fused join-rank scan kernel (ops/pallas/join_scan.py): interpret mode.

Pins the two-pass Pallas kernel to the XLA scan-algebra reference
(`ops/join._merged_dest_xla`) on adversarial inputs: duplicate runs that
span tile boundaries, sentinel padding, negative and >2^31 keys (two-plane
decomposition), and empty sides.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pim_sort_merge_join_tpu.columnar.table import key_sentinel
from pim_sort_merge_join_tpu.ops.join import _merged_dest_xla
from pim_sort_merge_join_tpu.ops.pallas.join_scan import join_scan_dest

TILE = 256  # 2 rows x 128 lanes per grid step: forces many cross-tile runs


def _merged(rng, n1, n2, key_pool, dtype=np.int64, sentinel_frac=0.1):
    k1 = rng.choice(key_pool, size=n1)
    k2 = rng.choice(key_pool, size=n2)
    sent = int(key_sentinel(jnp.dtype(dtype)))
    k1[rng.random(n1) < sentinel_frac] = sent
    k2[rng.random(n2) < sentinel_frac] = sent
    keys = np.concatenate([k1, k2]).astype(dtype)
    pos = np.arange(n1 + n2, dtype=np.int32)
    order = np.lexsort((pos, keys))
    return jnp.asarray(keys[order]), jnp.asarray(pos[order].astype(np.int32)), n1


@pytest.mark.parametrize(
    "pool",
    [
        np.arange(1, 4000),                        # mostly unique
        np.arange(1, 8),                           # long duplicate runs
        np.array([-(2**40), -5, 0, 7, 2**40]),     # 2-plane extremes
    ],
)
def test_kernel_matches_xla_reference(rng, pool):
    mkeys, mpos, cap1 = _merged(rng, 700, 900, pool)
    want_dest, want_cnt = _merged_dest_xla(mkeys, mpos, cap1)
    got_dest, got_cnt = join_scan_dest(
        mkeys, mpos, cap1, interpret=True, tile=TILE
    )
    np.testing.assert_array_equal(np.asarray(got_dest), np.asarray(want_dest))
    assert int(got_cnt) == int(want_cnt)


def test_kernel_int32_keys(rng):
    mkeys, mpos, cap1 = _merged(rng, 512, 300, np.arange(1, 50), dtype=np.int32)
    want_dest, want_cnt = _merged_dest_xla(mkeys, mpos, cap1)
    got_dest, got_cnt = join_scan_dest(
        mkeys, mpos, cap1, interpret=True, tile=TILE
    )
    np.testing.assert_array_equal(np.asarray(got_dest), np.asarray(want_dest))
    assert int(got_cnt) == int(want_cnt)


def test_kernel_all_sentinel_and_single_run(rng):
    # Every key dead.
    n = 400
    sent = int(key_sentinel(jnp.int64))
    mkeys = jnp.full((n,), sent, jnp.int64)
    mpos = jnp.arange(n, dtype=jnp.int32)
    want = _merged_dest_xla(mkeys, mpos, 200)
    got = join_scan_dest(mkeys, mpos, 200, interpret=True, tile=TILE)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    assert int(got[1]) == int(want[1]) == 0
    # One giant equal-key run spanning every tile.
    keys = np.full(1000, 42, np.int64)
    pos = np.arange(1000, dtype=np.int32)
    mk, mp = jnp.asarray(keys), jnp.asarray(pos)
    want = _merged_dest_xla(mk, mp, 600)
    got = join_scan_dest(mk, mp, 600, interpret=True, tile=TILE)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    assert int(got[1]) == int(want[1]) == 400
