"""Pallas bitonic sort kernel tests (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pim_sort_merge_join_tpu.ops.pallas.sort_kernel import (
    bitonic_sort_xla,
    sort_pairs_pallas,
)

ON_TPU = jax.default_backend() == "tpu"


@pytest.mark.parametrize("n", [256, 1024, 4096])
def test_bitonic_network_xla(rng, n):
    keys = rng.integers(0, 1 << 30, size=n).astype(np.int32)
    vals = np.arange(n, dtype=np.int32)
    k, v = bitonic_sort_xla(jnp.asarray(keys), jnp.asarray(vals))
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(k), keys[order])
    np.testing.assert_array_equal(np.asarray(v), order)


def test_bitonic_network_duplicates_stable(rng):
    keys = rng.integers(0, 8, size=512).astype(np.int32)
    vals = np.arange(512, dtype=np.int32)
    k, v = bitonic_sort_xla(jnp.asarray(keys), jnp.asarray(vals))
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(v), order)


@pytest.mark.parametrize("n", [256, 300, 1024, 5000])
def test_sort_pairs_pallas_interpret(rng, n):
    keys = rng.integers(0, 1 << 30, size=n).astype(np.int32)
    vals = np.arange(n, dtype=np.int32)
    k, v = sort_pairs_pallas(
        jnp.asarray(keys), jnp.asarray(vals), interpret=not ON_TPU
    )
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(k), keys[order])
    np.testing.assert_array_equal(np.asarray(v), order)


def test_sort_by_key_pallas_path(rng):
    from pim_sort_merge_join_tpu.columnar.table import Table
    from pim_sort_merge_join_tpu.ops import sort as sort_ops
    from pim_sort_merge_join_tpu.ops import oracle

    if not ON_TPU:
        pytest.skip("pallas compiled path needs TPU; network tested in interpret")
    rows = rng.integers(0, 1 << 20, size=(1000, 4)).astype(np.int64)
    t = Table.from_numpy(rows, capacity=1024)
    got = sort_ops.sort_by_key(t, 0, algorithm="pallas_bitonic").to_numpy()
    np.testing.assert_array_equal(got, oracle.sort_oracle(rows, 0))
