"""HBM-scale Pallas sort (ops/pallas/hbm_sort.py): interpret-mode on CPU.

Small chunk/tile overrides force multi-pass merge-path merging so every
phase (chunk bitonic, merge-path metadata, the double-buffered merge
kernel) runs at test size; on TPU the same code compiles (exercised by
bench/sort_bench.py and the `auto` engine path).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pim_sort_merge_join_tpu.ops.pallas.hbm_sort import choose_sizes, hbm_sort

ON_TPU = jax.default_backend() == "tpu"
INTERP = not ON_TPU
CHUNK, TILE = 512, 256  # 4+ chunks at n=2048: multi-pass merging


def _ref_sort(key, *payload):
    order = np.argsort(key, kind="stable")
    return (key[order],) + tuple(p[order] for p in payload)


@pytest.mark.parametrize("n", [512, 2048, 4096])
def test_pair_multi_pass(rng, n):
    keys = rng.integers(0, 1 << 30, size=n).astype(np.int32)
    vals = np.arange(n, dtype=np.int32)
    got = hbm_sort(
        (jnp.asarray(keys), jnp.asarray(vals)),
        interpret=INTERP, chunk=CHUNK, tile=TILE,
    )
    want = _ref_sort(keys, vals)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_non_pow2_length_and_padding(rng):
    n = 1500  # pads to 2048 with sentinel keys
    keys = rng.integers(-(1 << 30), 1 << 30, size=n).astype(np.int32)
    vals = rng.integers(0, 100, size=n).astype(np.int32)
    got = hbm_sort(
        (jnp.asarray(keys), jnp.asarray(vals)),
        interpret=INTERP, chunk=CHUNK, tile=TILE,
    )
    want = _ref_sort(keys, vals)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_stability_on_duplicates(rng):
    n = 2048
    keys = rng.integers(0, 7, size=n).astype(np.int32)  # heavy duplication
    vals = np.arange(n, dtype=np.int32)
    got = hbm_sort(
        (jnp.asarray(keys), jnp.asarray(vals)),
        interpret=INTERP, chunk=CHUNK, tile=TILE,
    )
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(got[1]), order)


@pytest.mark.parametrize(
    "dtype,lo,hi",
    [
        ("int64", -(1 << 60), 1 << 60),
        ("uint64", 0, 1 << 62),
        ("int32", -(1 << 30), 1 << 30),
        ("uint32", 0, 1 << 31),
    ],
)
def test_key_dtypes(rng, dtype, lo, hi):
    n = 1024
    keys = rng.integers(lo, hi, size=n).astype(dtype)
    vals = np.arange(n, dtype=np.int64)
    got = hbm_sort(
        (jnp.asarray(keys), jnp.asarray(vals)),
        interpret=INTERP, chunk=CHUNK, tile=TILE,
    )
    want = _ref_sort(keys, vals)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), w)


@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_float_keys(rng, dtype):
    # Float keys sort in IEEE TOTAL order: -0.0 strictly before +0.0
    # (lax.sort's comparator calls them equal and falls back to stability;
    # documented divergence -- it is visible only on signed-zero ties).
    n = 1024
    keys = (rng.standard_normal(n) * 1e6).astype(dtype)
    keys[:8] = [0.0, -0.0, np.inf, -np.inf, 1.5, -1.5, 1e-300 if dtype == "float64" else 1e-30, -1e-9]
    vals = np.arange(n, dtype=np.int32)
    got = hbm_sort(
        (jnp.asarray(keys), jnp.asarray(vals)),
        interpret=INTERP, chunk=CHUNK, tile=TILE,
    )
    u = keys.view(np.uint32 if dtype == "float32" else np.uint64)
    sign = np.array(1, u.dtype) << (u.dtype.itemsize * 8 - 1)
    mono = np.where(u & sign != 0, ~u, u | sign)
    order = np.argsort(mono, kind="stable")
    np.testing.assert_array_equal(
        np.asarray(got[0]).view(u.dtype), u[order]  # bitwise, signed zeros too
    )
    np.testing.assert_array_equal(np.asarray(got[1]), order)


def test_multi_operand_table_rows(rng):
    # 4-column int64 table: key + 3 payload columns, the engine's row shape.
    n = 2048
    cols = [rng.integers(0, 1 << 40, size=n).astype(np.int64) for _ in range(4)]
    got = hbm_sort(
        tuple(jnp.asarray(c) for c in cols),
        interpret=INTERP, chunk=CHUNK, tile=TILE,
    )
    want = _ref_sort(cols[0], *cols[1:])
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_sort_by_key_hbm_path(rng, monkeypatch):
    """The engine's hbm_pallas algorithm end-to-end on a Table."""
    from pim_sort_merge_join_tpu.columnar.table import Table
    from pim_sort_merge_join_tpu.ops import oracle
    from pim_sort_merge_join_tpu.ops import sort as sort_ops
    from pim_sort_merge_join_tpu.ops.pallas import hbm_sort as H

    if not ON_TPU:
        # Interpret mode + small sizes on CPU.
        monkeypatch.setattr(H, "choose_sizes", lambda p: (CHUNK, TILE))
        real = H.hbm_sort
        monkeypatch.setattr(
            H, "hbm_sort", lambda ops, **kw: real(ops, interpret=True, **kw)
        )
    rows = rng.integers(0, 1 << 20, size=(1000, 4)).astype(np.int64)
    t = Table.from_numpy(rows, capacity=1024)
    got = sort_ops.sort_by_key(t, 0, algorithm="hbm_pallas").to_numpy()
    np.testing.assert_array_equal(got, oracle.sort_oracle(rows, 0))


def test_adaptive_narrow_and_wide_ranges(rng):
    from pim_sort_merge_join_tpu.ops.pallas.hbm_sort import hbm_sort_adaptive

    idx = jnp.arange(4096, dtype=jnp.int32)
    # Narrow span around a huge offset: the rebased single-plane branch.
    base = np.int64(2**40)
    knar = jnp.asarray(base + rng.integers(0, 2**20, size=4096).astype(np.int64))
    # Full-range span: the wide two-plane branch.
    kwide = jnp.asarray(
        rng.integers(-(2**62), 2**62, size=4096).astype(np.int64)
    )
    for keys in (knar, kwide):
        for wide_alg in ("hbm", "xla"):
            got_k, got_v = hbm_sort_adaptive(
                (keys, idx),
                interpret=INTERP,
                chunk=CHUNK,
                tile=TILE,
                wide_algorithm=wide_alg,
            )
            want_k, want_v = jax.lax.sort((keys, idx), num_keys=1, is_stable=True)
            np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want_k))
            np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


def test_adaptive_padded_sentinel_keys(rng):
    """Padded tables carry dtype-max sentinel keys: the range probe must
    ignore them (ADVICE r3 medium) so the rebased single-plane path engages,
    and sentinels must still sort last and survive the rebase roundtrip."""
    from pim_sort_merge_join_tpu.ops.pallas.hbm_sort import hbm_sort_adaptive

    n, cap = 3000, 4096
    sent = np.iinfo(np.int64).max
    base = np.int64(2**40)
    keys = np.full(cap, sent, dtype=np.int64)
    keys[:n] = base + rng.integers(0, 2**20, size=n).astype(np.int64)
    kj = jnp.asarray(keys)
    idx = jnp.arange(cap, dtype=jnp.int32)
    got_k, got_v = hbm_sort_adaptive(
        (kj, idx), interpret=INTERP, chunk=CHUNK, tile=TILE
    )
    want_k, want_v = jax.lax.sort((kj, idx), num_keys=1, is_stable=True)
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want_k))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    # The narrow branch really ran: every sentinel is at the tail.
    assert (np.asarray(got_k)[n:] == sent).all()


def test_sort_by_key_hbm_adaptive_padded_table(rng, monkeypatch):
    """sort_by_key(algorithm='hbm_adaptive') on a padded table (num_rows <
    capacity): pins the sentinel handling end-to-end (ADVICE r3 low)."""
    import pim_sort_merge_join_tpu.ops.pallas.hbm_sort as hs
    from pim_sort_merge_join_tpu.columnar.table import Table
    from pim_sort_merge_join_tpu.ops.sort import sort_by_key

    orig = hs.hbm_sort

    def patched(ops, **kw):
        kw.update(interpret=INTERP, chunk=CHUNK, tile=TILE)
        return orig(ops, **kw)

    monkeypatch.setattr(hs, "hbm_sort", patched)
    rows = np.column_stack(
        [
            2**40 + rng.integers(0, 2**20, 3000),
            rng.integers(0, 99, (3000, 3)),
        ]
    ).astype(np.int64)
    t = Table.from_numpy(rows, capacity=4096)
    want = sort_by_key(t, 0, algorithm="xla").to_numpy()
    got = sort_by_key(t, 0, algorithm="hbm_adaptive").to_numpy()
    np.testing.assert_array_equal(got, want)


def test_sort_by_key_narrow_param(rng):
    from pim_sort_merge_join_tpu.columnar.table import Table
    from pim_sort_merge_join_tpu.ops.sort import sort_by_key

    rows = np.column_stack(
        [rng.integers(-500, 500, 300), rng.integers(0, 99, (300, 3))]
    ).astype(np.int64)
    t = Table.from_numpy(rows, capacity=384)
    wide = sort_by_key(t, 0, algorithm="xla").to_numpy()
    narrow = sort_by_key(t, 0, algorithm="xla", narrow=True).to_numpy()
    np.testing.assert_array_equal(narrow, wide)


def test_choose_sizes_vmem_bounded():
    for planes in (2, 3, 5, 9, 17):
        c, t = choose_sizes(planes)
        assert t <= c
        assert c >= 256 and t >= 256
        # chunk kernel working set stays within the ~16 MB/core VMEM. The
        # 12-byte/element/plane budget is measured, not assumed: the r5
        # chunk sweep ran 2x the former 24-byte-budget chunk on-chip and
        # it both fit and won (artifacts/sort_tune_r05.json).
        assert 12 * planes * c <= 16 * 1024 * 1024


def test_unique_keys_skips_synthetic_plane(rng):
    """unique_keys=True: permutation keys, payload rides, result matches
    the stable XLA sort exactly (stability vacuous for unique keys)."""
    n = 2048
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    pay = jnp.asarray(rng.integers(-(2**62), 2**62, n).astype(np.int64))
    got = hbm_sort(
        (perm, pay), interpret=INTERP, chunk=CHUNK, tile=TILE, unique_keys=True
    )
    want = jax.lax.sort((perm, pay), num_keys=1, is_stable=True)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_num_keys_two_with_sentinel_ties(rng):
    """num_keys=2 + unique_keys: duplicate primary keys (including runs of
    the INT32_MAX narrow sentinel) disambiguated by the arange second key --
    the join's step-1 configuration. Must equal the stable 1-key sort."""
    n = 2048
    keys = rng.integers(0, 50, n).astype(np.int32)
    keys[rng.choice(n, 200, replace=False)] = np.iinfo(np.int32).max
    kj = jnp.asarray(keys)
    pos = jnp.arange(n, dtype=jnp.int32)
    got = hbm_sort(
        (kj, pos), interpret=INTERP, chunk=CHUNK, tile=TILE,
        num_keys=2, unique_keys=True,
    )
    want = jax.lax.sort((kj, pos), num_keys=1, is_stable=True)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_num_keys_two_with_payload(rng):
    n = 2048
    k1 = jnp.asarray(rng.integers(0, 9, n).astype(np.int32))
    k2 = jnp.asarray(rng.permutation(n).astype(np.int32))
    pay = jnp.asarray(rng.integers(0, 10**12, n).astype(np.int64))
    got = hbm_sort(
        (k1, k2, pay), interpret=INTERP, chunk=CHUNK, tile=TILE,
        num_keys=2, unique_keys=True,
    )
    want = jax.lax.sort((k1, k2, pay), num_keys=2, is_stable=True)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_num_keys_two_int64_primary(rng):
    """64-bit primary key (2 planes) + int32 second key, unique_keys: the
    wide-key join step-1 configuration."""
    n = 2048
    k1 = jnp.asarray(rng.integers(-(2**60), 2**60, n).astype(np.int64))
    pos = jnp.arange(n, dtype=jnp.int32)
    got = hbm_sort(
        (k1, pos), interpret=INTERP, chunk=CHUNK, tile=TILE,
        num_keys=2, unique_keys=True,
    )
    want = jax.lax.sort((k1, pos), num_keys=2, is_stable=True)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
