"""Differential test against the reference's OWN executable.

The reference's entire correctness methodology is running `cpu_app` and
`app` side by side on the same inputs (run.py:3-8, test/run.sh:1-31) and
eyeballing the outputs (README.md:63-64). Every other test in this suite
checks the engine against `ops/oracle.py` -- a re-implementation of
cpu_app.c's semantics -- which leaves one loophole: the oracle could share
a misreading of the reference with the engine. This test closes it by
compiling the reference's `cpu_app.c` (host-only C, no DPU dependencies;
cpu_app.c:303-361) with the system gcc, re-enabling its commented-out
result write (cpu_app.c:350), running the binary, and byte-comparing its
result.csv against the engine's.

The reference source is patched ON THE FLY in a temp dir (one sed-style
line edit); nothing from /root/reference is copied into this repo.

Caveats honored here:
  - load_csv parses with atoi (cpu_app.c:70) -- generated inputs must fit
    int32 even though T is int64_t (common.h:1-9).
  - The pipeline is compiled with the stock user.h knobs (select col 0,
    threshold 5000, join key 0) -- the engine runs the same EngineConfig
    defaults.
  - insertion_sort_in_cpu is stable (strict `>` shift, cpu_app.c:182) and
    join advance is 1:1 (cpu_app.c:213-217), matching the engine's stable
    merge + 1:1 semantics, so byte equality must hold even with duplicate
    keys.
"""

from __future__ import annotations

import pathlib
import shutil
import subprocess

import numpy as np
import pytest

REF = pathlib.Path("/root/reference/sort-merge-join")
SOURCES = ["cpu_app.c", "common.h", "user.h", "timer.h"]
WRITE_LINE = (
    '// save_to_csv("result.csv", result_col_num, result_row_num, result);'
)

pytestmark = pytest.mark.skipif(
    not REF.exists() or shutil.which("gcc") is None,
    reason="reference checkout or gcc unavailable",
)


@pytest.fixture(scope="session")
def cpu_app(tmp_path_factory) -> pathlib.Path:
    build = tmp_path_factory.mktemp("refbuild")
    for name in SOURCES:
        shutil.copy(REF / name, build / name)
    src = (build / "cpu_app.c").read_text()
    assert WRITE_LINE in src, "cpu_app.c:350 write line moved; update test"
    (build / "cpu_app.c").write_text(
        src.replace(WRITE_LINE, WRITE_LINE.lstrip("/ "))
    )
    exe = build / "cpu_app"
    subprocess.run(
        ["gcc", "-O2", "-o", str(exe), str(build / "cpu_app.c")],
        check=True,
        capture_output=True,
    )
    return exe


def run_reference(cpu_app: pathlib.Path, d1: pathlib.Path, d2: pathlib.Path) -> bytes:
    """Run the reference binary; returns the bytes of its result.csv."""
    workdir = cpu_app.parent
    out = workdir / "result.csv"
    if out.exists():
        out.unlink()
    subprocess.run(
        [str(cpu_app), str(d1), str(d2)],
        check=True,
        capture_output=True,
        cwd=workdir,
        timeout=600,
    )
    return out.read_bytes()


def run_engine(d1: pathlib.Path, d2: pathlib.Path, out: pathlib.Path) -> bytes:
    import pim_sort_merge_join_tpu as smj

    pipe = smj.QueryPipeline(smj.EngineConfig())
    pipe.run_csv(str(d1), str(d2), str(out))
    return out.read_bytes()


def write_csv(path: pathlib.Path, rows: np.ndarray) -> None:
    ncol = rows.shape[1]
    header = ",".join(f"col{i + 1}" for i in range(ncol))
    body = "\n".join(",".join(str(v) for v in row) for row in rows)
    path.write_text(header + "\n" + body + "\n")


def test_sample_data_byte_match(cpu_app, tmp_path):
    """data1.csv ⋈ data2.csv: the BASELINE.json config-1 contract."""
    want = run_reference(cpu_app, REF / "data/data1.csv", REF / "data/data2.csv")
    got = run_engine(
        REF / "data/data1.csv", REF / "data/data2.csv", tmp_path / "engine.csv"
    )
    assert got == want


@pytest.mark.parametrize("nrow", [777, 3000])
def test_generated_uniform_byte_match(cpu_app, tmp_path, rng, nrow):
    """generate_data.py-style tables: unique col1 in [1, 3N]."""
    from tests.conftest import make_reference_like_tables

    r1, r2 = make_reference_like_tables(rng, nrow)
    d1, d2 = tmp_path / "d1.csv", tmp_path / "d2.csv"
    write_csv(d1, r1)
    write_csv(d2, r2)
    want = run_reference(cpu_app, d1, d2)
    got = run_engine(d1, d2, tmp_path / "engine.csv")
    assert got == want


def test_generated_duplicate_keys_byte_match(cpu_app, tmp_path, rng):
    """Duplicate join keys: 1:1 advance semantics must agree byte-for-byte.

    Keys must still exceed the select threshold (5000) for rows to survive
    the filter, so draw them from a narrow high band with heavy repeats.
    """
    tables = []
    for _ in range(2):
        keys = rng.integers(5001, 5040, size=500)
        rest = rng.integers(1, 100000, size=(500, 3))
        tables.append(np.column_stack([keys, rest]).astype(np.int64))
    d1, d2 = tmp_path / "d1.csv", tmp_path / "d2.csv"
    write_csv(d1, tables[0])
    write_csv(d2, tables[1])
    want = run_reference(cpu_app, d1, d2)
    got = run_engine(d1, d2, tmp_path / "engine.csv")
    assert got == want
