"""End-to-end pipeline tests, including the golden result.csv reproduction.

The golden test reproduces the reference benchmark byte-for-byte: running
data1.csv |><| data2.csv through the pipeline must produce exactly the CSV
the reference `app` writes (app.c:719-755). The reference snapshot does not
ship a result.csv, so the expected bytes come from the semantics oracle
(`ops/oracle.pipeline_oracle` == cpu_app.c), which the reference itself used
as its differential baseline (run.py:3-8).
"""

import io
import os

import numpy as np
import pytest

from pim_sort_merge_join_tpu.columnar import csv_io
from pim_sort_merge_join_tpu.config import EngineConfig, Predicate
from pim_sort_merge_join_tpu.engine.pipeline import QueryPipeline
from pim_sort_merge_join_tpu.ops import oracle

REF_DATA = "/root/reference/sort-merge-join/data"


def _ref_csvs():
    p1 = os.path.join(REF_DATA, "data1.csv")
    p2 = os.path.join(REF_DATA, "data2.csv")
    if not (os.path.exists(p1) and os.path.exists(p2)):
        pytest.skip("reference sample data not available")
    return p1, p2


def test_probe_csv():
    p1, _ = _ref_csvs()
    ncol, nrow = csv_io.probe_csv(p1)
    assert ncol == 4
    assert nrow == 100000


def test_load_csv_values():
    p1, _ = _ref_csvs()
    arr = csv_io.load_csv_numpy(p1)
    assert arr.shape == (100000, 4)
    assert arr[0].tolist() == [98007, 266229, 279159, 215321]


def test_pipeline_small_vs_oracle(small_tables, tmp_path):
    r1, r2 = small_tables
    p1, p2 = tmp_path / "a.csv", tmp_path / "b.csv"
    csv_io.write_csv(str(p1), r1)
    csv_io.write_csv(str(p2), r2)
    cfg = EngineConfig(
        predicate1=Predicate(0, ">", 100), predicate2=Predicate(0, ">", 100)
    )
    pipe = QueryPipeline(cfg)
    result = pipe.run_csv(str(p1), str(p2), str(tmp_path / "out.csv"))
    want = oracle.pipeline_oracle(r1, r2, pred1=(0, ">", 100), pred2=(0, ">", 100))
    np.testing.assert_array_equal(result.to_numpy(), want)
    # CSV bytes match an oracle-written CSV.
    buf = io.StringIO()
    csv_io.write_csv(buf, want)
    assert (tmp_path / "out.csv").read_text() == buf.getvalue()


def test_pipeline_duplicates_one_to_one(dup_tables, tmp_path):
    r1, r2 = dup_tables
    cfg = EngineConfig(
        predicate1=Predicate(1, ">", 0), predicate2=Predicate(1, ">", 0)
    )
    from pim_sort_merge_join_tpu.columnar.table import Table

    pipe = QueryPipeline(cfg)
    result = pipe.run_tables(Table.from_numpy(r1), Table.from_numpy(r2))
    want = oracle.pipeline_oracle(r1, r2, pred1=(1, ">", 0), pred2=(1, ">", 0))
    np.testing.assert_array_equal(result.to_numpy(), want)


@pytest.mark.slow
def test_golden_result_csv(tmp_path):
    """The BASELINE.json north-star: byte-exact result.csv on the repo sample."""
    p1, p2 = _ref_csvs()
    pipe = QueryPipeline(EngineConfig())
    out = tmp_path / "result.csv"
    result = pipe.run_csv(p1, p2, str(out))

    rows1 = csv_io.load_csv_numpy(p1)
    rows2 = csv_io.load_csv_numpy(p2)
    want = oracle.pipeline_oracle(rows1, rows2)
    np.testing.assert_array_equal(result.to_numpy(), want)

    buf = io.StringIO()
    csv_io.write_csv(buf, want)
    assert out.read_text() == buf.getvalue()
    # Sanity: the sample join is non-trivial.
    assert want.shape[0] > 1000
    assert want.shape[1] == 7


def test_metrics_emitted(small_tables, tmp_path):
    r1, r2 = small_tables
    p1, p2 = tmp_path / "a.csv", tmp_path / "b.csv"
    csv_io.write_csv(str(p1), r1)
    csv_io.write_csv(str(p2), r2)
    pipe = QueryPipeline(EngineConfig(predicate1=Predicate(0, ">", 0)))
    pipe.run_csv(str(p1), str(p2))
    import json

    stages = json.loads(pipe.metrics_json())["stages"]
    names = [s["stage"] for s in stages]
    assert names == ["ingest", "host_to_device", "execute"]
    assert all(s["wall_s"] >= 0 for s in stages)
