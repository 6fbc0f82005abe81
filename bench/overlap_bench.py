"""Exchange/compute overlap A/B: exchange_chunks=1 vs 4 (VERDICT round-2 #5).

`exchange_chunks` splits each table's all_to_all into independent
collectives so XLA's latency-hiding scheduler can overlap one table's
exchange with the other table's local compute (the DPU_XFER_ASYNC +
dpu_callback analog, dpu.h:72-82,:651). Round 2 proved bit-identity but
never measured whether overlap HAPPENS. This bench runs the largest honest
configuration available without a multi-chip slice: 2 OS processes x 4
virtual CPU devices with real Gloo collectives on the process boundary,
timing steady-state `run_tables` calls at millions of rows for chunks in
{1, 4}.

Caveat recorded with the artifact: on this backend the collectives cross a
process boundary but not a real ICI link, so the measured delta bounds the
scheduling effect, not ICI bandwidth overlap. The single real chip cannot
host a multi-device mesh (its 1-device all_to_all is the identity).

Run: python -m bench.overlap_bench [--rows 2000000] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def run_pair(p1, p2, sel, chunks, reps, timeout=1800):
    port = _free_port()
    procs = []
    for pid in (0, 1):
        cmd = [
            sys.executable, "-m", "pim_sort_merge_join_tpu.runner.multihost",
            p1, p2, "--coordinator", f"localhost:{port}",
            "--num-processes", "2", "--process-id", str(pid),
            "--cpu-devices", "4",
            "--select-val1", str(sel), "--select-val2", str(sel),
            "--exchange-slack", "3.0",
            "--exchange-chunks", str(chunks),
            "--bench-reps", str(reps),
        ]
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        procs.append(
            subprocess.Popen(
                cmd, cwd=REPO, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            )
        )
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=timeout)
        outs.append((p.returncode, stdout, stderr))
    for rc, _, stderr in outs:
        if rc != 0:
            raise RuntimeError(f"worker failed:\n{stderr.decode()[-2000:]}")
    line = outs[0][1].decode().strip().splitlines()[-1]
    return json.loads(line)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from pim_sort_merge_join_tpu.columnar import csv_io
    from pim_sort_merge_join_tpu.columnar.generate import generate_table

    n = args.rows
    tmp = tempfile.mkdtemp(prefix="overlap_bench_")
    p1 = os.path.join(tmp, "d1.csv")
    p2 = os.path.join(tmp, "d2.csv")
    csv_io.write_csv(p1, generate_table(n, seed=1))
    csv_io.write_csv(p2, generate_table(n, seed=2))
    sel = (3 * n) // 20

    records = []
    for chunks in (1, 4):
        rec = run_pair(p1, p2, sel, chunks, args.reps)
        records.append(rec)
        print(json.dumps(rec), flush=True)
    base = records[0]["median_ms"]
    split = records[1]["median_ms"]
    summary = {
        "bench": "overlap_ab_summary",
        "rows": n,
        "chunks1_median_ms": base,
        "chunks4_median_ms": split,
        "speedup": round(base / split, 3) if split else None,
    }
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            for r in records + [summary]:
                f.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
