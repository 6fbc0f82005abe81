"""HBM roofline accounting: is an op at speed-of-light, or leaving it idle?

BASELINE.json asks each operator to run at speed-of-light per chip. The
pipeline is bandwidth-bound (relational ops do ~no FLOPs per byte), so the
roofline is HBM: speed-of-light time = minimum HBM traffic / peak bandwidth.
This module provides the traffic model and the peak-bandwidth table;
`bench/roofline_bench.py` divides measured device time by the model and
emits the fraction.

Traffic model (bytes; row = ncol * itemsize):
  filter     read n rows + write n rows (compaction rewrites in place;
             the sorts-not-scatters compaction moves whole rows once).
  sort       merge sort with VMEM-resident runs: one read+write pass to
             form runs of C elements, then ceil(log2(n/C)) merge passes,
             each one read + one write of the whole table. This is the
             information-theoretic pass structure of any out-of-VMEM
             comparison sort; C comes from `ops/pallas/hbm_sort.choose_sizes`
             for the plane count of the dtype.
  join       read both sorted tables + write the output rows once.

The model is a LOWER bound (perfect fusion, no padding, no metadata), so
fractions are honest: 1.0 is unreachable, and a reported 0.3 means at most
30% of peak was extracted.

The reference has no analog -- its report tabulates wall time only
(BASELINE.md); the SDK's `dpu-profiling memory-transfer` mode (SURVEY.md
S10) measures transfer bandwidth but never relates it to a peak.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

# Peak HBM bandwidth per chip, GB/s (vendor-published specs).
_HBM_PEAK_GBPS = {
    "v5 lite": 819.0,  # v5e
    "v5e": 819.0,
    "v5p": 2765.0,
    "v4": 1228.0,
    "v6e": 1640.0,  # Trillium
    "cpu": 50.0,  # nominal DDR figure for virtual-mesh smoke runs
}


def hbm_peak_gbps(device=None) -> float:
    """Peak HBM GB/s for a jax device (default: first visible device)."""
    import jax

    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "cpu").lower()
    for name, peak in _HBM_PEAK_GBPS.items():
        if name in kind:
            return peak
    return _HBM_PEAK_GBPS["cpu"] if device.platform == "cpu" else 819.0


@dataclass
class TrafficModel:
    filter_bytes: int
    sort_bytes: int
    join_bytes: int

    @property
    def total_bytes(self) -> int:
        return self.filter_bytes + self.sort_bytes + self.join_bytes

    def speed_of_light_ms(self, peak_gbps: float) -> float:
        return self.total_bytes / (peak_gbps * 1e9) * 1e3


def _sort_passes(
    n: int,
    itemsize: int,
    ncol: int,
    *,
    narrow: bool = False,
    unique_keys: bool = True,
) -> int:
    """1 run-formation pass + ceil(log2(n / C)) merge passes.

    planes: key decomposes to itemsize/4 planes + payload planes; narrow
    keys sort as a single int32 plane regardless of table dtype. Since
    round 4 the join's internal sorts run unique_keys=True and carry no
    synthetic tie-break plane (the pipeline model's default); table sorts
    through ``sort_by_key`` still pay one extra int32 tie-break plane --
    model those with ``unique_keys=False`` (advisor r4).
    """
    from pim_sort_merge_join_tpu.ops.pallas.hbm_sort import choose_sizes

    key_planes = 1 if narrow else max(itemsize // 4, 1)
    payload_planes = (ncol - 1) * max(itemsize // 4, 1)
    nplanes = key_planes + payload_planes + (0 if unique_keys else 1)
    chunk, _ = choose_sizes(nplanes)
    return 1 + max(math.ceil(math.log2(max(n, 1) / chunk)), 0)


def pipeline_traffic(
    n1: int,
    n2: int,
    kept1: int,
    kept2: int,
    out_rows: int,
    *,
    ncol: int = 4,
    dtype=np.int64,
    narrow: bool = False,
) -> TrafficModel:
    """Minimum HBM bytes for filter -> sort -> join over two tables.

    ``narrow`` models the int32 narrow-key dispatch: key planes shrink to
    one word, enlarging VMEM runs and (sometimes) shaving a merge pass --
    the narrow row must divide by its OWN lower bound, not the wide one.
    """
    row = ncol * np.dtype(dtype).itemsize
    out_row = (2 * ncol - 1) * np.dtype(dtype).itemsize
    filter_b = (n1 + kept1 + n2 + kept2) * row
    sort_b = (
        _sort_passes(kept1, np.dtype(dtype).itemsize, ncol, narrow=narrow)
        * 2 * kept1
        + _sort_passes(kept2, np.dtype(dtype).itemsize, ncol, narrow=narrow)
        * 2 * kept2
    ) * row
    join_b = (kept1 + kept2) * row + out_rows * out_row
    return TrafficModel(
        filter_bytes=filter_b, sort_bytes=sort_b, join_bytes=join_b
    )


def roofline_fraction(
    measured_ms: float, model: TrafficModel, peak_gbps: float
) -> float:
    """Fraction of HBM peak extracted: SOL time / measured time."""
    if measured_ms <= 0:
        return 0.0
    return model.speed_of_light_ms(peak_gbps) / measured_ms
