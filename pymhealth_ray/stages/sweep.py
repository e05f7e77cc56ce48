"""Distributed sweep-line over intervals: peak concurrency per period.

The classic "how many sessions were open at once" question is a global
time-ordered scan — the one shape a per-entity bucket exchange cannot
answer, because concurrency mixes every entity at every instant. The
scalable plan is the interval → ±1 delta encoding plus the distributed
ordered prefix sum (stages/rank.ordered_prefix_sum: range-bucket by time,
per-bucket sort+cumsum, O(bins) bucket totals through the driver) — the
same parallel-scan primitive GPU/MPP engines use for sweep lines.

Tie discipline: deltas are ordered by ``key = t*2 + (1 if +1 else 0)`` so
at any timestamp every -1 (interval close, applied at end+1) lands before
every +1. Within a run of equal keys the rows are interchangeable (+k of
identical deltas produce the same multiset of running values under any
permutation), so a per-period MAX of the running sum is exact and
partitioning-independent — all int64 arithmetic.

Scale notes: the delta table is 2x the interval count and the only
exchange is the range-bucketed scan; output is one row per active period.
Periods with no interval boundary carry no row: the level is constant
across them and equals the previous active period's entering level plus
its delta sum — gap-filling callers should propagate THAT level, not the
previous peak.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def interval_deltas(ds, start_col: str, end_col: str):
    """Encode closed intervals [start, end] as sweep deltas: +1 at start,
    -1 at end+1, with the close-before-open tie key described above.
    Output columns: ``t`` (event time), ``key`` (order key), ``d``."""

    def to_deltas(b: pa.Table) -> pa.Table:
        s = b[start_col].to_numpy(zero_copy_only=False).astype(np.int64)
        e = b[end_col].to_numpy(zero_copy_only=False).astype(np.int64) + 1
        t = np.concatenate([s, e])
        d = np.concatenate([np.ones(len(s), dtype=np.int64),
                            -np.ones(len(e), dtype=np.int64)])
        key = t * 2 + (d > 0).astype(np.int64)
        return pa.table({"t": pa.array(t), "key": pa.array(key),
                         "d": pa.array(d)})

    return ds.map_batches(to_deltas, batch_format="pyarrow")


def peak_concurrency(ds, start_col: str, end_col: str,
                     period_us: int = 86_400_000_000,
                     num_bins: int = 1024):
    """Per-period (default: per-day) PEAK number of concurrently-open
    intervals, over periods containing at least one boundary. The peak
    accounts for the level CARRIED INTO the period (intervals opened
    earlier and still open): per period the scan yields max(cum) and
    sum(d); an O(periods) ordered pass turns the per-period delta sums
    into exclusive entering levels, and peak = max(entering, max cum).
    Periods with no boundary hold a constant level equal to the previous
    period's entering+sum — exact under any partitioning (all int64)."""
    import pyarrow.compute as pc
    import ray

    from pymhealth_ray.stages.aggregate import grouped_stats
    from pymhealth_ray.stages.rank import ordered_prefix_sum

    deltas = interval_deltas(ds, start_col, end_col)
    scanned = ordered_prefix_sum(deltas, "d", "key", "d",
                                 num_bins=num_bins, out="cum")

    def to_period(b: pa.Table) -> pa.Table:
        per = pc.divide(b["t"], period_us).cast(pa.int64())
        return pa.table({"period": per, "cum": b["cum"].cast(pa.int64()),
                         "d": b["d"].cast(pa.int64())})

    agg = grouped_stats(scanned.map_batches(to_period,
                                            batch_format="pyarrow"),
                        ["period"], max_cols=["cum"], sum_cols=["d"])
    # O(active periods) driver state — bounded by the calendar, not rows
    rows = sorted(agg.take_all(), key=lambda r: r["period"])
    periods, peaks = [], []
    entering = 0
    for r in rows:
        periods.append(int(r["period"]))
        peaks.append(max(entering, int(r["cum_max"])))
        entering += int(r["d_sum"])
    return ray.data.from_arrow(pa.table({
        "period": pa.array(periods, type=pa.int64()),
        "peak": pa.array(peaks, type=pa.int64())}))
