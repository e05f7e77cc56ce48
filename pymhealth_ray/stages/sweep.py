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


def grouped_interval_union(ds, key_col: str, start_col: str, end_col: str,
                           num_buckets: int = 64):
    """Per-key UNION of half-open intervals [start, end): one output row
    per key with ``n_islands`` (maximal merged runs) and ``covered``
    (total union length) — the gaps-and-islands computation behind
    "how much wall-clock was this user actually active", with
    VARIABLE-length intervals (so a running max of ends is required;
    fixed-length intervals degenerate to sessionization).

    Plan: one hash-bucket exchange on ``key`` co-locates each key, then a
    fully vectorized per-bucket sweep — sort (key, start, end), per-key
    running max of ends via the segment-offset trick
    (``maximum.accumulate(end + seg*K) - seg*K`` with K spanning the
    global value range, so segment s+1 always dominates segment s), break
    where ``start > prev_running_max``, island aggregates via reduceat.
    All int64; the guarded offset product falls back to a per-segment
    accumulate loop if ``segments * K`` would overflow (wide clusters
    with huge time ranges). Intervals must satisfy end > start.

    At 100 TB the only exchange is the slim (key, start, end) bucket
    shuffle; output is |keys| rows. Coverage is order-independent, so the
    result is partition-invariant by construction.
    """
    import pyarrow.compute as pc

    from pymhealth_ray.stages.partition import _stable_bucket_of

    def tag(b: pa.Table) -> pa.Table:
        bk = _stable_bucket_of(b[key_col], num_buckets)
        return b.append_column("__iubucket", pa.array(bk, type=pa.int32()))

    def sweep(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            # map_groups can hand over schema-less empty blocks; emit the
            # output schema (key type falls back to int64 when unknowable)
            kt = (tbl.schema.field(key_col).type
                  if key_col in tbl.column_names else pa.int64())
            return pa.table({key_col: pa.array([], type=kt),
                             "n_islands": pa.array([], type=pa.int64()),
                             "covered": pa.array([], type=pa.int64())})
        tbl = tbl.drop_columns(["__iubucket"])
        order = pc.sort_indices(tbl, sort_keys=[(key_col, "ascending"),
                                                (start_col, "ascending"),
                                                (end_col, "ascending")])
        tbl = tbl.take(order)
        s = tbl[start_col].to_numpy(zero_copy_only=False).astype(np.int64)
        e = tbl[end_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = tbl[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        kn = keys.to_numpy(zero_copy_only=False)
        new_seg = np.empty(len(kn), dtype=bool)
        new_seg[0] = True
        new_seg[1:] = kn[1:] != kn[:-1]
        seg = np.cumsum(new_seg) - 1
        n_seg = int(seg[-1]) + 1
        K = int(e.max()) - int(s.min()) + 1
        if n_seg * K < 2**62:
            rm = np.maximum.accumulate(e + seg * K) - seg * K
        else:  # rare: per-segment accumulate (huge range x many keys)
            rm = np.empty_like(e)
            bounds = np.flatnonzero(new_seg)
            for i, b0 in enumerate(bounds):
                b1 = bounds[i + 1] if i + 1 < len(bounds) else len(e)
                np.maximum.accumulate(e[b0:b1], out=rm[b0:b1])
        brk = new_seg.copy()
        brk[1:] |= s[1:] > rm[:-1]
        isl = np.flatnonzero(brk)
        isl_end = np.empty_like(isl)
        isl_end[:-1] = isl[1:] - 1
        isl_end[-1] = len(e) - 1
        covered_i = rm[isl_end] - s[isl]
        isl_seg = seg[isl]
        seg_first = np.flatnonzero(np.diff(isl_seg, prepend=-1))
        covered = np.add.reduceat(covered_i, seg_first)
        n_isl = np.diff(np.append(seg_first, len(isl)))
        key_rows = keys.take(pa.array(isl[seg_first].astype(np.int64)))
        return pa.table({key_col: key_rows,
                         "n_islands": pa.array(n_isl.astype(np.int64)),
                         "covered": pa.array(covered.astype(np.int64))})

    return ds.map_batches(tag, batch_format="pyarrow").groupby(
        "__iubucket").map_groups(sweep, batch_format="pyarrow")
