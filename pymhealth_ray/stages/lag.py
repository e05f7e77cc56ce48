"""Per-entity lag/lead/backfill features.

The distributed form of the reference's successive-difference kernels
(successive_distance head fill = 0, reference:location/features.py:98-113;
pnn/rmssd/sdsd diff features, reference:heart/hrv.py:111-169): per entity in
ts order, ``shift(k)`` with explicit head/tail fill — vectorized across all
entities of a bucket with one boundary mask, no per-entity loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pymhealth_ray.stages.partition import (
    column_f64,
    column_i64,
    entity_segments,
    grouped_by_bucket,
)


def _row_pos(starts: np.ndarray) -> np.ndarray:
    """Position of each row within its entity segment."""
    n = starts[-1]
    return np.arange(n, dtype=np.int64) - np.repeat(starts[:-1], np.diff(starts))


def lag_features(
    ds,
    cols,
    lags=(1,),
    leads=(),
    diffs=(),
    entity_col: str = "doc_id",
    ts_col: str = "ts_ns",
    fill: float = np.nan,
    diff_head_fill: float = 0.0,
    num_buckets: int = 64,
    tiebreak_col: str | None = None,
):
    """Append lag/lead/successive-diff columns.

    - ``{col}_lag{k}``: value k rows earlier within the entity (head → fill)
    - ``{col}_lead{k}``: value k rows later (tail → fill) — the forward
      counterpart (leakage-bearing by definition; excluded from as-of
      feature sets)
    - ``{col}_diff1``: value - previous value, head → ``diff_head_fill``
      (0, the successive_distance convention)
    """
    cols = list(cols)
    diffs = list(diffs)

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl, starts, _ = entity_segments(tbl, entity_col, ts_col, tiebreak_col)
        pos = _row_pos(starts)
        tbl = tbl.append_column("row_idx", pa.array(pos, type=pa.int64()))
        seg_len = np.repeat(np.diff(starts), np.diff(starts))
        for col in cols:
            v = column_f64(tbl, col)
            for k in lags:
                lagged = np.empty_like(v)
                lagged[k:] = v[:-k] if k else v
                head = pos < k
                lagged[head] = fill
                tbl = tbl.append_column(f"{col}_lag{k}", pa.array(lagged, type=pa.float64()))
            for k in leads:
                led = np.empty_like(v)
                led[:-k] = v[k:]
                tail = pos >= seg_len - k
                led[tail] = fill
                tbl = tbl.append_column(f"{col}_lead{k}", pa.array(led, type=pa.float64()))
            if col in diffs:
                d = np.empty_like(v)
                d[1:] = v[1:] - v[:-1]
                d[pos < 1] = diff_head_fill
                tbl = tbl.append_column(f"{col}_diff1", pa.array(d, type=pa.float64()))
        return tbl

    return grouped_by_bucket(ds, per_bucket, entity_col, num_buckets)


def compact_unchanged(ds, entity_col: str, ts_col: str, value_col: str,
                      tiebreak_col: str | None = None,
                      num_buckets: int = 32):
    """Stream COMPACTION: keep each entity's first row and every row whose
    value differs from the previous one (ts order) — the change-event
    encoding that shrinks slowly-varying streams before storage. One
    entity-bucket exchange, vectorized shift-compare per bucket."""
    from pymhealth_ray.stages.partition import entity_segments

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl, starts, n_ent = entity_segments(tbl, entity_col, ts_col,
                                             tiebreak_col)
        v = tbl[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        x = v.to_numpy(zero_copy_only=False)
        keep = np.ones(len(x), dtype=bool)
        keep[1:] = x[1:] != x[:-1]
        keep[starts[:-1]] = True
        return tbl.filter(pa.array(keep))

    from pymhealth_ray.stages.partition import grouped_by_bucket

    return grouped_by_bucket(ds, per_bucket, entity_col=entity_col,
                             num_buckets=num_buckets)


def dedup_within_window(ds, entity_cols, ts_col: str, window: int,
                        tiebreak_col: str | None = None,
                        num_buckets: int = 32):
    """WINDOW DEDUP — drop a row when the previous row of the same
    COMPOSITE entity (ts order, optional tiebreak) lies within
    ``window`` time units: the throttling/debounce primitive that
    collapses retry storms and double-fires before they inflate
    downstream counts. Lag-based semantics (each row compares to the
    immediately preceding row whether or not that one was kept), so it
    is exactly ``lag(ts) OVER (PARTITION BY entity_cols ORDER BY ts,
    tiebreak)`` — SQL-verifiable and partition-invariant.

    One exchange bucketed on ``entity_cols[0]`` co-locates every
    composite group (the remaining entity columns only subdivide rows
    already in the bucket); the per-bucket kernel is one sort + one
    shifted compare. Generalizes stages/lag.compact_unchanged from
    value-change suppression to time-window suppression."""
    entity_cols = list(entity_cols)

    def per_bucket(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl
        keys = [(c, "ascending") for c in entity_cols]
        keys.append((ts_col, "ascending"))
        if tiebreak_col is not None:
            keys.append((tiebreak_col, "ascending"))
        order = pc.sort_indices(tbl, sort_keys=keys)
        tbl = tbl.take(order)
        n = tbl.num_rows
        head = np.zeros(n, dtype=bool)
        head[0] = True
        for c in entity_cols:
            col = tbl[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            codes = col.dictionary_encode().indices.to_numpy(
                zero_copy_only=False)
            head[1:] |= codes[1:] != codes[:-1]
        ts = tbl[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        t = ts.to_numpy(zero_copy_only=False).astype(np.int64)
        keep = head.copy()
        keep[1:] |= (t[1:] - t[:-1]) > window
        return tbl.filter(pa.array(keep))

    from pymhealth_ray.stages.partition import grouped_by_bucket

    return grouped_by_bucket(ds, per_bucket, entity_col=entity_cols[0],
                             num_buckets=num_buckets)
