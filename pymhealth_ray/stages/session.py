"""Gap-threshold sessionization.

The engine's segmentation operator (the deterministic re-expression of the
reference's location-cluster labelling, reference:location/distribution.py:42-55;
oracle: functions.windows.sessionize): within an entity's ts-sorted stream a
new session starts whenever the gap to the previous event exceeds
``gap_ns``. Session ids are 0-based per entity, so ``(entity, session_id)``
is the global key. Sessions close at end-of-partition (batch engine — no
watermarks; SURVEY.md §2.10).

Hot entities are NOT salted here (unbounded lookback); the bucket shuffle
keeps each entity whole.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pymhealth_ray.stages.partition import (
    column_f64,
    column_i64,
    entity_segments,
    grouped_by_bucket,
)


def _session_ids(ts: np.ndarray, seg_starts: np.ndarray, gap_ns: int) -> np.ndarray:
    """Vectorized session ids across ALL entities of a sorted group: a break
    at every entity boundary resets the per-entity cumsum."""
    n = len(ts)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    brk = np.zeros(n, dtype=np.int64)
    brk[1:] = (np.diff(ts) > gap_ns).astype(np.int64)
    is_start = np.zeros(n, dtype=bool)
    is_start[seg_starts[:-1]] = True
    brk[is_start] = 0
    csum = np.cumsum(brk)
    # subtract each entity's leading cumsum so ids restart at 0
    ent_base = np.repeat(csum[seg_starts[:-1]], np.diff(seg_starts))
    return csum - ent_base


def sessionize(ds, gap_ns: int, entity_col: str = "doc_id", ts_col: str = "ts_ns", num_buckets: int = 64):
    """Append ``session_id`` (int64, 0-based per entity) to every row."""

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl, starts, _ = entity_segments(tbl, entity_col, ts_col)
        sid = _session_ids(column_i64(tbl, ts_col), starts, gap_ns)
        return tbl.append_column("session_id", pa.array(sid, type=pa.int64()))

    return grouped_by_bucket(ds, per_bucket, entity_col, num_buckets)


def session_stats(
    ds,
    gap_ns: int,
    value_col: str | None = None,
    entity_col: str = "doc_id",
    ts_col: str = "ts_ns",
    num_buckets: int = 64,
):
    """One row per (entity, session): count, start/end ts, duration and
    optional value sum/mean/std (population) — sessions and their aggregates
    in a single shuffle+pass (sessionize and aggregate share the sort).

    Session duration and per-session stats mirror the reference's
    cluster_totals / per-cluster aggregates (location/distribution.py:68-76).
    """

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl, starts, _ = entity_segments(tbl, entity_col, ts_col)
        ts = column_i64(tbl, ts_col)
        sid = _session_ids(ts, starts, gap_ns)
        n = len(ts)
        if n == 0:
            fields = {
                entity_col: pa.array([], type=pa.string()),
                "session_id": pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64()),
                "start_ns": pa.array([], type=pa.int64()),
                "end_ns": pa.array([], type=pa.int64()),
                "duration_ns": pa.array([], type=pa.int64()),
            }
            if value_col:
                for s in ("sum", "mean", "std"):
                    fields[f"{value_col}_{s}"] = pa.array([], type=pa.float64())
            return pa.table(fields)

        is_ent_start = np.zeros(n, dtype=bool)
        is_ent_start[starts[:-1]] = True
        new_sess = np.empty(n, dtype=bool)
        new_sess[0] = True
        new_sess[1:] = sid[1:] != sid[:-1]
        new_sess |= is_ent_start
        s_start = np.flatnonzero(new_sess)
        s_end = np.append(s_start[1:], n)
        cnt = (s_end - s_start).astype(np.int64)

        ent_arr = tbl[entity_col]
        if isinstance(ent_arr, pa.ChunkedArray):
            ent_arr = ent_arr.combine_chunks()
        fields = {
            entity_col: ent_arr.take(pa.array(s_start)),
            "session_id": pa.array(sid[s_start], type=pa.int64()),
            "n_events": pa.array(cnt),
            "start_ns": pa.array(ts[s_start], type=pa.int64()),
            "end_ns": pa.array(ts[s_end - 1], type=pa.int64()),
            "duration_ns": pa.array(ts[s_end - 1] - ts[s_start], type=pa.int64()),
        }
        if value_col:
            v = column_f64(tbl, value_col)
            # sessions tile the sorted array → reduceat gives FRESH per-segment
            # sums (no cumsum-difference error floor; a 1-element or
            # constant session yields an exactly-zero variance)
            s1 = np.add.reduceat(v, s_start)
            fc = cnt.astype(np.float64)
            mean = s1 / fc
            center = float(v.mean()) if len(v) else 0.0
            vc = v - center
            s1c = np.add.reduceat(vc, s_start)
            s2c = np.add.reduceat(vc * vc, s_start)
            m2 = np.maximum(s2c / fc - (s1c / fc) ** 2, 0.0)
            fields[f"{value_col}_sum"] = pa.array(s1, type=pa.float64())
            fields[f"{value_col}_mean"] = pa.array(mean, type=pa.float64())
            fields[f"{value_col}_std"] = pa.array(np.sqrt(m2), type=pa.float64())
        return pa.table(fields)

    return grouped_by_bucket(ds, per_bucket, entity_col, num_buckets)
