"""Gap-threshold sessionization.

The engine's segmentation operator (the deterministic re-expression of the
reference's location-cluster labelling, reference:location/distribution.py:42-55;
oracle: functions.windows.sessionize): within an entity's ts-sorted stream a
new session starts whenever the gap to the previous event exceeds
``gap_ns``. Session ids are 0-based per entity, so ``(entity, session_id)``
is the global key. Sessions close at end-of-partition (batch engine — no
watermarks; SURVEY.md §2.10).

The plain path keeps each entity whole in one bucket (vectorized scan);
:func:`sessionize_salted` handles entities too hot for one task by time-chunk
salting with per-chunk offset reconciliation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

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


# --------------------------------------------------------------------------
# salted sessionization: bounded-memory sessions for arbitrarily hot entities
# --------------------------------------------------------------------------


def sessionize_salted(
    ds,
    gap_ns: int,
    entity_col: str = "doc_id",
    ts_col: str = "ts_ns",
    num_buckets: int = 64,
    salt_threshold: int = 1_000_000,
    salt_span_ns: int | None = None,
):
    """Gap-threshold session ids with hot-entity TIME-CHUNK salting.

    The plain sessionizer needs each entity whole in one task (unbounded
    lookback). Here a hot entity's stream is split into time chunks spread
    across buckets; session ids are reconciled in three bounded steps:

    1. ONE (entity, chunk)-bucket shuffle; within each chunk the local break
       cumsum is computed (a chunk's first row never breaks locally — its
       gap is a chunk-boundary decision);
    2. a TINY aggregation over per-chunk summaries (first_ts, last_ts,
       local break count — one row per chunk) from which the driver derives
       each chunk's session-id offset, including cross-chunk boundary
       breaks (``first(next) - last(prev) > gap``);
    3. a stateless map adds ``offset[(entity, chunk)]`` to the local cumsum.

    No chunk ever needs more than its own rows in memory, so a single
    entity may exceed worker memory without breaking the scan. Results are
    identical to :func:`sessionize` (equivalence-tested).

    The intermediate (rows + chunk/local columns) is materialized once and
    consumed twice (summaries + final map); at cluster scale persist it to
    the bucketed layout instead.
    """
    import zlib

    from pymhealth_ray.stages.window import _hot_entity_stats

    salt_span_ns = salt_span_ns or 64 * gap_ns
    hot = _hot_entity_stats(ds, entity_col, ts_col, salt_threshold)
    hot_ref = ray.put(hot)

    CHUNK, LCUM = "__sess_chunk", "__sess_lcum"

    class Bucketize:
        def __init__(self):
            self.hot = ray.get(hot_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            ent = batch[entity_col]
            if isinstance(ent, pa.ChunkedArray):
                ent = ent.combine_chunks()
            ts = column_i64(batch, ts_col)
            from pymhealth_ray.stages.partition import BUCKET_COL, _stable_bucket_of

            chunk = np.full(n, -1, dtype=np.int64)
            bucket = _stable_bucket_of(ent, num_buckets).astype(np.int64)
            for i, e in enumerate(ent.to_pylist()):
                info = self.hot.get(e)
                if info is None:
                    continue
                c = (ts[i] - info[0]) // salt_span_ns
                chunk[i] = c
                bucket[i] = zlib.crc32(f"{e}#s{c}".encode()) % num_buckets
            batch = batch.append_column(CHUNK, pa.array(chunk))
            return batch.append_column(BUCKET_COL, pa.array(bucket.astype(np.int32)))

    from pymhealth_ray.stages.partition import BUCKET_COL

    bucketed = ds.map_batches(Bucketize, batch_format="pyarrow", concurrency=(2, 8))

    def per_bucket(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tbl = tbl.drop_columns([BUCKET_COL])
        order = pc.sort_indices(
            tbl, sort_keys=[(entity_col, "ascending"), (CHUNK, "ascending"), (ts_col, "ascending")]
        )
        tbl = tbl.take(order)
        n = tbl.num_rows
        if n == 0:
            return tbl.append_column(LCUM, pa.array([], type=pa.int64()))
        ent = tbl[entity_col]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        codes = ent.dictionary_encode().indices.to_numpy(zero_copy_only=False).astype(np.int64)
        chunks = column_i64(tbl, CHUNK)
        ts = column_i64(tbl, ts_col)
        seg_start = np.empty(n, dtype=bool)
        seg_start[0] = True
        seg_start[1:] = (codes[1:] != codes[:-1]) | (chunks[1:] != chunks[:-1])
        brk = np.zeros(n, dtype=np.int64)
        brk[1:] = (np.diff(ts) > gap_ns).astype(np.int64)
        brk[seg_start] = 0  # chunk-boundary gaps are reconciled via offsets
        csum = np.cumsum(brk)
        starts_idx = np.flatnonzero(seg_start)
        base = np.repeat(csum[starts_idx], np.diff(np.append(starts_idx, n)))
        return tbl.append_column(LCUM, pa.array(csum - base))

    rows = bucketed.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pyarrow").materialize()

    # tiny per-chunk summary aggregation → chunk offsets (hot entities only)
    from pymhealth_ray.stages.aggregate import grouped_stats

    def hot_only(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.greater_equal(b[CHUNK], 0))
        return b.select([entity_col, CHUNK, ts_col, LCUM])

    summaries = grouped_stats(
        rows.map_batches(hot_only, batch_format="pyarrow"),
        [entity_col, CHUNK],
        min_cols=[ts_col],
        max_cols=[ts_col, LCUM],
    )
    summary_rows = sorted(
        (
            (e, int(c), int(lo), int(hi), int(nb))
            for b in summaries.iter_batches(batch_format="pyarrow")
            for e, c, lo, hi, nb in zip(
                b[entity_col].to_pylist(), b[CHUNK].to_pylist(),
                b[f"{ts_col}_min"].to_pylist(), b[f"{ts_col}_max"].to_pylist(),
                b[f"{LCUM}_max"].to_pylist(),
            )
        ),
        key=lambda r: (str(r[0]), r[1]),
    )
    offsets: dict = {}
    prev_e, prev_last, running = None, None, 0
    for e, c, first, last, nbreaks in summary_rows:
        if e != prev_e:
            running = 0
        elif first - prev_last > gap_ns:
            running += 1
        offsets[(e, c)] = running
        running += nbreaks
        prev_e, prev_last = e, last
    off_ref = ray.put(offsets)

    class Finish:
        def __init__(self):
            self.off = ray.get(off_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ent = b[entity_col]
            if isinstance(ent, pa.ChunkedArray):
                ent = ent.combine_chunks()
            chunks = column_i64(b, CHUNK)
            lcum = column_i64(b, LCUM)
            sid = lcum.copy()
            hot_rows = np.flatnonzero(chunks >= 0)
            if len(hot_rows):
                ents = ent.take(pa.array(hot_rows)).to_pylist()
                add = np.fromiter(
                    (self.off[(e, int(c))] for e, c in zip(ents, chunks[hot_rows])),
                    dtype=np.int64, count=len(hot_rows),
                )
                sid[hot_rows] = lcum[hot_rows] + add
            b = b.drop_columns([CHUNK, LCUM])
            return b.append_column("session_id", pa.array(sid))

    return rows.map_batches(Finish, batch_format="pyarrow", concurrency=(2, 8))
