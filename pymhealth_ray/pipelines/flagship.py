"""The flagship pipeline: as-of join + window features over tokenized
sequences (BASELINE.json north_star), composed for ONE shuffle.

Per row of the input table the pipeline emits, with zero temporal leakage
(every feature is a function of data at ts' <= ts of the same entity):

- per-row token-signal kernels (stateless pass, tokens dropped afterwards so
  the shuffle moves only narrow columns);
- lag features: previous tok_mean, successive diff, inter-arrival delta
  (reference:heart/hrv.py:111-169, location/features.py:98-113 semantics);
- trailing event-time window [ts - wsize, ts): count/mean/std of tok_mean —
  the per-row backfill form of the window engine (same searchsorted idiom as
  reference:util/windows.py:175-178);
- gap-threshold session id;
- backward as-of join of the last COMPLETED session's summary (published at
  that session's final event) onto every later row.

Everything after the stateless pass happens inside ONE
bucket-groupby/map_groups, sharing a single (entity, ts) sort.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pymhealth_ray.stages.partition import (
    column_f64,
    column_i64,
    entity_segments,
    grouped_by_bucket,
    segmented_searchsorted,
)
from pymhealth_ray.stages.rowfeatures import token_features
from pymhealth_ray.stages.session import _session_ids

TOKEN_FEATURES = (
    "mean",
    "std",
    "min",
    "max",
    "zero_crossing_count",
    "line_length",
    "entropy",
)


def make_temporal_bucket_fn(
    gap_ns: int = 1800 * 10**9,
    wsize_ns: int = 3600 * 10**9,
    entity_col: str = "doc_id",
    ts_col: str = "ts_ns",
):
    """The flagship's per-bucket temporal pass (lag + trailing window +
    session + as-of), as a reusable function over one bucket's rows.

    Used by both physical plans: the shuffle path (grouped_by_bucket) and
    the partition-aligned path (bucketed parquet layout from
    state.lineage.resumable_write — partition once at ingest, every
    downstream job reads co-partitioned buckets with NO further shuffle).
    """

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl, starts, n_ent = entity_segments(tbl, entity_col, ts_col)
        n = tbl.num_rows
        if n == 0:
            return _empty_like(tbl)
        ts = column_i64(tbl, ts_col)
        v = column_f64(tbl, "tok_mean")
        seg_len = np.diff(starts)
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts[:-1], seg_len)

        # --- lag features (head-filled per entity) ---
        lag1 = np.empty(n)
        lag1[1:] = v[:-1]
        lag1[pos < 1] = np.nan
        diff1 = np.empty(n)
        diff1[1:] = v[1:] - v[:-1]
        diff1[pos < 1] = 0.0  # successive_distance head convention
        delta = np.empty(n, dtype=np.float64)
        delta[1:] = (ts[1:] - ts[:-1]).astype(np.float64)
        delta[pos < 1] = np.nan

        # --- session ids (vectorized across entities) ---
        sid = _session_ids(ts, starts, gap_ns)

        # --- trailing window [ts - wsize, ts): strict past ---
        cs = np.concatenate([[0.0], np.cumsum(v)])
        # center by the bucket mean AND accumulate in extended precision:
        # trailing windows overlap, so fresh reduceat sums are O(n·w) — the
        # cumsum-difference error floor over a 500k-row hot bucket (~1e-5
        # absolute) is instead pushed below 1e-9 by 80-bit accumulation
        vc = v - (float(v.mean()) if n else 0.0)
        csc = np.concatenate([[0.0], np.cumsum(vc, dtype=np.longdouble)])
        csc2 = np.concatenate([[0.0], np.cumsum(vc * vc, dtype=np.longdouble)])
        tr_cnt = np.empty(n, dtype=np.float64)
        tr_mean = np.full(n, np.nan)
        tr_std = np.full(n, np.nan)
        # per-session aggregates for the as-of dim
        prev_sess_mean = np.full(n, np.nan)
        prev_sess_n = np.full(n, np.nan)
        prev_sess_end = np.full(n, np.nan)

        # segment-vectorized across ALL entities (no per-entity Python
        # iteration — segmented_searchsorted answers every entity's window
        # bound / as-of probe in O(n_ent / chunk) searchsorted calls)
        row_ent = np.repeat(np.arange(n_ent, dtype=np.int64), seg_len)
        w_lo = segmented_searchsorted(ts, starts, ts - wsize_ns, starts, "left")
        w_hi = np.arange(n, dtype=np.int64)  # exclusive of the current row
        c = (w_hi - w_lo).astype(np.float64)
        s1 = cs[w_hi] - cs[w_lo]
        s1c = (csc[w_hi] - csc[w_lo]).astype(np.float64)
        s2c = (csc2[w_hi] - csc2[w_lo]).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            m = s1 / c
            var = np.maximum(s2c / c - (s1c / c) ** 2, 0.0)
            var[c <= 1] = 0.0  # exact: a 1-row window has zero variance
        tr_cnt[:] = c
        nz = c > 0
        tr_mean[nz] = m[nz]
        tr_std[nz] = np.sqrt(var[nz])

        # session summary dim: one row per session, published at its end.
        # A session starts at each entity's first row OR a sid change (the
        # explicit entity-first term matters: consecutive entities both
        # starting at sid 0 would otherwise merge).
        ent_first = np.zeros(n, dtype=bool)
        ent_first[starts[:-1]] = True
        s_start = np.flatnonzero(np.concatenate([[True], sid[1:] != sid[:-1]]) | ent_first)
        s_end = np.append(s_start[1:], n)
        sess_n = (s_end - s_start).astype(np.float64)
        sess_mean = (cs[s_end] - cs[s_start]) / sess_n
        sess_end_ts = ts[s_end - 1]
        sess_ent = row_ent[s_start]
        sess_starts = np.searchsorted(sess_ent, np.arange(n_ent + 1))
        # backward as-of against CLOSED sessions only: a session is
        # knowable-closed once gap_ns has elapsed after its last event,
        # so the summary publishes at end+gap (publishing at the end
        # itself would leak the session-boundary decision — the feature
        # would change under truncation of future rows)
        gm = segmented_searchsorted(sess_end_ts, sess_starts, ts - gap_ns, starts, "right") - 1
        ok = gm >= sess_starts[row_ent]  # ≥1 closed session of the SAME entity
        idxs = np.maximum(gm, 0)
        prev_sess_mean[ok] = sess_mean[idxs[ok]]
        prev_sess_n[ok] = sess_n[idxs[ok]]
        prev_sess_end[ok] = sess_end_ts[idxs[ok]].astype(np.float64)

        tbl = tbl.append_column("tok_mean_lag1", pa.array(lag1))
        tbl = tbl.append_column("tok_mean_diff1", pa.array(diff1))
        tbl = tbl.append_column("delta_ts_ns", pa.array(delta))
        tbl = tbl.append_column("session_id", pa.array(sid, type=pa.int64()))
        tbl = tbl.append_column("trail_count", pa.array(tr_cnt))
        tbl = tbl.append_column("trail_mean", pa.array(tr_mean))
        tbl = tbl.append_column("trail_std", pa.array(tr_std))
        tbl = tbl.append_column("sess_ref_mean", pa.array(prev_sess_mean))
        tbl = tbl.append_column("sess_ref_n", pa.array(prev_sess_n))
        tbl = tbl.append_column("sess_ref_end_ns", pa.array(prev_sess_end))
        return tbl

    return per_bucket


def _empty_like(tbl: pa.Table) -> pa.Table:
    for name in (
        "tok_mean_lag1",
        "tok_mean_diff1",
        "delta_ts_ns",
        "trail_count",
        "trail_mean",
        "trail_std",
        "sess_ref_mean",
        "sess_ref_n",
        "sess_ref_end_ns",
    ):
        tbl = tbl.append_column(name, pa.array([], type=pa.float64()))
    return tbl.append_column("session_id", pa.array([], type=pa.int64()))


def flagship_features(
    ds,
    gap_ns: int = 1800 * 10**9,
    wsize_ns: int = 3600 * 10**9,
    entity_col: str = "doc_id",
    ts_col: str = "ts_ns",
    num_buckets: int = 64,
    token_feature_set=TOKEN_FEATURES,
    drop_tokens: bool = True,
):
    """Shuffle path: stateless token features → ONE bucket groupby →
    per-bucket temporal pass.

    batch_size=None: blocks are already sized upstream (override_num_blocks /
    target block size), and whole-block batches cut per-batch overhead —
    re-chunking to small batches measurably reduces per-core throughput.
    """
    feat = token_features(ds, features=token_feature_set, drop_tokens=drop_tokens, batch_size=None)
    per_bucket = make_temporal_bucket_fn(gap_ns, wsize_ns, entity_col, ts_col)
    return grouped_by_bucket(feat, per_bucket, entity_col, num_buckets)


def flagship_features_bucketed(
    bucketed_dir: str,
    gap_ns: int = 1800 * 10**9,
    wsize_ns: int = 3600 * 10**9,
    entity_col: str = "doc_id",
    ts_col: str = "ts_ns",
    token_feature_set=TOKEN_FEATURES,
):
    """Partition-aligned path: input is the resumable bucketed layout
    (``part=<bucket>/data.parquet`` from state.lineage.resumable_write).
    Entities are already co-located per bucket, so the whole pipeline is a
    pure map — one task per bucket partition, NO shuffle. This is the 100 TB
    plan: pay the entity exchange once at ingest, then every windowed /
    sessionized / as-of job streams the co-partitioned layout.

    If the layout was written PRE-FEATURIZED (``featurize_then_bucket`` —
    token kernels computed in the parallel stateless pass BEFORE the
    exchange), the heavy per-row work never runs inside a per-part task and
    the hottest bucket (25% of rows in the bench fixture) costs only its
    cheap vectorized temporal pass instead of straggling the job.
    """
    import glob

    import ray

    from pymhealth_ray.stages.rowfeatures import compute_token_features

    parts = sorted(glob.glob(f"{bucketed_dir}/part=*/data.parquet"))
    per_bucket = make_temporal_bucket_fn(gap_ns, wsize_ns, entity_col, ts_col)

    def process_part(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        for path in batch["path"].to_pylist():
            tbl = pq.read_table(path)
            if "tok_mean" not in tbl.column_names:  # raw layout: featurize here
                cols = compute_token_features(tbl, token_feature_set)
                for name, arr in cols.items():
                    tbl = tbl.append_column(name, pa.array(arr, type=pa.float64()))
            if "tokens" in tbl.column_names:
                tbl = tbl.drop_columns(["tokens"])
            yield per_bucket(tbl)

    paths = ray.data.from_items([{"path": p} for p in parts]).repartition(len(parts))
    return paths.map_batches(process_part, batch_format="pyarrow", batch_size=None)


def featurize_then_bucket(
    ds,
    out_dir: str,
    num_buckets: int = 128,
    token_feature_set=TOKEN_FEATURES,
    entity_col: str = "doc_id",
    params: dict | None = None,
):
    """Ingest plan that avoids hot-bucket stragglers: run the heavy per-row
    token kernels in the PARALLEL stateless pass (fine-grained blocks), drop
    the wide token payload, then write the narrow feature table as the
    resumable bucket-partitioned layout. Downstream partition-aligned jobs
    (flagship_features_bucketed and friends) then do only cheap vectorized
    temporal work per part, so bucket-size skew costs seconds, not the
    feature bill."""
    from pymhealth_ray.state.lineage import resumable_write

    feat = token_features(ds, features=token_feature_set, drop_tokens=True, batch_size=None)
    return resumable_write(
        feat, out_dir, entity_col=entity_col, num_buckets=num_buckets,
        params={**(params or {}), "featurized": sorted(token_feature_set)},
    )
