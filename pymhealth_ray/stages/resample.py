"""Per-entity time-grid resampling with forward-fill — align irregular
event streams onto a uniform timestamp grid.

The alignment every downstream windowed model wants: for each entity emit
one row per grid tick ``t`` in ``[ceil(min_ts/step)·step,
floor(max_ts/step)·step]`` carrying the LAST observation at-or-before
``t``. Ticks snap to the global grid (``ts % step == 0``), so streams
resampled independently line up across entities — the property that makes
the output joinable.

Plan: the single entity-bucket exchange (stages/partition.py), then one
vectorized pass per bucket — per-entity grids are materialized with
repeat/arange arithmetic (no per-entity Python) and filled via
``segmented_searchsorted`` against the entity's own sorted timestamps.
Per-entity state is O(1) beyond its rows; output size is
span/step per entity, independent of input row count.

Reference lineage: uniform-grid assumptions of the window kernels
(`/root/reference/src/mhealth/generic/window.py` rolling family) made
explicit as an alignment operator; SURVEY §2.1 temporal surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pymhealth_ray.stages.partition import (
    column_i64,
    entity_segments,
    grouped_by_bucket,
)


def resample_ffill(ds, entity_col: str, ts_col: str, value_cols,
                   step: int, tiebreak_col: str | None = None,
                   num_buckets: int = 32, grid_name: str = "grid_ts"):
    """Uniform-grid forward-fill of ``value_cols`` (int/float columns) per
    entity. Returns (entity, grid_ts, *value_cols) rows; entities whose
    span contains no grid tick produce no rows."""
    if step <= 0:
        raise ValueError("step must be positive")
    value_cols = list(value_cols)

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl, starts, n_ent = entity_segments(tbl, entity_col, ts_col,
                                             tiebreak_col)
        ts = column_i64(tbl, ts_col)
        if n_ent == 0:
            return pa.table(
                {entity_col: tbl[entity_col], grid_name: pa.array([], pa.int64()),
                 **{c: tbl[c] for c in value_cols}}).slice(0, 0)
        mn = ts[starts[:-1]]
        mx = ts[starts[1:] - 1]
        # global-grid tick indices covered by each entity's span
        g0 = -(-mn // step)          # ceil for any sign
        g1 = mx // step              # floor
        cnt = np.maximum(g1 - g0 + 1, 0)
        total = int(cnt.sum())
        gstarts = np.concatenate(([0], np.cumsum(cnt))).astype(np.int64)
        within = np.arange(total, dtype=np.int64) - np.repeat(gstarts[:-1], cnt)
        grid = (np.repeat(g0, cnt) + within) * step
        # last observation at-or-before each tick, inside the entity segment
        from pymhealth_ray.stages.partition import segmented_searchsorted
        idx = segmented_searchsorted(ts, starts, grid, gstarts,
                                     side="right") - 1

        ent = tbl[entity_col]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        take = pa.array(idx, type=pa.int64())
        cols = {entity_col: ent.take(take),
                grid_name: pa.array(grid, type=pa.int64())}
        for c in value_cols:
            col = tbl[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[c] = col.take(take)
        return pa.table(cols)

    return grouped_by_bucket(ds, per_bucket, entity_col=entity_col,
                             num_buckets=num_buckets)


def resample_interp(ds, entity_col: str, ts_col: str, value_col: str,
                    step: int, tiebreak_col: str | None = None,
                    num_buckets: int = 32, grid_name: str = "grid_ts",
                    out_name: str | None = None):
    """Uniform-grid LINEAR INTERPOLATION of ``value_col`` per entity —
    the alignment for continuous signals where forward-fill's staircase
    biases downstream derivatives (reference rolling kernels assume a
    uniform grid, reference:generic/window.py).

    Same one-exchange plan as :func:`resample_ffill`; per tick the value is
    ``vp + (vn - vp) * ((tick - tp) / (tn - tp))`` between the neighboring
    observations (exactly the ffill value when the tick lands on one).
    Timestamp ties within an entity are collapsed to the row with the
    greatest ``tiebreak_col`` first, making the result deterministic and
    SQL-reproducible (row_number() ... ORDER BY tiebreak DESC = 1).
    """
    if step <= 0:
        raise ValueError("step must be positive")
    out_name = out_name or f"{value_col}_interp"

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl, starts, n_ent = entity_segments(tbl, entity_col, ts_col,
                                             tiebreak_col)
        ent_all = tbl[entity_col]
        if isinstance(ent_all, pa.ChunkedArray):
            ent_all = ent_all.combine_chunks()
        if n_ent == 0:
            return pa.table({entity_col: ent_all.slice(0, 0),
                             grid_name: pa.array([], pa.int64()),
                             out_name: pa.array([], pa.float64())})
        ts = column_i64(tbl, ts_col)
        # collapse timestamp ties: keep the LAST row per (entity, ts) in
        # (ts, tiebreak) order = greatest tiebreak
        codes = ent_all.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        n = len(ts)
        keep = np.ones(n, dtype=bool)
        keep[:-1] = (codes[1:] != codes[:-1]) | (ts[1:] != ts[:-1])
        kidx = np.flatnonzero(keep)
        ts = ts[kidx]
        vcol = tbl[value_col]
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        vals = vcol.to_numpy(zero_copy_only=False).astype(np.float64)[kidx]
        ent = ent_all.take(pa.array(kidx))
        seg_of_kept = np.repeat(np.arange(n_ent), np.diff(starts))[kidx]
        starts = np.concatenate(
            ([0], np.cumsum(np.bincount(seg_of_kept, minlength=n_ent)))
        ).astype(np.int64)

        mn = ts[starts[:-1]]
        mx = ts[starts[1:] - 1]
        g0 = -(-mn // step)
        g1 = mx // step
        cnt = np.maximum(g1 - g0 + 1, 0)
        total = int(cnt.sum())
        gstarts = np.concatenate(([0], np.cumsum(cnt))).astype(np.int64)
        within = np.arange(total, dtype=np.int64) - np.repeat(gstarts[:-1], cnt)
        grid = (np.repeat(g0, cnt) + within) * step
        from pymhealth_ray.stages.partition import segmented_searchsorted
        prev = segmented_searchsorted(ts, starts, grid, gstarts,
                                      side="right") - 1
        nxt = segmented_searchsorted(ts, starts, grid, gstarts, side="left")
        tp, tn = ts[prev], ts[nxt]
        vp, vn = vals[prev], vals[nxt]
        on_obs = tn == tp  # tick coincides with an observation
        with np.errstate(invalid="ignore", divide="ignore"):
            frac = (grid - tp).astype(np.float64) / (tn - tp).astype(np.float64)
        out = np.where(on_obs, vp, vp + (vn - vp) * frac)
        take = pa.array(prev, type=pa.int64())
        return pa.table({entity_col: ent.take(take),
                         grid_name: pa.array(grid, type=pa.int64()),
                         out_name: pa.array(out, type=pa.float64())})

    return grouped_by_bucket(ds, per_bucket, entity_col=entity_col,
                             num_buckets=num_buckets)
