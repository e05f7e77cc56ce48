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
